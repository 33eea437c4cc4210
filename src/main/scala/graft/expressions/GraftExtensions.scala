package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions, registered via
  * `spark.sql.extensions=graft.expressions.GraftExtensions` (or
  * `.withExtensions`): native functions that beat their built-in
  * compositions on the hot path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("token_count"),
      new ExpressionInfo(
        classOf[TokenCount].getName,
        null,
        "token_count",
        "token_count(str) - deterministic word-or-symbol token count (engine C1 semantics)",
        ""
      ),
      (children: Seq[Expression]) => TokenCount(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[NfcNormalize].getName,
        null,
        "nfc_normalize",
        "nfc_normalize(str) - Unicode NFC canonical composition (no-alloc fast path when already normalized)",
        ""
      ),
      (children: Seq[Expression]) => NfcNormalize(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo(
        classOf[TopK].getName,
        null,
        "top_k",
        "top_k(expr, k) - the k largest values of an orderable expression; " +
          "bounded per-group buffer with map-side partial aggregation",
        ""
      ),
      (children: Seq[Expression]) => TopK(children(0), children(1))
    ))
  }
}
