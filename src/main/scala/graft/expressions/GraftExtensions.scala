package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}

/** Engine extensions, registered via
  * `spark.sql.extensions=graft.expressions.GraftExtensions` (or
  * `.withExtensions`): native functions that beat their built-in
  * compositions on the hot path, plus SQL bindings for the engine's
  * Column-level operators so `spark.sql` users get the same surface as the
  * DataFrame API (one definition serves both — the builders adapt the
  * Column algebra through the Expression bridge).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_], usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // --- native codegen expressions ---
    ext.injectFunction((
      FunctionIdentifier("token_count"),
      info("token_count", classOf[TokenCount],
        "token_count(str) - deterministic word-or-symbol token count (engine C1 semantics)"),
      (children: Seq[Expression]) => TokenCount(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", classOf[NfcNormalize],
        "nfc_normalize(str) - Unicode NFC canonical composition (no-alloc fast path when already normalized)"),
      (children: Seq[Expression]) => NfcNormalize(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("canonicalize_url"),
      info("canonicalize_url", classOf[CanonicalizeUrl],
        "canonicalize_url(str) - crawl-dedup URL spelling: fragment/tracking-param/" +
          "default-port strip, scheme+host lowercase (one codegen'd method)"),
      (children: Seq[Expression]) => CanonicalizeUrl(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("occurrence_count"),
      info("occurrence_count", classOf[OccurrenceCount],
        "occurrence_count(str, substr) - non-overlapping occurrences, single scan, no allocation"),
      (children: Seq[Expression]) => OccurrenceCount(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("top_k"),
      info("top_k", classOf[TopK],
        "top_k(expr, k) - the k largest values of an orderable expression; " +
          "bounded per-group buffer with map-side partial aggregation"),
      (children: Seq[Expression]) => TopK(children(0), children(1))
    ))

    // --- SQL bindings of the Column-level operators (same definitions the
    // DataFrame API uses; the bridge only adapts the types) ---
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      info("normalize_text", graft.functions.TextFunctions.getClass,
        "normalize_text(str) - NFC composition, control-char strip, whitespace collapse"),
      (children: Seq[Expression]) =>
        toExpression(graft.functions.TextFunctions.normalizeText(toColumn(children.head)))
    ))
    ext.injectFunction((
      FunctionIdentifier("quality_score"),
      info("quality_score", graft.functions.TextFunctions.getClass,
        "quality_score(str) - composite [0,1] text quality (length, diversity, stopword glue)"),
      (children: Seq[Expression]) =>
        toExpression(graft.functions.TextFunctions.qualityScore(toColumn(children.head)))
    ))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      info("lang_id", graft.functions.TextFunctions.getClass,
        "lang_id(str) - stopword-profile language guess"),
      (children: Seq[Expression]) =>
        toExpression(graft.functions.TextFunctions.langId(toColumn(children.head)))
    ))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", graft.functions.VectorFunctions.getClass,
        "cosine_sim(a, b) - cosine similarity of two float-array embeddings (0 on zero norm)"),
      (children: Seq[Expression]) =>
        toExpression(graft.functions.VectorFunctions.cosine(
          toColumn(children(0)), toColumn(children(1))))
    ))
    ext.injectFunction((
      FunctionIdentifier("quantize_int8"),
      info("quantize_int8", graft.functions.VectorFunctions.getClass,
        "quantize_int8(vec) - struct(scale, q): per-vector symmetric int8 codes (round(x*127/max|x|))"),
      (children: Seq[Expression]) =>
        toExpression(graft.functions.VectorFunctions.quantizeInt8(toColumn(children.head)))
    ))
    ext.injectFunction((
      FunctionIdentifier("random_project"),
      info("random_project", classOf[RandomProject],
        "random_project(vec, dim, outDim[, seed]) - Johnson-Lindenstrauss signed " +
          "random projection with deterministic seeded planes (native loop)"),
      (children: Seq[Expression]) => {
        if (children.length < 3 || children.length > 4)
          throw new IllegalArgumentException(
            s"random_project expects (vec, dim, outDim[, seed]) — got ${children.length} arguments")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"random_project: $what must be an integer literal, got $other")
        }
        RandomProject(children(0),
          intLit(children(1), "dim"),
          intLit(children(2), "outDim"),
          if (children.length > 3) intLit(children(3), "seed") else 42)
      }
    ))
  }
}
