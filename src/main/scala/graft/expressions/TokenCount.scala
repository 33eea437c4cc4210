package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen token counter (C1 hot path).
  *
  * Counts word-or-symbol tokens — maximal `[A-Za-z0-9]+` runs plus each
  * other non-space char — with the same semantics as
  * `size(regexp_extract_all(c, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))`, but as a
  * single byte scan inside whole-stage codegen: no regex engine, no
  * per-row array materialization. At 100 TB the token count runs once per
  * document per stage, so this is the expression worth making native
  * (SURVEY §4: "custom codegen Expression for token counting if UDF
  * overhead shows up").
  *
  * ASCII fast path with correct UTF-8 handling: any non-ASCII code point is
  * treated as a symbol character (it is neither `[A-Za-z0-9]` nor ASCII
  * whitespace), one token per code point, matching the regex form.
  */
final case class TokenCount(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"TokenCount requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)

  override def prettyName: String = "token_count"
}

object TokenCount {

  /** Single pass over UTF-8 bytes. Token boundaries:
    * - a run of `[A-Za-z0-9]` counts once;
    * - every other non-whitespace ASCII char counts once;
    * - every non-ASCII code point counts once (lead bytes 0xC0.. start one).
    * Whitespace = space, \t, \n, \r, \f,  (the regex `\s` set).
    */
  def count(s: UTF8String): Long = {
    if (s == null) return 0L
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    var tokens = 0L
    var inWord = false
    while (i < n) {
      val b: Int = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff
      if (b < 0x80) {
        val isAlnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')
        if (isAlnum) {
          if (!inWord) { tokens += 1; inWord = true }
        } else {
          inWord = false
          val isSpace = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
          if (!isSpace) tokens += 1
        }
      } else {
        inWord = false
        // count only UTF-8 lead bytes (0b10xxxxxx are continuations)
        if ((b & 0xc0) != 0x80) tokens += 1
      }
      i += 1
    }
    tokens
  }
}
