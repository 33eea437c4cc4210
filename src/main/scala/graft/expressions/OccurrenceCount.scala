package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping substring occurrence count as one scan — the native form
  * of the `(length(s) - length(replace(s, g, ''))) / length(g)` idiom (which
  * allocates a full copy of `s` per pattern; the n-gram language profiler
  * runs that 30× per row). Matches are counted left-to-right, skipping the
  * match length after each hit — exactly the occurrences `replace()` would
  * have removed, so swapping the idiom for this expression is value-neutral.
  *
  * Empty patterns count 0 (the replace idiom's 0/len(g) guard is division
  * by zero there; here it is just defined).
  */
final case class OccurrenceCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"occurrence_count requires (STRING, STRING), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(str: Any, pat: Any): Any =
    OccurrenceCount.count(str.asInstanceOf[UTF8String], pat.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) => s"graft.expressions.OccurrenceCount.count($s, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OccurrenceCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "occurrence_count"
}

object OccurrenceCount {
  def count(s: UTF8String, pat: UTF8String): Long = {
    if (s == null || pat == null || pat.numChars() == 0) return 0L
    val step = pat.numChars()
    var n = 0L
    var idx = s.indexOf(pat, 0)
    while (idx >= 0) {
      n += 1
      idx = s.indexOf(pat, idx + step)
    }
    n
  }
}
