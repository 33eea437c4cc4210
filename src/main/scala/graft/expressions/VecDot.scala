package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two vector columns, accumulated left-to-right in
  * double — the hottest scalar in the engine: every cosine in the ANN
  * searches, the dedup candidate scoring, the recall gates' brute-force
  * legs, and the graph walk funnels through it.
  *
  * Native for a different reason than [[RandomProject]]/[[PqEncode]] (those
  * fought codegen SIZE): the Column form
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` stays inside codegen but
  * materializes the zipped PRODUCT ARRAY per pair — at 91M scored pairs per
  * LSH build that is 91M transient arrays for values consumed once. Here:
  * one tight loop, zero allocation.
  *
  * Bit-identical to the Column form by construction — same left-to-right
  * double accumulation (every SQL oracle replays that order), same null
  * algebra: arrays of unequal length yield null (zip_with pads the shorter
  * side with null, which poisons the fold), as does any null element.
  * Element types may be float or double on each side independently (chunk
  * embeddings are float; pooled/averaged vectors come back double).
  */
final case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}Box =
         |  graft.expressions.VecDot.dot($a, $b, $lf, $rf);
         |if (${ev.value}Box == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Box.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Null iff lengths differ or any element is null — the zip_with/aggregate
    * fold's exact null algebra.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
