package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization encode: per subspace the squared-L2-nearest
  * codebook entry (ties → smaller code). Semantically identical to the
  * Column composition it replaces — `array_min` over m×k distance structs —
  * but one expression node with tight loops instead of a ~m·k·dsub·3-node
  * tree (16×16×4 ⇒ ~3k nodes, which overflows janino method limits and
  * falls back to interpreted evaluation; the [[RandomProject]] lesson).
  * The codebook rides the plan as a reference object (`flat` layout:
  * `((s·k)+c)·dsub+j`), not as thousands of literals.
  *
  * A vector shorter than m·dsub or containing a null element encodes to
  * null (whole-row null propagation, the RandomProject convention).
  */
final case class PqEncode(child: Expression, m: Int, k: Int, dsub: Int, flat: Array[Float])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], m, k, dsub, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", flat, "float[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.PqEncode.encode($c, $m, $k, $dsub, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  def encode(arr: ArrayData, m: Int, k: Int, dsub: Int, flat: Array[Float]): ArrayData = {
    val dim = m * dsub
    if (arr == null || arr.numElements() < dim) return null
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestCode = 0
      var c = 0
      while (c < k) {
        val off = (s * k + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val d = arr.getFloat(s * dsub + i).toDouble - flat(off + i).toDouble
          d2 += d * d
          i += 1
        }
        if (d2 < best) { best = d2; bestCode = c } // strict: ties keep smaller
        c += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Native ADC score: m table lookups + adds per row against a per-query
  * weight table (`table(s·k + code_s)`), folded in subspace order —
  * identical accumulation to `Pq.adcScoreLocal`. One node instead of an
  * m-deep `element_at` chain over m k-literal arrays.
  */
final case class AdcScore(child: Expression, m: Int, k: Int, table: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adc_score requires ARRAY<INT> codes, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() < m) null else AdcScore.score(codes, m, k, table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", table, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.AdcScore.score($c, $m, $k, $ref);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcScore =
    copy(child = newChild)

  override def prettyName: String = "adc_score"
}

object AdcScore {
  def score(codes: ArrayData, m: Int, k: Int, table: Array[Double]): Double = {
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += table(s * k + codes.getInt(s))
      s += 1
    }
    acc
  }
}

/** Native per-query ADC lookup table: for every (subspace s, code c) the
  * dot product of the query's subvector s with codebook centroid (s, c),
  * flattened `s·k + c` — the m·k-double array [[AdcScore]]-style scoring
  * reads per row. One expression node; the equivalent Column composition
  * (an `array` of m·k folds, each dsub `element_at` products — 16×16×4 ⇒
  * ~1k leaf nodes) expands past janino's 64 KB generated-method limit and
  * silently drops the query-side projection to interpreted evaluation
  * (the [[PqEncode]] lesson, query side). Accumulation is j-ascending
  * left-to-right from 0.0 — bit-identical to `Pq.adcTable` and to the
  * composed fold it replaces. A vector shorter than m·dsub or containing
  * a null element maps to null (the [[RandomProject]] convention; the
  * composition errored under ANSI instead — battery vectors are always
  * full-width, and null is the kinder contract).
  */
final case class AdcTable(child: Expression, m: Int, k: Int, dsub: Int, flat: Array[Float])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adc_table requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AdcTable.build(input.asInstanceOf[ArrayData], m, k, dsub, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", flat, "float[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.AdcTable.build($c, $m, $k, $dsub, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTable =
    copy(child = newChild)

  override def prettyName: String = "adc_table"
}

object AdcTable {
  def build(arr: ArrayData, m: Int, k: Int, dsub: Int, flat: Array[Float]): ArrayData = {
    val dim = m * dsub
    if (arr == null || arr.numElements() < dim) return null
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val off = (s * k + c) * dsub
        var dp = 0.0
        var i = 0
        while (i < dsub) {
          dp += arr.getFloat(s * dsub + i).toDouble * flat(off + i).toDouble
          i += 1
        }
        out(s * k + c) = dp
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}
