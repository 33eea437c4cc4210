package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native sign-bit packer: a `dim`-float vector becomes `ceil(dim/64)`
  * longs, bit `j` of word `j/64` set iff `v(j) > center(j)` (strict —
  * a value exactly on the center packs to 0, deterministically). The
  * 1-bit-per-dimension representation is the extreme end of the
  * quantization ladder (float32 → SQ8 → PQ → binary): 64-dim vectors
  * store in ONE long, a 256× shrink, and Hamming distance over packed
  * words approximates angular distance (Charikar's SimHash bound applied
  * to the identity "hyperplanes" after centering).
  *
  * Native for the [[PqEncode]] reason: the equivalent Column tree
  * (64 `when`/`shiftleft`/`bor` nodes per word) is huge and falls out of
  * codegen; here it is one call with a tight loop. The center rides the
  * plan as a reference object, not 64 literals.
  *
  * A vector shorter than `center.length` or containing a null element
  * packs to null (whole-row null propagation, the RandomProject
  * convention).
  */
final case class PackSignBits(child: Expression, center: Array[Float])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_sign_bits requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PackSignBits.pack(input.asInstanceOf[ArrayData], center)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signCenter", center, "float[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.PackSignBits.pack($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PackSignBits =
    copy(child = newChild)

  override def prettyName: String = "pack_sign_bits"
}

object PackSignBits {
  def pack(arr: ArrayData, center: Array[Float]): ArrayData = {
    val dim = center.length
    if (arr == null || arr.numElements() < dim) return null
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val words = new Array[Long]((dim + 63) >>> 6)
    j = 0
    while (j < dim) {
      if (arr.getFloat(j) > center(j)) words(j >>> 6) |= 1L << (j & 63)
      j += 1
    }
    new GenericArrayData(words)
  }
}

/** Native Hamming distance against a literal (per-query) packed code:
  * `Σ_w bitCount(a_w ^ q_w)`. One xor+popcount per word — for 64-dim
  * codes, literally one instruction pair per candidate. Null if the row's
  * code has a different word count than the query (corrupt row), so a
  * malformed code can never silently rank.
  */
final case class HammingToLit(child: Expression, query: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hamming_to_lit requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[ArrayData]
    if (code.numElements() != query.length) null
    else HammingToLit.distance(code, query)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("queryBits", query, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.numElements() != $ref.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.HammingToLit.distance($c, $ref);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HammingToLit =
    copy(child = newChild)

  override def prettyName: String = "hamming_to_lit"
}

object HammingToLit {
  def distance(code: ArrayData, query: Array[Long]): Int = {
    var acc = 0
    var w = 0
    while (w < query.length) {
      acc += java.lang.Long.bitCount(code.getLong(w) ^ query(w))
      w += 1
    }
    acc
  }
}
