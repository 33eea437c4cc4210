package graft.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native hyperplane LSH bucket id — the [[RandomProject]] pathology in the
  * other hot build path: the Column form is `nPlanes` sign-weighted
  * `element_at` chains (8 planes × 64 dims ≈ a 1000-node tree per row),
  * recomputed for every corpus AND query row of every kNN join, graph
  * build, and cosine-LSH dedup pass. One expression node with the memoized
  * ±1 sign matrix replaces it.
  *
  * Bit-compatible with the Column composition it replaces, quirks
  * included, because SQL oracles inline the same planes as literals:
  * per-plane left-to-right double accumulation over components `0..dim-1`,
  * bit set iff the sum `>= 0`, bit `p` weighted `1 << p` — and a null
  * component poisons its planes to bit 0 (the composed form's null-sum
  * path), never a null bucket. Two deliberate deviations, both on rows the
  * composed form handles WORSE: a vector shorter than `dim` buckets to 0
  * where ANSI `element_at` would throw mid-job, and a whole-NULL vector
  * maps to a NULL bucket (standard null propagation — an unscorable vector
  * should drop from the bucket equi-join, not collide into bucket 0).
  */
final case class LshBucket(child: Expression, dim: Int, nPlanes: Int, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    LshBucket.bucket(input.asInstanceOf[ArrayData], dim, nPlanes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.expressions.LshBucket.bucket($c, $dim, $nPlanes, $seed);"
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket"
}

object LshBucket {

  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def signs(dim: Int, nPlanes: Int, seed: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, nPlanes, seed), _ =>
      Array.tabulate(nPlanes) { p =>
        val s = graft.functions.VectorFunctions.planeSignString(dim, seed + p)
        Array.tabulate(dim)(i => if (s(i) == '+') 1.0 else -1.0)
      })

  def bucket(arr: ArrayData, dim: Int, nPlanes: Int, seed: Int): Int = {
    val sg = signs(dim, nPlanes, seed)
    val n = arr.numElements()
    // a plane over a too-short vector or a null component sums to NULL in
    // the HOF form, whose `when(s >= 0)` then emits bit 0 — replicate
    val poisoned = n < dim || {
      var i = 0; var any = false
      while (i < dim && !any) { any = arr.isNullAt(i); i += 1 }
      any
    }
    if (poisoned) return 0
    var b = 0
    var p = 0
    while (p < nPlanes) {
      val row = sg(p)
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      if (s >= 0.0) b |= 1 << p
      p += 1
    }
    b
  }
}
