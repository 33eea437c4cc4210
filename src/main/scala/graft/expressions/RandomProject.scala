package graft.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native Johnson–Lindenstrauss signed random projection.
  *
  * Semantically identical to the Column composition it replaces —
  * `array((0 until outDim).map(p => Σᵢ element_at(vec, i+1) * ±1 * inv))` —
  * but as ONE expression node with a tight double-accumulation loop instead
  * of a ~dim×outDim-node tree (64×16 ⇒ ~2k nodes, which blows past the JIT
  * inline budget inside whole-stage codegen and ran ~interpreted). The sign
  * matrix comes from the same deterministic
  * [[graft.functions.VectorFunctions.planeSignString]] generator the LSH
  * planes and the DuckDB oracles share, memoized per (dim, outDim, seed);
  * accumulation order (left-to-right, double, ×inv, narrow to float32) is
  * bit-identical to [[graft.functions.VectorFunctions.randomProjectLocal]].
  *
  * A vector shorter than `dim`, or one containing a null element, projects
  * to null (the composition's `element_at` null-propagation, made
  * whole-row — silently substituting 0.0 for a null component would
  * produce a plausible-looking but wrong projection).
  */
final case class RandomProject(child: Expression, dim: Int, outDim: Int, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_project requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RandomProject.project(input.asInstanceOf[ArrayData], dim, outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.RandomProject.project($c, $dim, $outDim, $seed);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)

  override def prettyName: String = "random_project"
}

object RandomProject {

  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def signs(dim: Int, outDim: Int, seed: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, outDim, seed), _ =>
      Array.tabulate(outDim) { p =>
        val s = graft.functions.VectorFunctions.planeSignString(dim, seed + p)
        Array.tabulate(dim)(i => if (s(i) == '+') 1.0 else -1.0)
      })

  def project(arr: ArrayData, dim: Int, outDim: Int, seed: Int): ArrayData = {
    if (arr == null || arr.numElements() < dim) return null
    var j = 0
    while (j < dim) { // null component ⇒ null projection, never a silent 0.0
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val sg = signs(dim, outDim, seed)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Float](outDim)
    var p = 0
    while (p < outDim) {
      val row = sg(p)
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      out(p) = (s * inv).toFloat
      p += 1
    }
    new GenericArrayData(out)
  }
}
