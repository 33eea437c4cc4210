package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column operators over `array<float>` embeddings.
  *
  * All arithmetic is done through `zip_with`/`aggregate` higher-order
  * functions — codegen-friendly, no UDFs — accumulating in double precision
  * (left-to-right fold, matching how a scalar oracle evaluates the same sum).
  */
object VectorFunctions {

  /** Dot product of two float/double-array columns, accumulated
    * left-to-right as double — the NATIVE [[graft.expressions.VecDot]]
    * expression: the HOF form ([[dotHof]]) materializes the zipped product
    * array per pair, which at ANN-build volume (tens of millions of scored
    * pairs) is an allocation per value consumed once. Bit-identical null
    * algebra and accumulation order to the HOF form, so every SQL oracle
    * replays unchanged.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.expressions.VecDot(
        org.apache.spark.sql.graft.ColumnBridge.toExpression(a),
        org.apache.spark.sql.graft.ColumnBridge.toExpression(b)))

  /** The declarative twin of [[dot]] — for element types the native
    * expression doesn't take (ints, decimals); also the reference
    * implementation its tests compare against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }

  /** A literal vector column from a driver-side float array (for broadcasting
    * a single query vector into a codegen'd expression, E2 pattern).
    */
  def vecLit(v: Array[Float]): Column = array(v.map(x => lit(x)): _*)

  /** L2-normalize to unit length (float output; zero vectors pass through
    * unchanged). Normalizing the corpus once at ingest is what makes inner
    * product ≡ cosine — the precondition for dot-approximating
    * representations (PQ/ADC) to rank like the cosine ground truth.
    */
  def l2Normalize(v: Column): Column = {
    // bind the norm fold once per row (the quantizeInt8 single-element-array
    // trick); referencing it inside the per-element lambda would recompute
    // the whole fold per element — O(dim²)
    element_at(
      transform(array(norm(v)), n =>
        when(n > 0.0, transform(v, x => (x.cast("double") / n).cast("float")))
          .otherwise(v)),
      1)
  }

  /** Driver twin of [[l2Normalize]] — same fold order. */
  def l2NormalizeLocal(v: Array[Float]): Array[Float] = {
    val n = normLocal(v)
    if (n > 0.0) v.map(x => (x.toDouble / n).toFloat) else v
  }

  /** Driver-side twin of [[norm]] for a literal vector: same left-to-right
    * double accumulation as the `aggregate` fold, so the value is
    * bit-identical to what `norm(vecLit(v))` would compute per row.
    */
  def normLocal(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Cosine from a precomputed-norm pair — for joins that score many
    * (row, row) pairs: compute each side's norm ONCE in a projection below
    * the join instead of re-folding both vectors per pair (the guard and
    * divisor would otherwise each re-evaluate them). Bit-identical to
    * [[cosine]] when `na`/`nb` are the [[norm]] of `a`/`b`.
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val nn = na * nb
    when(nn > 0.0, dot(a, b) / nn).otherwise(lit(0.0))
  }

  /** Cosine against a literal query vector with the query norm precomputed
    * driver-side — Catalyst does not constant-fold `aggregate` over array
    * literals, so the plain [[cosine]] form re-evaluates `‖q‖` per row
    * (twice: guard + divisor). This variant folds it into a single `lit`.
    */
  def cosineToLit(a: Column, q: Array[Float]): Column = {
    val qn = normLocal(q)
    if (qn == 0.0) lit(0.0)
    else {
      val nn = norm(a) * lit(qn)
      when(nn > 0.0, dot(a, vecLit(q)) / nn).otherwise(lit(0.0))
    }
  }

  /** The ±1 sign pattern of one deterministic pseudo-random hyperplane, as a
    * `+`/`-` string — the single source of truth for the column expression
    * below AND for SQL oracles that inline the same plane as a literal.
    */
  def planeSignString(dim: Int, planeSeed: Int): String =
    (0 until dim).map { i =>
      if (scala.util.hashing.MurmurHash3.productHash((i, planeSeed)) % 2 == 0) '+' else '-'
    }.mkString

  /** Deterministic random hyperplane for LSH: 64 pseudo-random ±1 components
    * derived from a hash of (dim_index, plane_seed) — computed per-row-free
    * as a literal-driven expression so every executor sees identical planes.
    */
  def hyperplaneSign(vec: Column, dim: Int, planeSeed: Int): Column = {
    val signs = planeSignString(dim, planeSeed)
    val terms = (0 until dim).map { i =>
      element_at(vec, i + 1).cast("double") * lit(if (signs(i) == '+') 1.0 else -1.0)
    }
    val s = terms.reduce(_ + _)
    when(s >= 0.0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket id from `nPlanes` random-hyperplane bits — the NATIVE
    * [[graft.expressions.LshBucket]]: the composed form below
    * ([[lshBucketCols]]) is nPlanes × dim `element_at` chains per row, the
    * same blown-up-tree pathology [[randomProject]] replaced. Same planes
    * ([[planeSignString]]), same arithmetic, same oracles.
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, seed: Int = 42): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.expressions.LshBucket(
        org.apache.spark.sql.graft.ColumnBridge.toExpression(vec), dim, nPlanes, seed))

  /** The declarative twin of [[lshBucket]] — the reference its tests
    * compare against.
    */
  def lshBucketCols(vec: Column, dim: Int, nPlanes: Int, seed: Int = 42): Column =
    (0 until nPlanes)
      .map(p => hyperplaneSign(vec, dim, seed + p) * lit(1 << p))
      .reduce(_ + _)

  // ---------------------------------------------------------------------
  // Int8 scalar quantization — the 100 TB memory path. A float32 corpus of
  // 100 TB becomes 25 TB as int8 with per-vector scales; quantized cosine
  // is computed entirely in exact integer arithmetic (scales cancel), so
  // the scan is both 4× smaller and free of per-element float multiplies.

  /** Per-vector symmetric int8 quantization: `q_i = round(x_i · 127/max|x|)`
    * (zero vector → all-zero codes, scale 0). Codes are emitted as `long`
    * so integer dot products below never overflow and line up with BIGINT
    * arithmetic in SQL engines. Rounding is Spark's `round` (HALF_UP on the
    * canonical decimal form — see [[quantizeInt8Local]] for the twin).
    */
  def quantizeInt8(v: Column): Column = {
    val maxabs = array_max(transform(v, x => abs(x.cast("double"))))
    // bind the max-abs fold ONCE per row through a single-element-array
    // lambda: referencing the fold expression inside the per-element lambda
    // below would re-evaluate it per element — O(dim²) per row (measured
    // 8× on the 200k-vector scale probe)
    element_at(
      transform(array(maxabs), m => {
        val scale = when(m > 0.0, lit(127.0) / m).otherwise(lit(0.0))
        struct(
          scale.as("scale"),
          transform(v, x => round(x.cast("double") * scale).cast("long")).as("q"))
      }),
      1)
  }

  /** Dequantize int8 codes back to approximate floats: `x̂_i = q_i / scale`. */
  def dequantizeInt8(quant: Column): Column = {
    val s = quant.getField("scale")
    when(s > 0.0, transform(quant.getField("q"), q => q.cast("double") / s))
      .otherwise(transform(quant.getField("q"), q => lit(0.0)))
  }

  /** Exact integer dot product over two long-code arrays. */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine over int8 code arrays — per-vector scales cancel, so this equals
    * cosine of the dequantized vectors. Integer sums are exact; only the
    * final `sqrt`/division touch floating point.
    */
  def cosineQuantized(qa: Column, qb: Column): Column = {
    val d  = dotLong(qa, qb).cast("double")
    val nn = sqrt(dotLong(qa, qa).cast("double")) * sqrt(dotLong(qb, qb).cast("double"))
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }

  /** Signed random projection (Johnson–Lindenstrauss; the Achlioptas ±1
    * family): `out[j] = Σ_i vec[i]·sign(i, seed+j) / √outDim`, signs drawn
    * from the SAME deterministic [[planeSignString]] generator as the LSH
    * hyperplanes — so a SQL oracle can inline the sign matrix as literals.
    *
    * JL guarantee: pairwise distances survive within (1±ε) for
    * outDim = O(log n / ε²), so a 64-dim corpus projected to 16 dims keeps
    * neighbor structure while every downstream scan reads 4× less — and it
    * composes with int8 quantization ([[quantizeInt8]]) for a 16× smaller
    * at-rest representation. The projection is per-row codegen arithmetic:
    * no shuffle, no UDF, no driver state beyond the seed.
    */
  def randomProject(vec: Column, dim: Int, outDim: Int, seed: Int = 42): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.expressions.RandomProject(
        org.apache.spark.sql.graft.ColumnBridge.toExpression(vec), dim, outDim, seed))

  /** Driver-side twin of [[randomProject]] for a literal query vector:
    * identical sign strings, identical left-to-right double accumulation,
    * identical `double → float32` narrowing per output component.
    */
  def randomProjectLocal(v: Array[Float], outDim: Int, seed: Int = 42): Array[Float] = {
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim) { p =>
      val signs = planeSignString(v.length, seed + p)
      var s = 0.0
      var i = 0
      while (i < v.length) {
        s += v(i).toDouble * (if (signs(i) == '+') 1.0 else -1.0)
        i += 1
      }
      (s * inv).toFloat
    }
  }

  /** Driver-side twin of [[quantizeInt8]] for a literal query vector.
    * Spark's `round` on a double is `BigDecimal.valueOf(x).setScale(0,
    * HALF_UP)` (half away from zero on the shortest decimal form) — this
    * twin uses the identical construction so a quantized query literal is
    * bit-identical to what the column expression would produce.
    */
  def quantizeInt8Local(v: Array[Float]): Array[Long] = {
    var maxabs = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    if (maxabs == 0.0) Array.fill(v.length)(0L)
    else {
      val scale = 127.0 / maxabs
      v.map { x =>
        java.math.BigDecimal.valueOf(x.toDouble * scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
    }
  }
}
