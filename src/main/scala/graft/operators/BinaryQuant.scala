package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosineToLit

/** Binary (1-bit) quantization — the far end of the vector-compression
  * ladder (float32 → SQ8 → PQ → sign bits): center each dimension and keep
  * only the sign, so a 64-dim float vector stores in ONE long (256×
  * smaller) and candidate scoring is xor+popcount. Charikar's SimHash bound
  * makes Hamming distance over the packed bits a monotone estimator of
  * angular distance; an exact cosine rerank of the Hamming head restores
  * precision (the two-stage `e2_rp_rerank` discipline).
  *
  * Reference anchor: the reference stores raw float embeddings and searches
  * them linearly (`infrastructure/chroma_vector_store.py:22-66` semantics);
  * this operator is the 100 TB representation the same queries would run
  * against — 256× less I/O per scan, and the multi-index-hashing variant
  * turns candidate generation into a partition-prunable equi-join.
  *
  * Scale shapes:
  *  - [[topKBinary]]: scan codes → native Hamming → TakeOrdered → broadcast
  *    rerank join. No shuffle of the corpus, ever.
  *  - [[nnJoinBinary]]: query cohort broadcasts (|Q| rows of packed longs);
  *    scoring is map-side xor+popcount; the only exchange is the
  *    bounded-buffer per-query `top_k` partials.
  *  - [[mihCandidates]]: multi-index hashing (Norouzi et al., "Fast Search
  *    in Hamming Space with Multi-Index Hashing", CVPR 2012) — split the
  *    code into 16-bit blocks; by pigeonhole any code within Hamming
  *    distance ≤ 2·blocks−1 of the query matches some block exactly or at
  *    one flipped bit, so probing each block's value plus its 16 one-bit
  *    variants yields a GUARANTEED-radius candidate set from a pure
  *    equi-join on (block_idx, block_val) — the join key a bucketed layout
  *    co-locates at 10⁹ vectors.
  */
object BinaryQuant {

  /** Fixed-point micro-units for partition-invariant mean sums
    * (the [[Pq.train]] discipline).
    */
  private val Scale = 1000000L

  /** Bits per multi-index block. 16 keeps per-block probe fan-out at
    * 1 + 16 keys and block-value cardinality at 65536 — a joinable key
    * space even for billions of codes.
    */
  private val BlockBits = 16

  /** Per-dimension mean, computed in fixed-point so the center is
    * bit-identical under any partitioning. One explode + groupBy over the
    * corpus; the collect is `dim` rows (bounded, never corpus-sized).
    */
  def trainCenter(df: DataFrame, vecCol: String): Array[Float] = {
    val rows = df
      .select(posexplode(col(vecCol)).as(Seq("_i", "_x")))
      .groupBy(col("_i"))
      .agg(count(lit(1)).as("_n"),
        sum(round(col("_x").cast("double") * Scale).cast("long")).as("_s"))
      .collect()
    require(rows.nonEmpty, "trainCenter: empty corpus")
    val dim = rows.map(_.getInt(0)).max + 1
    val center = new Array[Float](dim)
    rows.foreach { r =>
      center(r.getInt(0)) = (r.getLong(2).toDouble / r.getLong(1) / Scale).toFloat
    }
    center
  }

  /** Native sign-bit packing column (array<bigint>, `ceil(dim/64)` words). */
  def packExpr(v: Column, center: Array[Float]): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.expressions.PackSignBits(
        org.apache.spark.sql.graft.ColumnBridge.toExpression(v), center))

  /** Driver twin of [[packExpr]] — same strict-> comparison, same layout. */
  def packLocal(v: Array[Float], center: Array[Float]): Array[Long] = {
    val words = new Array[Long]((center.length + 63) >>> 6)
    var j = 0
    while (j < center.length) {
      if (v(j) > center(j)) words(j >>> 6) |= 1L << (j & 63)
      j += 1
    }
    words
  }

  /** Project the corpus to packed sign-bit codes (`bits`: array<bigint>). */
  def encode(df: DataFrame, vecCol: String, center: Array[Float]): DataFrame =
    df.withColumn("bits", packExpr(col(vecCol), center))

  /** Hamming distance against a literal query code (native xor+popcount). */
  def hammingExpr(bits: Column, queryBits: Array[Long]): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.expressions.HammingToLit(
        org.apache.spark.sql.graft.ColumnBridge.toExpression(bits), queryBits))

  /** SQL-composed Hamming between two packed-code COLUMNS — the join-side
    * twin of [[hammingExpr]] (zip_with + bit_count + fold), used where the
    * query code is itself a column. Codegen'd end to end.
    */
  def hammingCols(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)

  /** Two-stage literal-query search: Hamming top-`nCand` over the packed
    * codes (scan → native popcount → TakeOrdered — ties break toward the
    * smaller id), then an exact cosine rerank of those candidates against
    * the float corpus (broadcast join: `nCand` rows against the corpus
    * scan). Returns (`idCol`, `hamming`, `sim`), best cosine first.
    */
  def topKBinary(
      codes: DataFrame, bitsCol: String, idCol: String,
      corpus: DataFrame, vecCol: String,
      query: Array[Float], center: Array[Float],
      k: Int, nCand: Int): DataFrame = {
    val qBits = packLocal(query, center)
    val cand = codes
      .withColumn("hamming", hammingExpr(col(bitsCol), qBits))
      .orderBy(col("hamming"), col(idCol))
      .select(col(idCol), col("hamming"))
      .limit(nCand)
    corpus.select(col(idCol), col(vecCol))
      .join(broadcast(cand), Seq(idCol))
      .withColumn("sim", round(cosineToLit(col(vecCol), query), 6))
      .orderBy(col("sim").desc, col(idCol))
      .select(col(idCol), col("hamming"), col("sim"))
      .limit(k)
  }

  /** Set-based Hamming top-`n`: the query cohort (qid, packed code)
    * BROADCASTS — a packed code is `ceil(dim/64)` longs, so even a
    * 100k-query cohort is a few MB — and scoring is map-side xor+popcount;
    * the one exchange carries bounded-buffer per-query `top_k` partials.
    * Returns (`qidCol`, `neighbor_id`, `hamming`).
    */
  def nnJoinBinary(
      codes: DataFrame, bitsCol: String, idCol: String,
      queries: DataFrame, qidCol: String, qbitsCol: String,
      n: Int): DataFrame =
    codes
      .crossJoin(broadcast(queries.select(col(qidCol), col(qbitsCol).as("_qb"))))
      .withColumn("hamming", hammingCols(col(bitsCol), col("_qb")))
      // top_k keeps the LARGEST by struct order, so rank by negated
      // distance and break ties toward the smaller id via negated id.
      .withColumn("_nd", -col("hamming"))
      .withColumn("_nid", -col(idCol))
      .groupBy(col(qidCol))
      .agg(expr(s"top_k(struct(_nd, _nid), $n)").as("_top"))
      .select(col(qidCol), explode(col("_top")).as("_t"))
      .select(col(qidCol), (-col("_t._nid")).as("neighbor_id"),
        (-col("_t._nd")).as("hamming"))

  /** Guaranteed-radius candidate pairs via multi-index hashing: every
    * (query, code) pair within Hamming distance ≤ 2·blocks−1 appears in the
    * output (pigeonhole: ≤ 2b−1 differing bits over b blocks leaves some
    * block with ≤ 1 difference, which the 0/1-bit probe variants cover).
    * The corpus side explodes once into (block_idx, block_val) — an
    * equi-join key a bucketed at-rest layout co-locates; the query side
    * expands to |Q|·b·17 probe rows and BROADCASTS. Output is distinct
    * (`qid`, `id`) candidate pairs with their exact Hamming distance.
    */
  def mihCandidates(
      codes: DataFrame, bitsCol: String, idCol: String,
      queries: DataFrame, qidCol: String, qbitsCol: String,
      dim: Int): DataFrame = {
    val perWord = 64 / BlockBits
    val mask = (1L << BlockBits) - 1
    val nWords = (dim + 63) >>> 6
    // statically unrolled (block_idx, block_val) extraction — stays inside
    // whole-stage codegen (no lambda higher-order functions on the hot side)
    def blockVals(bits: Column): Column = array((for {
      wi <- 0 until nWords
      b <- 0 until perWord
    } yield struct(
      lit(wi * perWord + b).as("_bi"),
      shiftright(element_at(bits, wi + 1), b * BlockBits).bitwiseAND(lit(mask)).as("_bv"))): _*)
    // corpus: one (block_idx, block_val) row per block
    val corpusBlocks = codes
      .select(col(idCol), col(bitsCol), explode(blockVals(col(bitsCol))).as("_blk"))
      .select(col(idCol), col(bitsCol), col("_blk._bi").as("_bi"), col("_blk._bv").as("_bv"))
    // queries: per block, the exact value plus each 1-bit variant
    val queryProbes = queries
      .select(col(qidCol), col(qbitsCol).as("_qb"), explode(blockVals(col(qbitsCol))).as("_blk"))
      .select(col(qidCol), col("_qb"), col("_blk._bi").as("_bi"),
        explode(array(col("_blk._bv") +:
          (0 until BlockBits).map(f => col("_blk._bv").bitwiseXOR(lit(1L << f))): _*)).as("_bv"))
    corpusBlocks
      .join(broadcast(queryProbes), Seq("_bi", "_bv"))
      .select(col(qidCol), col(idCol), col(bitsCol), col("_qb"))
      .distinct()
      .withColumn("hamming", hammingCols(col(bitsCol), col("_qb")))
      .select(col(qidCol), col(idCol), col("hamming"))
  }
}
