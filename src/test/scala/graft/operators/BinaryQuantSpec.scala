package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binary quantization: hand-computed packing, column-vs-driver twin
  * parity, the multi-index-hashing radius guarantee, and recall of the
  * Hamming+rerank retrieval on the real 64-dim corpus.
  */
class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  private val corpusPath = "/root/testdata/sf0.001/embeddings.parquet"

  test("hand-computed packing: strict > threshold, word layout") {
    val center = Array(0.0f, 0.0f, 0.5f)
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f)),  // bits: j0 only (0.5 > 0.5 is false) -> word 1
      (2L, Seq(-1.0f, 2.0f, 0.6f)),  // bits: j1, j2 -> word 6
      (3L, Seq(0.0f, 0.0f, 0.0f))    // no bits -> word 0
    ).toDF("id", "v")
    val packed = BinaryQuant.encode(df, "v", center)
      .select(col("id"), col("bits")).as[(Long, Seq[Long])].collect().toMap
    assert(packed(1L) == Seq(1L) && packed(2L) == Seq(6L) && packed(3L) == Seq(0L))
    // driver twins agree
    assert(BinaryQuant.packLocal(Array(1.0f, -1.0f, 0.5f), center).toSeq == Seq(1L))
    assert(BinaryQuant.packLocal(Array(-1.0f, 2.0f, 0.6f), center).toSeq == Seq(6L))
    // 65-dim vector spills into a second word: bit 64 -> word index 1, bit 0
    val wide = new Array[Float](65); wide(64) = 1.0f
    assert(BinaryQuant.packLocal(wide, new Array[Float](65)).toSeq == Seq(0L, 1L))
  }

  test("short or null-element vectors pack to null") {
    val center = new Array[Float](4)
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1.0f), Some(2.0f), Some(3.0f), Some(4.0f))),
      (2L, Seq[Option[Float]](Some(1.0f), Some(2.0f))),        // too short
      (3L, Seq[Option[Float]](Some(1.0f), None, Some(3.0f), Some(4.0f)))
    ).toDF("id", "v").withColumn("v", col("v").cast("array<float>"))
    val out = BinaryQuant.encode(df, "v", center)
      .select(col("id"), col("bits").isNull).as[(Long, Boolean)].collect().toMap
    assert(!out(1L) && out(2L) && out(3L))
  }

  test("column packing and Hamming match the driver twins on the real corpus") {
    val vecs = spark.read.parquet(corpusPath).select(col("vec_id"), col("embedding"))
    val center = BinaryQuant.trainCenter(vecs, "embedding")
    assert(center.length == 64)
    val q = vecs.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val qBits = BinaryQuant.packLocal(q, center)
    val rows = BinaryQuant.encode(vecs, "embedding", center)
      .withColumn("h_native", BinaryQuant.hammingExpr(col("bits"), qBits))
      .withColumn("h_sql", BinaryQuant.hammingCols(col("bits"),
        array(qBits.map(lit): _*)))
      .select(col("embedding"), col("bits"), col("h_native"), col("h_sql"))
      .limit(200).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val bits = r.getSeq[Long](1).toArray
      assert(bits.toSeq == BinaryQuant.packLocal(v, center).toSeq, "pack twin parity")
      val expected = bits.zip(qBits).map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
      assert(r.getInt(2) == expected, "native Hamming")
      assert(r.getInt(3) == expected, "SQL-composed Hamming twin")
    }
  }

  test("trainCenter is partition-invariant (fixed-point sums)") {
    val vecs = spark.read.parquet(corpusPath).select(col("vec_id"), col("embedding"))
    val c1 = BinaryQuant.trainCenter(vecs.repartition(1), "embedding")
    val c32 = BinaryQuant.trainCenter(vecs.repartition(32), "embedding")
    assert(c1.toSeq == c32.toSeq)
  }

  test("MIH candidates contain EVERY pair within the guaranteed radius") {
    val vecs = spark.read.parquet(corpusPath).select(col("vec_id"), col("embedding"))
    val center = BinaryQuant.trainCenter(vecs, "embedding")
    val codes = BinaryQuant.encode(vecs, "embedding", center)
      .select(col("vec_id"), col("bits"))
    val queries = codes.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("bits").as("qbits"))
    val cand = BinaryQuant.mihCandidates(codes, "bits", "vec_id",
      queries, "qid", "qbits", dim = 64)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    // brute-force ground truth on the driver (500 codes x 10 queries)
    val all = codes.select(col("vec_id"), col("bits")).as[(Long, Seq[Long])].collect()
    val qs = all.filter(_._1 % 50 == 0)
    // 64 bits / 16-bit blocks -> b=4 -> guaranteed radius 2*4-1 = 7
    val guaranteed = for {
      (qid, qb) <- qs
      (id, b) <- all
      d = qb.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 7
    } yield (qid, id)
    guaranteed.foreach { p =>
      assert(cand.contains(p), s"pair $p within radius 7 missing from MIH candidates")
    }
    // and the reported distances are exact
    val withD = BinaryQuant.mihCandidates(codes, "bits", "vec_id",
      queries, "qid", "qbits", dim = 64)
      .as[(Long, Long, Int)].collect()
    val byId = all.toMap
    withD.foreach { case (qid, id, d) =>
      val expected = byId(qid).zip(byId(id)).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(d == expected)
    }
  }

  test("nnJoinBinary matches the brute-force Hamming top-k with id tie-break") {
    val vecs = spark.read.parquet(corpusPath).select(col("vec_id"), col("embedding"))
    val center = BinaryQuant.trainCenter(vecs, "embedding")
    val codes = BinaryQuant.encode(vecs, "embedding", center)
      .select(col("vec_id"), col("bits"))
    val queries = codes.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("bits").as("qbits"))
    val got = BinaryQuant.nnJoinBinary(codes, "bits", "vec_id", queries, "qid", "qbits", n = 5)
      .orderBy(col("qid"), col("hamming"), col("neighbor_id"))
      .as[(Long, Long, Int)].collect().toSeq
    val all = codes.as[(Long, Seq[Long])].collect()
    val expected = all.filter(_._1 % 100 == 0).flatMap { case (qid, qb) =>
      all.map { case (id, b) =>
        (qid, id, qb.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum)
      }.sortBy { case (_, id, d) => (d, id) }.take(5)
    }.sortBy { case (qid, id, d) => (qid, d, id) }.toSeq
    assert(got == expected)
  }

  test("topKBinary: two-stage search recalls the exact cosine head") {
    val vecs = spark.read.parquet(corpusPath).select(col("vec_id"), col("embedding"))
    val center = BinaryQuant.trainCenter(vecs, "embedding")
    val codes = BinaryQuant.encode(vecs, "embedding", center)
      .select(col("vec_id"), col("bits"))
    val q = vecs.filter(col("vec_id") === 7).head().getSeq[Float](1).toArray
    val approx = BinaryQuant.topKBinary(codes, "bits", "vec_id",
      vecs, "embedding", q, center, k = 10, nCand = 100)
      .select(col("vec_id")).as[Long].collect().toSet
    val exact = Similarity.topK(vecs, "embedding", "vec_id", q, 10)
      .select(col("vec_id")).as[Long].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall@10 with 100/500 candidates = $recall")
  }
}
