package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: hand-computed codes/scores, column-vs-driver twin
  * parity, partition-invariant training, and recall of the ADC+rerank
  * retrieval pipeline on the real 64-dim corpus.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed PQ: codes, ADC table, and scores on a 2x1 model") {
    // dim=2, m=2, dsub=1; codebooks fixed by construction (no training):
    // subspace 0 entries {0.0, 10.0}, subspace 1 entries {1.0, -1.0}
    val model = Pq.PqModel(2, 2, 1, Vector(
      Vector(Array(0.0f), Array(10.0f)),
      Vector(Array(1.0f), Array(-1.0f))))
    val df = Seq(
      (1L, Seq(9.0f, -0.5f)),  // codes (1, 1): |9-10|<|9-0|, |-0.5+1|<|-0.5-1|
      (2L, Seq(2.0f, 0.9f)),   // codes (0, 0)
      (3L, Seq(5.0f, 0.0f))    // codes (0 on tie? |5-0|=|5-10| -> smaller code 0; 0.0: |0-1|=|0+1| -> 0)
    ).toDF("id", "v")
    val enc = Pq.encode(df, "v", model)
      .select(col("id"), col("pq_code")).as[(Long, Seq[Int])].collect().toMap
    assert(enc(1L) == Seq(1, 1) && enc(2L) == Seq(0, 0))
    assert(enc(3L) == Seq(0, 0), "L2 ties must break toward the smaller code")
    // ADC for q = (2, 3): table = [[0, 20], [3, -3]]
    val q = Array(2.0f, 3.0f)
    val table = Pq.adcTable(q, model)
    assert(table(0).toSeq == Seq(0.0, 20.0) && table(1).toSeq == Seq(3.0, -3.0))
    // scores: id1 = 20 + (-3) = 17; id2 = 0 + 3 = 3; id3 = 0 + 3 = 3
    val top = Pq.topKAdc(enc.keys.toSeq.map(i => (i, enc(i))).toDF("id", "pq_code"),
      "pq_code", "id", q, 3, model)
      .select(col("id"), col("adc_score")).as[(Long, Double)].collect().toSeq
    assert(top == Seq((1L, 17.0), (2L, 3.0), (3L, 3.0)),
      s"ADC ordering with id tie-break, got $top")
  }

  test("column encode/score match the driver twins on the real corpus") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val model = Pq.train(vecs, "embedding", "vec_id", m = 8, k = 16, iters = 2)
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val rows = Pq.encode(vecs, "embedding", model)
      .withColumn("s", Pq.adcScoreExpr(col("pq_code"), q, model))
      .select(col("embedding"), col("pq_code"), col("s"))
      .limit(200).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val code = r.getSeq[Int](1).toArray
      assert(code.toSeq == Pq.encodeLocal(v, model).toSeq, "encode twin parity")
      assert(r.getDouble(2) == Pq.adcScoreLocal(code, q, model), "ADC twin parity")
    }
  }

  test("training is partition-invariant (fixed-point sums)") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = Pq.train(vecs, "embedding", "vec_id", m = 4, k = 8, iters = 2)
    val b = Pq.train(vecs.repartition(13), "embedding", "vec_id", m = 4, k = 8, iters = 2)
    (0 until a.m).foreach { s =>
      (0 until a.k).foreach { c =>
        assert(a.codebooks(s)(c).toSeq == b.codebooks(s)(c).toSeq,
          s"codebook ($s,$c) drifted under repartition")
      }
    }
  }

  test("set-based nnJoinAdc equals the per-query topKAdc loop") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val model = Pq.train(vecs, "embedding", "vec_id", m = 8, k = 16, iters = 1)
    val codes = Pq.encode(vecs, "embedding", model).select(col("vec_id"), col("pq_code"))
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val joined = Pq.nnJoinAdc(codes, "pq_code", "vec_id",
      queries.select(col("vec_id").as("qid"), col("embedding")), "qid", "embedding",
      n = 5, model)
      .select(col("qid"), col("neighbor_id"), col("adc_score"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    queries.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1).toArray
      val loop = Pq.topKAdc(codes, "pq_code", "vec_id", q, 5, model)
        .select(col("vec_id"), col("adc_score")).as[(Long, Double)].collect().toSet
      assert(joined(qid) == loop, s"set-based vs loop mismatch for query $qid")
    }
  }

  test("ADC top-100 + exact rerank recalls the true top-10 on the 64-dim corpus") {
    // L2-normalize at ingest: ADC approximates the raw dot product, so the
    // corpus must be unit-length for ADC to rank like the cosine truth
    val vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("embedding"))
      .localCheckpoint(true)
    val model = Pq.train(vecs.filter(col("vec_id") % 20 =!= 0), "embedding", "vec_id",
      m = 16, k = 16, iters = 2)
    val codes = Pq.encode(vecs.filter(col("vec_id") % 20 =!= 0), "embedding", model)
      .select(col("vec_id"), col("pq_code"), col("embedding")).localCheckpoint(true)
    val queries = vecs.filter(col("vec_id") % 20 === 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .take(40)
    var recallSum = 0.0
    queries.foreach { case (qid, q) =>
      val cand = Pq.topKAdc(codes, "pq_code", "vec_id", q, 100, model)
      // exact re-rank of the 100 candidates (the e2_rp_rerank second stage)
      val approx = Similarity.topK(
        cand.select(col("vec_id"), col("embedding")), "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val exact = Similarity.topK(codes, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      recallSum += approx.intersect(exact).size / 10.0
    }
    val recall = recallSum / queries.length
    info(f"PQ(m=16,k=16) ADC top-100 rerank recall@10 = $recall%.3f over ${queries.length} queries")
    assert(recall >= 0.8, f"PQ rerank recall collapsed: $recall%.3f")
  }

  test("IVF-PQ: full probe equals flat ADC; narrow probe stays within cells") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val model = Pq.train(vecs, "embedding", "vec_id", m = 8, k = 16, iters = 1)
    val index = Pq.encodeIvf(
      Similarity.buildIvf(vecs, "embedding", "vec_id", k = 8), "embedding", model)
    val q = vecs.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // full probe scans every cell: identical rows to flat ADC over all codes
    val full = Pq.topKIvfPq(index, "vec_id", q, 10, nProbes = 8, model)
      .select(col("vec_id"), col("adc_score")).as[(Long, Double)].collect().toSeq
    val flat = Pq.topKAdc(Pq.encode(vecs, "embedding", model), "pq_code", "vec_id",
      q, 10, model)
      .select(col("vec_id"), col("adc_score")).as[(Long, Double)].collect().toSeq
    assert(full == flat, "full-probe IVF-PQ must equal flat ADC")
    // narrow probe: every result belongs to the single probed cell
    val one = Pq.topKIvfPq(index, "vec_id", q, 10, nProbes = 1, model)
      .select(col("vec_id")).as[Long].collect().toSet
    val members = index.assigned
      .join(one.toSeq.toDF("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("cid")).distinct().as[Int].collect().toSet
    assert(members.size == 1, s"narrow probe leaked across cells: $members")
  }

  test("persisted index roundtrips the model and append equals a full re-encode") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = vecs.filter(col("vec_id") % 5 =!= 4)
    val batch = vecs.filter(col("vec_id") % 5 === 4)
    val dir = java.nio.file.Files.createTempDirectory("pq-append").toString + "/index"
    val model = Pq.train(base, "embedding", "vec_id", m = 8, k = 16, iters = 2)
    Pq.writePq(spark,
      Pq.encode(base, "embedding", model).select(col("vec_id"), col("pq_code")),
      model, dir)
    // model roundtrips bit-exactly (floats through parquet)
    val loaded = Pq.readPqModel(spark, dir)
    assert(loaded.m == model.m && loaded.k == model.k && loaded.dsub == model.dsub)
    for (s <- 0 until model.m; c <- 0 until model.k)
      assert(loaded.codebooks(s)(c).toSeq == model.codebooks(s)(c).toSeq)
    // appended store == one-shot encode of the whole corpus, every row
    Pq.appendToPq(spark, batch, "embedding", "vec_id", dir)
    val stored = Pq.readPqCodes(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap
    val rebuilt = Pq.encode(vecs, "embedding", model)
      .select(col("vec_id"), col("pq_code"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(stored == rebuilt, "frozen-codebook append must be bit-identical to a rebuild")
  }
}
