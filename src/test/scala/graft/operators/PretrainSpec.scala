package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed crawl→training-shards pipeline ([[Pretrain.prepare]]):
  * per-stage semantics on a corpus constructed so every stage has a row it
  * must drop, plus determinism and the cross-stage contracts
  * (`pipeline_pretrain_e2e` pins the same chain against the DuckDB oracle
  * on the fixture tables; this spec pins WHICH doc each stage drops).
  */
class PretrainSpec extends SparkSpec {
  import spark.implicits._

  /** ~55 distinct-ish words ending in punctuation — passes every quality
    * gate (≥50 words incl. the 10-word boiler, ≥1 Gopher stopword, mean
    * word length in range, low repetition).
    */
  private def goodText(seed: Int): String = {
    val words = (0 until 45).map(i => s"word${(i * 7 + seed * 13) % 97}x")
    s"the data pipeline of batch $seed runs with " + words.mkString(" ")
  }

  private def mkRaw(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "source", "lang", "text")
      .withColumn("html", Pretrain.crawlHtml(col("text")))
      .select(col("doc_id"), col("source"), col("lang"), col("html"))

  private val cfg = Pretrain.PretrainConfig()

  test("prepare: each stage drops exactly the doc built to fail it") {
    // 0..9: clean passers (even/odd split keeps the LM train slice sane)
    val passers = (0L to 9L).map(i => (i, s"src${i % 3}", "en", goodText(i.toInt)))
    // 100: too short for Gopher (after the 10-word boiler: 13 words total)
    val short = (100L, "src0", "en", "tiny doc of three words here now.")
    // 101: exact duplicate of doc 1 — loses ALL lines to doc 1 at the
    // line-dedup stage (first occurrence is doc 1's) and drops empty
    val exactDup = (101L, "src1", "en", goodText(1))
    // 102: massive single-bigram repetition -> top_ngram_char_frac > 0.2
    val repeaty = (102L, "src2", "en",
      "the data pipeline of batch nine runs with " + Seq.fill(60)("spam ham").mkString(" ") + " end.")
    val raw = mkRaw(passers :+ short :+ exactDup :+ repeaty)

    // benchmark shares a verbatim 5-gram with doc 3's text -> decontam drop
    val bench = Seq(goodText(3).split(" ").slice(8, 20).mkString(" ")).toDF("text")

    val (report, kept) = Pretrain.prepare(spark, raw, Some(bench))
    val stages = report.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(stages("00_ingest")._1 === 13)
    assert(stages("02_c4")._1 === 13) // C4 drops junk LINES, not docs
    assert(stages("03_gopher")._1 === 12) // -100 (word count)
    assert(stages("04_repetition")._1 === 11) // -102 (top-ngram frac)
    // exact dup 101 loses every line to doc 1 corpus-wide and drops empty
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(!keptIds.contains(100L) && !keptIds.contains(102L))
    assert(!keptIds.contains(101L))
    assert(keptIds.contains(1L))
    assert(!keptIds.contains(3L)) // decontaminated
    // the boiler paragraph survives in EXACTLY one kept document
    val withBoiler = kept.filter(col("text").contains("Free hosting provided by"))
      .count()
    assert(withBoiler <= 1)
    // shard layout: full permutation columns, shard in range
    val shards = kept.select("shard").as[Int].collect()
    assert(shards.forall(s => s >= 0 && s < cfg.nShards))
    assert(kept.columns.contains("order_key"))
    // per-source budget respected
    val bySource = kept.groupBy(col("source")).agg(sum(col("toks")).as("t"))
      .as[(String, Long)].collect()
    assert(bySource.forall(_._2 <= cfg.budgetTokens))
  }

  test("prepare: deterministic across runs and report fp pins content") {
    val raw = mkRaw((0L to 7L).map(i => (i, s"src${i % 2}", "en", goodText(i.toInt))))
    val (r1, k1) = Pretrain.prepare(spark, raw, None)
    val (r2, k2) = Pretrain.prepare(spark, raw, None)
    assert(r1.orderBy("stage").collect().toSeq === r2.orderBy("stage").collect().toSeq)
    assert(k1.orderBy("shard", "order_key").collect().toSeq ===
      k2.orderBy("shard", "order_key").collect().toSeq)
    // no-benchmark run: decontam stage is a pass-through of fuzzy's row
    val m = r1.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m("08_decontam") === m("07_fuzzy_dedup"))
  }
}
