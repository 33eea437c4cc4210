package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guard against the lambda-invariant recompute trap in winnowing: the
  * DataFrame form materializes the k-gram hash array once per row, so cost
  * is linear in document length. (The pure-Column form is documented
  * quadratic — Catalyst re-evaluates the gram array once per window — and
  * is kept only for chunk-sized text and oracle replays.)
  */
class WinnowingScaleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(nDocs: Int, tokens: Int) =
    (0 until nDocs).map { d =>
      (d.toLong, (0 until tokens).map(i => s"w${(i * 31 + d) % 997}").mkString(" "))
    }.toDF("doc_id", "text")

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  test("DataFrame-form winnowing equals the Column form") {
    val df = corpus(50, 40)
    val a = Dedup.withWinnowingFingerprint(df, "doc_id", "text", "fp")
      .select("doc_id", "fp").as[(Long, Seq[Long])].collect().toMap
    val b = df.withColumn("fp", Dedup.winnowingFingerprint(col("text")))
      .select("doc_id", "fp").as[(Long, Seq[Long])].collect().toMap
    assert(a == b)
  }

  test("DataFrame-form winnowing cost is ~linear in document length") {
    def run(tokens: Int, docs: Int): Double = {
      val df = corpus(docs, tokens)
      Dedup.withWinnowingFingerprint(df, "doc_id", "text", "fp")
        .select(sum(size(col("fp")))).head() // warm
      time {
        Dedup.withWinnowingFingerprint(df, "doc_id", "text", "fp")
          .select(sum(size(col("fp")))).head()
      }
    }
    val short = run(tokens = 200, docs = 200) // 40k tokens total
    val long = run(tokens = 2000, docs = 20)  // 40k tokens total
    // equal total token counts: linear behavior keeps the ratio near 1;
    // the quadratic form measures >10x here. Generous slack for host noise.
    assert(long < short * 5 + 1.0,
      f"winnowing long-doc blowup: $long%.2fs vs $short%.2fs at equal token totals")
  }
}
