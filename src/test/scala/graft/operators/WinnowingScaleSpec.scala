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

  test("DataFrame-form winnowing beats the quadratic Column form on long documents") {
    // same data, both implementations, measured under identical host load —
    // robust against suite-level contention (a cross-size wall-clock ratio
    // is not). The Column form re-evaluates the gram array per window
    // (~8-10x here); the relational form must land well under it.
    val df = corpus(5, 500)
    Dedup.withWinnowingFingerprint(df, "doc_id", "text", "fp")
      .select(sum(size(col("fp")))).head() // warm both paths' codegen
    val linear = time {
      Dedup.withWinnowingFingerprint(df, "doc_id", "text", "fp")
        .select(sum(size(col("fp")))).head()
    }
    val quadratic = time {
      df.withColumn("fp", Dedup.winnowingFingerprint(col("text")))
        .select(sum(size(col("fp")))).head()
    }
    assert(linear < quadratic,
      f"relational winnowing ($linear%.2fs) must clearly beat the Column form ($quadratic%.2fs)")
  }
}
