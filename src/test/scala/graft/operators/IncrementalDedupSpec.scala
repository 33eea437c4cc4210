package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the incremental MinHash signature index: the index path must
  * produce exactly the pairs a full-corpus run would, restricted to pairs
  * involving the new batch — no drift, including under the skew cap and
  * across appends.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // near-dup families spanning the old/new boundary: 1≈2 (old-old),
  // 3≈11 (old-new), 11≈12 (new-new), 4 and 13 unique
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (3L, "large scale data pipelines need careful dedup of near duplicate text"),
    (4L, "completely unrelated content about cooking pasta with fresh tomatoes"),
    (11L, "large scale data pipelines need careful dedup of near duplicate texts"),
    (12L, "large scale data pipelines need careful dedup of near duplicated texts"),
    (13L, "another singleton document concerning alpine hiking routes in winter")
  ).toDF("doc_id", "text")

  private def oldDocs = docs.filter(col("doc_id") < 10)
  private def newDocs = docs.filter(col("doc_id") >= 10)

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("incremental pairs == full-corpus pairs involving the new batch") {
    val dir = tmpDir("sigidx") + "/index"
    Dedup.writeSignatureIndex(oldDocs, "doc_id", "text", dir)
    val inc = pairsOf(Dedup.incrementalCandidates(spark, newDocs, "doc_id", "text", dir))
    val full = pairsOf(Dedup.minhashCandidates(docs, "doc_id", "text"))
      .filter { case (a, b) => a >= 10 || b >= 10 }
    assert(inc == full)
    assert(inc.nonEmpty) // the families above really do collide
    // and no corpus-internal pair leaks in
    assert(inc.forall { case (a, b) => a >= 10 || b >= 10 })
  }

  test("appending a processed batch makes later batches dedup against it") {
    val dir = tmpDir("sigidx2") + "/index"
    Dedup.writeSignatureIndex(oldDocs, "doc_id", "text", dir)
    val batch1 = docs.filter(col("doc_id") === 11L)
    Dedup.appendToSignatureIndex(batch1, "doc_id", "text", dir)
    val batch2 = docs.filter(col("doc_id") === 12L)
    val inc = pairsOf(Dedup.incrementalCandidates(spark, batch2, "doc_id", "text", dir))
    // 12 pairs with 11 only because 11's signatures were appended
    assert(inc.contains((11L, 12L)))
  }

  test("a replayed batch whose signatures already landed is counted once") {
    // at-least-once replay: the batch's append succeeded but the caller's
    // checkpoint commit didn't, so the same batch runs again. Its rows sit
    // on BOTH sides of the stored∪fresh union; double-counting them would
    // suppress buckets at half the configured cap. With 6 copies and cap 6,
    // any double-count pushes the bucket to 12 > 6 and kills every pair.
    val six = (1L to 6L).map(i => (i, "identical text in all six documents right here"))
      .toDF("doc_id", "text")
    val dir = tmpDir("sigidx4") + "/index"
    Dedup.writeSignatureIndex(six.limit(0), "doc_id", "text", dir) // empty index
    Dedup.appendToSignatureIndex(six, "doc_id", "text", dir)       // batch registered…
    val replay = pairsOf(Dedup.incrementalCandidates(spark, six, "doc_id", "text", dir,
      maxBucketSize = 6))                                          // …then replayed
    val fresh = pairsOf(Dedup.minhashCandidates(six, "doc_id", "text", maxBucketSize = 6))
    assert(replay == fresh)
    assert(replay.nonEmpty) // 6 ≤ cap: the pairs must survive
  }

  test("incremental semantic pairs == frozen-centroid full sweep restricted to the batch") {
    import graft.operators.Similarity
    // two well-separated directions; near-dups within each
    def v(a: Double, eps: Double) =
      Array((math.cos(a) + eps).toFloat, math.sin(a).toFloat, 0f, 0f)
    val old = Seq(
      (1L, v(0, 0)), (2L, v(0, 1e-4)),          // cluster A pair (old-old)
      (10L, v(2, 0)), (11L, v(2, 1e-4))          // cluster B pair (old-old)
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (3L, v(0, 2e-4)),                          // near-dup of 1 and 2 (old-new)
      (12L, v(2, 2e-4)), (13L, v(2, 3e-4)),      // B: old-new and new-new
      (20L, v(1, 0))                             // lonely direction, no pair
    ).toDF("vec_id", "embedding")
    val dir = tmpDir("semidx") + "/index"
    Similarity.writeIvf(spark,
      Similarity.buildIvf(old, "embedding", "vec_id", k = 3), dir)
    val inc = Dedup.incrementalSemanticCandidates(
      spark, batch, "vec_id", "embedding", dir, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: everything assigned under the SAME frozen centroids,
    // within-cell pairs, restricted to pairs involving the batch
    val cents = Similarity.readIvf(spark, dir).centroids
    val allRows = Similarity.assignCells(
      old.unionByName(batch), "embedding", cents)
    val full = allRows.select(col("cid"), col("vec_id").as("id_a"))
      .join(allRows.select(col("cid"), col("vec_id").as("id_b")), Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter { p: (Long, Long) =>
        val isNew = (x: Long) => x == 3L || x == 12L || x == 13L || x == 20L
        isNew(p._1) || isNew(p._2)
      }
    // pairs must be exactly the batch-involving same-cell near-dups
    assert(inc == Set((1L, 3L), (2L, 3L), (10L, 12L), (11L, 12L), (10L, 13L),
      (11L, 13L), (12L, 13L)))
    assert(inc.subsetOf(full), "every incremental pair shares a cell under the frozen centroids")
    // replay safety: the same batch already appended to the index must not
    // change the pair set (stored copies are anti-joined out)
    Similarity.appendToIvf(spark, batch, "embedding", "vec_id", dir)
    val replay = Dedup.incrementalSemanticCandidates(
      spark, batch, "vec_id", "embedding", dir, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(replay == inc)
  }

  test("compaction folds appends to one file per band, heals replays, preserves results") {
    val dir = tmpDir("sigidx5") + "/index"
    Dedup.writeSignatureIndex(oldDocs, "doc_id", "text", dir)
    val batch = docs.filter(col("doc_id") === 11L)
    Dedup.appendToSignatureIndex(batch, "doc_id", "text", dir)
    Dedup.appendToSignatureIndex(batch, "doc_id", "text", dir) // crashed-and-replayed append
    val before = pairsOf(Dedup.incrementalCandidates(spark, newDocs, "doc_id", "text", dir))
    val rowsBefore = spark.read.parquet(dir).count()
    Dedup.compactSignatureIndex(spark, dir)
    val after = pairsOf(Dedup.incrementalCandidates(spark, newDocs, "doc_id", "text", dir))
    assert(after == before)
    // replay duplicates healed on disk
    val rows = spark.read.parquet(dir)
    assert(rows.count() < rowsBefore)
    assert(rows.count() == rows.distinct().count())
    // one data file per band partition
    val bandDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("band="))
    assert(bandDirs.nonEmpty)
    bandDirs.foreach { bd =>
      assert(bd.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    }
  }

  test("gram-set hash families are stamped, survive parquet, and mismatches fail fast") {
    val bench = Seq((0L, "some benchmark text with enough words to form grams")).toDF("doc_id", "text")
    val grams = Dedup.benchmarkGrams(bench, "text", n = 3)
    assert(Dedup.gramFamilyOf(grams).contains(Dedup.PolyGram.tag))
    val dir = tmpDir("gramfam") + "/grams"
    grams.write.parquet(dir)
    val reloaded = spark.read.parquet(dir)
    assert(Dedup.gramFamilyOf(reloaded).contains(Dedup.PolyGram.tag),
      "family tag must survive a parquet round-trip")
    val corpus = Seq((1L, "some benchmark text with enough words to form grams")).toDF("doc_id", "text")
    // matching family: flags the identical document
    assert(Dedup.contaminatedIdsAgainstGrams(corpus, "doc_id", "text", reloaded, n = 3)
      .as[Long].collect().toSet == Set(1L))
    // mismatched family: refuse instead of silently matching nothing
    val ex = intercept[IllegalArgumentException] {
      Dedup.contaminatedIdsAgainstGrams(corpus, "doc_id", "text", reloaded, n = 3,
        hashFn = Dedup.XxStringGram)
    }
    assert(ex.getMessage.contains("hash family"))
  }

  test("fuzzy decontamination catches a paraphrase that exact n-grams miss") {
    // one word changed mid-sentence: every 8-gram crosses the edit, so the
    // exact rule sees zero collisions, but the MinHash bands still collide
    val bench = Seq(
      (0L, "the committee approved the annual budget for infrastructure and education programs yesterday")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "the committee approved the annual budget toward infrastructure and education programs yesterday"),
      (101L, "completely different text about sailing boats across the northern seas")
    ).toDF("doc_id", "text")
    val exact = Dedup.contaminatedIds(corpus, "doc_id", "text", bench, "text", n = 8)
      .as[Long].collect().toSet
    assert(exact.isEmpty, "every 8-gram crosses the one-word edit")
    val fuzzy = Dedup.fuzzyContaminatedIds(corpus, "doc_id", "text", bench, "text")
      .as[Long].collect().toSet
    assert(fuzzy == Set(100L), s"minhash bands must flag the paraphrase only, got $fuzzy")
  }

  test("the skew cap applies to the combined bucket population") {
    // 30 copies of one text across old and new: cap 5 kills those buckets
    // in BOTH the full run and the incremental run
    val many = (1L to 30L).map(i => (i, "same text repeated in every document here"))
      .toDF("doc_id", "text")
    val old = many.filter(col("doc_id") <= 20)
    val fresh = many.filter(col("doc_id") > 20)
    val dir = tmpDir("sigidx3") + "/index"
    Dedup.writeSignatureIndex(old, "doc_id", "text", dir)
    val inc = pairsOf(Dedup.incrementalCandidates(spark, fresh, "doc_id", "text", dir,
      maxBucketSize = 5))
    val full = pairsOf(Dedup.minhashCandidates(many, "doc_id", "text", maxBucketSize = 5))
      .filter { case (a, b) => a > 20 || b > 20 }
    assert(inc == full)
    assert(inc.isEmpty) // every bucket is over the cap
  }
}
