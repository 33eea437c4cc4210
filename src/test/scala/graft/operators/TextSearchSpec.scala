package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 laws: hand-computed scores, brute == indexed, and the inverted
  * index's term-bucket partition pruning (the at-rest scale path).
  */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple"),
    (4L, "cherry cherry cherry date"),
    (5L, "date elderberry   fig")
  ).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Okapi formula") {
    // corpus: N=5, dls = [3,2,1,4,3] (whitespace runs collapse), avgdl=13/5
    // query = [apple]: df=2, postings: (1, tf=2, dl=3), (3, tf=1, dl=1)
    val n = 5.0
    val avgdl = 13.0 / 5.0
    val idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))
    def w(tf: Double, dl: Double) =
      idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
    val got = TextSearch.bm25TopK(corpus, "text", "doc_id", Seq("apple"), 10)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 3L))
    assert(math.abs(got(1L) - w(2, 3)) < 1e-12)
    assert(math.abs(got(3L) - w(1, 1)) < 1e-12)
    // length normalization: doc 3's dl=1 beats doc 1's higher tf at dl=3
    assert(got(3L) > got(1L))
  }

  test("multi-term scores are per-term sums; docs without any term are absent") {
    val got = TextSearch.bm25TopK(corpus, "text", "doc_id", Seq("apple", "banana"), 10)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // docs 4,5 have neither term
    val appleOnly = TextSearch.bm25TopK(corpus, "text", "doc_id", Seq("apple"), 10)
      .as[(Long, Double)].collect().toMap
    val bananaOnly = TextSearch.bm25TopK(corpus, "text", "doc_id", Seq("banana"), 10)
      .as[(Long, Double)].collect().toMap
    // doc 1 holds both terms: its score is exactly the sum of the
    // single-term scores (df per term is unchanged by the query mix)
    assert(math.abs(got(1L) - (appleOnly(1L) + bananaOnly(1L))) < 1e-12)
    // doc 2 holds only banana: adding apple to the query changes nothing
    assert(math.abs(got(2L) - bananaOnly(2L)) < 1e-12)
  }

  test("query terms absent from the corpus contribute nothing; unknown-only query is empty") {
    val a = TextSearch.bm25Scores(corpus, "text", "doc_id", Seq("apple", "zzz"))
      .as[(Long, Double)].collect().toMap
    val b = TextSearch.bm25Scores(corpus, "text", "doc_id", Seq("apple"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    assert(TextSearch.bm25Scores(corpus, "text", "doc_id", Seq("zzz")).isEmpty)
  }

  test("indexed search equals brute search and prunes term buckets at the scan") {
    val dir = tmpDir("bm25") + "/index"
    TextSearch.writeIndex(spark, corpus, "text", "doc_id", dir, nBuckets = 8)
    val q = Seq("apple", "cherry")
    val brute = TextSearch.bm25TopK(corpus, "text", "doc_id", q, 10)
      .as[(Long, Double)].collect().toSeq
    val viaIndex = TextSearch.searchIndex(spark, dir, q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(viaIndex.map(_._1) == brute.map(_._1))
    viaIndex.zip(brute).foreach { case ((_, s1), (_, s2)) =>
      assert(math.abs(s1 - s2) < 1e-12)
    }
    val scan = TextSearch.searchIndex(spark, dir, q, 10)
      .queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("bucket")).getOrElse("")
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"query must prune postings partitions by term bucket:\n$scan")
  }

  test("append + search equals a from-scratch build; compaction preserves it") {
    val full = tmpDir("bm25full") + "/index"
    val inc = tmpDir("bm25inc") + "/index"
    TextSearch.writeIndex(spark, corpus, "text", "doc_id", full, nBuckets = 8)
    TextSearch.writeIndex(spark, corpus.filter(col("doc_id") <= 3),
      "text", "doc_id", inc, nBuckets = 8)
    TextSearch.appendToIndex(spark, corpus.filter(col("doc_id") > 3),
      "text", "doc_id", inc)
    val q = Seq("apple", "cherry", "date")
    val fromFull = TextSearch.searchIndex(spark, full, q, 10)
      .as[(Long, Double)].collect().toMap
    val fromInc = TextSearch.searchIndex(spark, inc, q, 10)
      .as[(Long, Double)].collect().toMap
    assert(fromInc.keySet == fromFull.keySet)
    fromInc.foreach { case (id, s) => assert(math.abs(s - fromFull(id)) < 1e-12,
      s"appended-index score for doc $id drifted") }
    // compact: segments fold to one file per bucket, df re-denormalized
    TextSearch.compactIndex(spark, inc)
    val compacted = TextSearch.searchIndex(spark, inc, q, 10)
      .as[(Long, Double)].collect().toMap
    assert(compacted.keySet == fromFull.keySet)
    compacted.foreach { case (id, s) => assert(math.abs(s - fromFull(id)) < 1e-12) }
    // one data file per occupied bucket after compaction
    val bucketDirs = new java.io.File(inc).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { b =>
      val parts = b.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"bucket ${b.getName} has ${parts.length} files after compaction")
    }
  }

  test("a replayed append (same segmentId) is skipped: scores and stats count once") {
    val dir = tmpDir("bm25replay") + "/index"
    TextSearch.writeIndex(spark, corpus.filter(col("doc_id") <= 3),
      "text", "doc_id", dir, nBuckets = 8)
    val batch = corpus.filter(col("doc_id") > 3)
    TextSearch.appendToIndex(spark, batch, "text", "doc_id", dir, segmentId = "day-1")
    val once = TextSearch.searchIndex(spark, dir, Seq("apple", "date"), 10)
      .as[(Long, Double)].collect().toMap
    // the at-least-once case: append landed, checkpoint commit didn't,
    // the exact same batch replays under the same segment id
    TextSearch.appendToIndex(spark, batch, "text", "doc_id", dir, segmentId = "day-1")
    val twice = TextSearch.searchIndex(spark, dir, Seq("apple", "date"), 10)
      .as[(Long, Double)].collect().toMap
    assert(twice == once, "a replayed segment must not change scores")
    // and both equal the from-scratch build (n/avgdl counted once)
    val scratch = tmpDir("bm25replay2") + "/index"
    TextSearch.writeIndex(spark, corpus, "text", "doc_id", scratch, nBuckets = 8)
    val clean = TextSearch.searchIndex(spark, scratch, Seq("apple", "date"), 10)
      .as[(Long, Double)].collect().toMap
    assert(once.keySet == clean.keySet)
    once.foreach { case (id, s) => assert(math.abs(s - clean(id)) < 1e-12) }
  }

  test("duplicate posting rows from a half-landed append are healed by distinct") {
    val dir = tmpDir("bm25heal") + "/index"
    TextSearch.writeIndex(spark, corpus.filter(col("doc_id") <= 3),
      "text", "doc_id", dir, nBuckets = 8)
    TextSearch.appendToIndex(spark, corpus.filter(col("doc_id") > 3),
      "text", "doc_id", dir, segmentId = "day-1")
    val healthy = TextSearch.searchIndex(spark, dir, Seq("apple", "cherry", "date"), 10)
      .as[(Long, Double)].collect().toMap
    // simulate the crash artifact: postings duplicated RAW (no segment
    // stats) — exactly what a replay-after-mid-append crash leaves behind
    val rows = spark.read.parquet(dir).localCheckpoint(true)
    rows.write.partitionBy("bucket").mode("append").parquet(dir)
    val healed = TextSearch.searchIndex(spark, dir, Seq("apple", "cherry", "date"), 10)
      .as[(Long, Double)].collect().toMap
    assert(healed == healthy, "duplicated posting rows must not change scores")
    // compaction heals permanently: one file per bucket, same scores
    TextSearch.compactIndex(spark, dir)
    val compacted = TextSearch.searchIndex(spark, dir, Seq("apple", "cherry", "date"), 10)
      .as[(Long, Double)].collect().toMap
    assert(compacted.keySet == healthy.keySet)
    compacted.foreach { case (id, s) => assert(math.abs(s - healthy(id)) < 1e-12) }
  }

  test("appending an empty batch changes nothing") {
    val dir = tmpDir("bm25empty") + "/index"
    TextSearch.writeIndex(spark, corpus, "text", "doc_id", dir, nBuckets = 8)
    val before = TextSearch.searchIndex(spark, dir, Seq("apple"), 10)
      .as[(Long, Double)].collect().toMap
    TextSearch.appendToIndex(spark, corpus.limit(0), "text", "doc_id", dir)
    val after = TextSearch.searchIndex(spark, dir, Seq("apple"), 10)
      .as[(Long, Double)].collect().toMap
    assert(before == after)
  }

  test("RRF fusion matches hand-computed reciprocal ranks") {
    val listA = Seq((10L, 5.0), (11L, 3.0), (12L, 1.0)).toDF("id", "s")
    val listB = Seq((11L, 0.9), (13L, 0.8)).toDF("id", "s")
    val got = TextSearch.fuseRrf(Seq(listA, listB), "id", "s", k = 10)
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    // ranks: A: 10→1, 11→2, 12→3; B: 11→1, 13→2
    assert(math.abs(got(11L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(10L) - 1.0 / 61) < 1e-15)
    assert(math.abs(got(12L) - 1.0 / 63) < 1e-15)
    assert(math.abs(got(13L) - 1.0 / 62) < 1e-15)
    // the doc present in BOTH lists outranks every single-list doc here
    assert(got(11L) > got(10L) && got(11L) > got(13L))
  }

  test("RRF rank ties break by id, not input order") {
    val t1 = Seq((2L, 1.0), (1L, 1.0)).toDF("id", "s")
    val got = TextSearch.fuseRrf(Seq(t1), "id", "s", k = 2)
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L)) // equal scores → smaller id gets rank 1
  }

  test("BM25 scores are invariant under repartitioning") {
    val q = Seq("apple", "cherry")
    val a = TextSearch.bm25Scores(corpus.repartition(7), "text", "doc_id", q)
      .as[(Long, Double)].collect().toMap
    val b = TextSearch.bm25Scores(corpus.coalesce(1), "text", "doc_id", q)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, s) => assert(math.abs(s - b(id)) < 1e-12) }
  }

  test("RRF with an empty list contributes nothing; single-list RRF preserves order") {
    val listA = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "s")
    val empty = Seq.empty[(Long, Double)].toDF("id", "s")
    val fused = TextSearch.fuseRrf(Seq(listA, empty), "id", "s", k = 10)
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    val solo = TextSearch.fuseRrf(Seq(listA), "id", "s", k = 10)
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(fused == solo)
    val order = TextSearch.fuseRrf(Seq(listA), "id", "s", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(order == Seq(1L, 2L, 3L))
  }

  test("duplicate query terms do not double-count") {
    val once = TextSearch.bm25Scores(corpus, "text", "doc_id", Seq("apple"))
      .as[(Long, Double)].collect().toMap
    val twice = TextSearch.bm25Scores(corpus, "text", "doc_id", Seq("apple", "apple"))
      .as[(Long, Double)].collect().toMap
    assert(once == twice)
  }

  test("evalRanking matches hand-computed nDCG/MRR/recall") {
    // q1: ranked docs 1,2,3 (scores 3>2>1); relevant: 2 (rel 1), 9 (rel 2, unretrieved)
    //   DCG  = (2^0-1)/log2(2) + (2^1-1)/log2(3) + (2^0-1)/log2(4) = 1/log2(3)
    //   IDCG = (2^2-1)/log2(2) + (2^1-1)/log2(3) = 3 + 1/log2(3)
    //   MRR = 1/2 (first relevant at rank 2); recall = 1/2
    // q2: no relevant docs at all -> all zeros
    val results = Seq(
      ("q1", 1L, 3.0), ("q1", 2L, 2.0), ("q1", 3L, 1.0),
      ("q2", 1L, 1.0)).toDF("query", "doc_id", "score")
    val rel = Seq(("q1", 2L, 1), ("q1", 9L, 2)).toDF("query", "doc_id", "rel")
    val m = TextSearch.evalRanking(results, rel, "query", "doc_id", "score", "rel", k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val l3 = math.log(3.0) / math.log(2.0)
    val (ndcg, mrr, rec) = m("q1")
    assert(math.abs(ndcg - (1.0 / l3) / (3.0 + 1.0 / l3)) < 1e-12)
    assert(mrr == 0.5 && rec == 0.5)
    assert(m("q2") == ((0.0, 0.0, 0.0)))
  }

  test("evalRanking truncates at k before scoring") {
    // relevant doc sits at rank 3; with k=2 it is outside the cut:
    // dcg=0, mrr=0, recall=0 — but idcg still counts the judgment
    val results = Seq(
      ("q", 1L, 3.0), ("q", 2L, 2.0), ("q", 3L, 1.0)).toDF("query", "doc_id", "score")
    val rel = Seq(("q", 3L, 1)).toDF("query", "doc_id", "rel")
    val r = TextSearch.evalRanking(results, rel, "query", "doc_id", "score", "rel", k = 2)
      .collect().head
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("snapshot-driven refresh: rebuild/append/noop, crash replay, retire fallback") {
    val t = tmpDir("ts-snap") + "/t"
    val idx = tmpDir("ts-snap-idx") + "/idx"
    val cur = tmpDir("ts-snap-cur") + "/c"
    def docs(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("doc_id"),
      concat(lit("apple word"), col("id") % 3,
        when(col("id") % 2 === 0, lit(" banana")).otherwise(lit(""))).as("text"))
    Snapshots.create(spark, t)
    Snapshots.append(spark, t, docs(0, 20))
    def refresh() = TextSearch.refreshIndexFromSnapshot(
      spark, t, idx, "text", "doc_id", cur, nBuckets = 8)
    def scores() = TextSearch.searchIndex(spark, idx, Seq("apple", "banana"), Int.MaxValue)
      .select(col("doc_id"), round(col("score"), 9).as("s"))
      .as[(Long, Double)].collect().toMap
    def oracle(ref: org.apache.spark.sql.DataFrame) = {
      val p = tmpDir("ts-snap-ref") + "/i"
      TextSearch.writeIndex(spark, ref, "text", "doc_id", p, nBuckets = 8)
      TextSearch.searchIndex(spark, p, Seq("apple", "banana"), Int.MaxValue)
        .select(col("doc_id"), round(col("score"), 9).as("s"))
        .as[(Long, Double)].collect().toMap
    }
    assert(refresh() == "rebuild")
    assert(scores() == oracle(docs(0, 20)))
    // appended commits register as ONE version-range segment
    Snapshots.append(spark, t, docs(20, 25))
    Snapshots.append(spark, t, docs(25, 30))
    assert(refresh() == "append")
    assert(scores() == oracle(docs(0, 30)), "delta segment must equal a from-scratch build")
    assert(refresh() == "noop")
    // crash between index write and cursor commit: roll the cursor back —
    // the segment high-water says (1,3] is already folded in → noop (the
    // cursor still re-commits to the table head)
    Snapshots.commitCursor(cur, 1L)
    assert(refresh() == "noop")
    assert(scores() == oracle(docs(0, 30)), "replayed segment must count once")
    // crash replay AFTER the table advanced (round-13 advisory): the
    // replay's range (1,5] differs from the crashed round's (1,3], so a
    // range-named segment id alone would re-append (1,3] twice and skew
    // df/BM25 — the high-water clamp appends exactly (3,5]
    Snapshots.commitCursor(cur, 1L)
    Snapshots.append(spark, t, docs(30, 35))
    Snapshots.append(spark, t, docs(35, 40))
    assert(refresh() == "append")
    assert(scores() == oracle(docs(0, 40)),
      "advanced replay must fold (1,3] exactly once and (3,5] exactly once")
    assert(refresh() == "noop")
    // a retire (MOR delete) cannot be expressed append-only: rebuild
    Snapshots.deleteWhereMor(spark, t, col("doc_id") < 5)
    assert(refresh() == "rebuild")
    assert(scores() == oracle(docs(5, 40)), "rebuilt index must exclude retired docs")
    assert(refresh() == "noop")
  }
}
