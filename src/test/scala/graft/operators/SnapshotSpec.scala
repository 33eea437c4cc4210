package graft.operators

import java.nio.file.{Files => JFiles, Paths => JPaths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the manifest-log snapshot table ([[Snapshots]]) and the
  * diff-driven materialized aggregates ([[IncrementalAgg]]): commit
  * atomicity, time travel, snapshot isolation, copy-on-write carry-forward,
  * manifest-side pruning soundness, retention GC, and the
  * incremental-equals-recompute law.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, idFrom: Int = 0): DataFrame =
    spark.range(idFrom, idFrom + n)
      .select(col("id").as("doc_id"),
        concat(lit("src"), (col("id") % 3).cast("string")).as("source"),
        (col("id") * 7 % 100).as("n_chars"))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("append / read round-trip and time travel across versions") {
    val t = tmpDir("snap-rt")
    Snapshots.create(spark, t)
    val v1 = Snapshots.append(spark, t, docs(10))
    val v2 = Snapshots.append(spark, t, docs(5, idFrom = 10))
    assert(v1 == 1 && v2 == 2)
    assert(ids(Snapshots.read(spark, t)) == (0L until 15L).toSet)
    assert(ids(Snapshots.read(spark, t, Some(1))) == (0L until 10L).toSet)
    assert(Snapshots.read(spark, t, Some(0)).count() == 0)
    val h = Snapshots.history(spark, t).collect()
    assert(h.map(_.getAs[String]("op")).toSeq == Seq("append", "append", "create"))
    assert(h.head.getAs[Long]("n_rows") == 15L)
  }

  test("snapshot isolation: a pinned read is unaffected by later commits") {
    val t = tmpDir("snap-iso")
    Snapshots.create(spark, t)
    Snapshots.append(spark, t, docs(10))
    val pinned = Snapshots.read(spark, t, Some(1))
    Snapshots.append(spark, t, docs(10, idFrom = 10))
    Snapshots.deleteWhere(spark, t, col("doc_id") < 5)
    Snapshots.compact(spark, t)
    assert(ids(pinned) == (0L until 10L).toSet,
      "pinned frame must keep reading exactly its version's immutable files")
  }

  test("a manifest without a pointer swap is invisible; commit retry succeeds") {
    val t = tmpDir("snap-crash")
    Snapshots.create(spark, t)
    Snapshots.append(spark, t, docs(10))
    // simulate a crashed commit: manifest + data landed, _current not swapped
    val cur = JPaths.get(s"$t/_current")
    val saved = new String(JFiles.readAllBytes(cur)).trim
    Snapshots.append(spark, t, docs(99, idFrom = 1000))
    JFiles.write(cur, saved.getBytes) // roll the pointer back = crash before swap
    assert(ids(Snapshots.read(spark, t)) == (0L until 10L).toSet,
      "un-swapped commit must be invisible")
    // retry of version 2 must clear the leftover manifest dir and succeed
    val v = Snapshots.append(spark, t, docs(5, idFrom = 10))
    assert(v == 2)
    assert(ids(Snapshots.read(spark, t)) == (0L until 15L).toSet)
  }

  test("copy-on-write delete rewrites only stats-candidate files") {
    val t = tmpDir("snap-cow")
    Snapshots.create(spark, t)
    // three appends = three disjoint doc_id ranges = three file groups
    Snapshots.append(spark, t, docs(10).coalesce(1))
    Snapshots.append(spark, t, docs(10, idFrom = 10).coalesce(1))
    Snapshots.append(spark, t, docs(10, idFrom = 20).coalesce(1))
    val before = Snapshots.history(spark, t).head().getAs[Long]("n_files")
    val (v, rewritten, untouched) =
      Snapshots.deleteWhere(spark, t, col("doc_id") >= 20)
    assert(v == 4)
    assert(rewritten == 1 && untouched == before - 1,
      s"only the [20,30) file may be rewritten: rewritten=$rewritten untouched=$untouched")
    assert(ids(Snapshots.read(spark, t)) == (0L until 20L).toSet)
    // time travel still sees the deleted rows
    assert(ids(Snapshots.read(spark, t, Some(3))) == (0L until 30L).toSet)
    // carried-forward entries are the SAME files (paths unchanged)
    val p3 = Snapshots.read(spark, t, Some(3)).filter(col("doc_id") < 20)
      .select(input_file_name()).distinct().as[String].collect().toSet
    val p4 = Snapshots.read(spark, t, Some(4)).filter(col("doc_id") < 20)
      .select(input_file_name()).distinct().as[String].collect().toSet
    assert(p3 == p4, "untouched files must be carried forward by reference")
  }

  test("manifest-side pruning skips files soundly and keeps results exact") {
    val t = tmpDir("snap-prune")
    Snapshots.create(spark, t)
    (0 until 8).foreach(i => Snapshots.append(spark, t, docs(10, idFrom = i * 10).coalesce(1)))
    val plan = Snapshots.scanPlan(spark, t, col("doc_id") >= 25 && col("doc_id") < 45)
    assert(plan.filesTotal == 8)
    assert(plan.filesScanned == 3, s"ranges [20,30) [30,40) [40,50): ${plan.filesScanned}")
    assert(ids(plan.df) == (25L until 45L).toSet)
    // a predicate pruning cannot see keeps every file and still answers
    val noPrune = Snapshots.scanPlan(spark, t, col("source") === "src1")
    assert(noPrune.filesScanned == 8)
    assert(noPrune.df.count() == Snapshots.read(spark, t).filter(col("source") === "src1").count())
  }

  test("predicateBox extracts conjunctive numeric ranges conservatively") {
    import graft.operators.Snapshots.predicateBox
    val b1 = predicateBox(col("a") >= 3 && col("a") < 7 && col("b") === 5)
    assert(b1("a") == ((3.0, 7.0)) && b1("b") == ((5.0, 5.0)))
    // OR and non-numeric comparisons contribute nothing (no unsound pruning)
    assert(predicateBox(col("a") > 3 || col("b") < 2).isEmpty)
    assert(predicateBox(col("s") === "x").isEmpty)
    val b2 = predicateBox(lit(10) >= col("a") && col("s") === "x")
    assert(b2 == Map("a" -> ((Double.NegativeInfinity, 10.0))))
  }

  test("diffAppended returns exactly the delta, or None across non-appends") {
    val t = tmpDir("snap-diff")
    Snapshots.create(spark, t)
    Snapshots.append(spark, t, docs(10))
    Snapshots.append(spark, t, docs(10, idFrom = 10))
    Snapshots.append(spark, t, docs(10, idFrom = 20))
    val d = Snapshots.diffAppended(spark, t, 1, 3).get
    assert(ids(d) == (10L until 30L).toSet)
    assert(Snapshots.diffAppended(spark, t, 3, 3).get.count() == 0)
    Snapshots.deleteWhere(spark, t, col("doc_id") === 0)
    assert(Snapshots.diffAppended(spark, t, 3, 4).isEmpty,
      "a delete in the range must force the fallback signal")
  }

  test("snapshot compact preserves rows and history; expire reclaims") {
    val t = tmpDir("snap-gc")
    Snapshots.create(spark, t)
    (0 until 5).foreach(i => Snapshots.append(spark, t, docs(10, idFrom = i * 10).coalesce(1)))
    val before = Snapshots.read(spark, t)
      .agg(count(lit(1)), sum(col("n_chars"))).head()
    val v = Snapshots.compact(spark, t, targetRecordsPerFile = 1000)
    assert(Snapshots.history(spark, t).head().getAs[Long]("n_files") == 1)
    val after = Snapshots.read(spark, t).agg(count(lit(1)), sum(col("n_chars"))).head()
    assert(before == after, "compaction must be row-for-row identical")
    assert(ids(Snapshots.read(spark, t, Some(v - 1))) == ids(Snapshots.read(spark, t)),
      "pre-compaction version stays readable before expire")

    val dataFiles = (p: String) => Lake.dataFileCount(spark, s"$p/data")
    val filesBefore = dataFiles(t)
    val (manifestsDropped, filesDeleted) = Snapshots.expire(spark, t, keepLast = 1)
    assert(manifestsDropped == 6, s"versions 0..5 drop, 6 retained: $manifestsDropped")
    assert(filesDeleted == filesBefore - 1, "all pre-compaction files are unreferenced")
    assert(before == Snapshots.read(spark, t).agg(count(lit(1)), sum(col("n_chars"))).head())
    intercept[Exception](Snapshots.read(spark, t, Some(1)).count())
  }

  test("incremental aggregate refresh equals full recompute; idempotent") {
    val t = tmpDir("snap-agg-t")
    val a = tmpDir("snap-agg-a") + "/rollup"
    Snapshots.create(spark, t)
    Snapshots.append(spark, t, docs(20))
    val r1 = IncrementalAgg.refresh(spark, t, a, Seq("source"), Seq("n_chars"))
    assert(r1.mode == "full" && r1.tableVersion == 1)

    Snapshots.append(spark, t, docs(30, idFrom = 20))
    Snapshots.append(spark, t, docs(7, idFrom = 50))
    val r2 = IncrementalAgg.refresh(spark, t, a, Seq("source"), Seq("n_chars"))
    assert(r2.mode == "incremental" && r2.tableVersion == 3)

    def recompute() = Snapshots.read(spark, t).groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_n_chars"))
    def asMap(df: DataFrame) = df.collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n"), r.getAs[Long]("sum_n_chars"))))
      .toMap
    assert(asMap(IncrementalAgg.read(spark, a)) == asMap(recompute()),
      "incrementally merged state must equal the from-scratch aggregate")

    assert(IncrementalAgg.refresh(spark, t, a, Seq("source"), Seq("n_chars")).mode == "noop")

    // a delete breaks insert-only lineage -> detected, full recompute, still exact
    Snapshots.deleteWhere(spark, t, col("doc_id") % 5 === 0)
    val r3 = IncrementalAgg.refresh(spark, t, a, Seq("source"), Seq("n_chars"))
    assert(r3.mode == "full" && r3.tableVersion == 4)
    assert(asMap(IncrementalAgg.read(spark, a)) == asMap(recompute()))
  }
}
