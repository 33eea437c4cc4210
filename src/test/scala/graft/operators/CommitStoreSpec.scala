package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the extracted commit primitives ([[CommitStore]]) and — the
  * point of the extraction — the FULL snapshot protocol running over the
  * [[MemoryCommitStore]] conditional-PUT fake: if every law (isolation,
  * crash retry, multi-writer no-append-lost, stale-lock breaking) holds
  * with the pointer/lock/cursors virtualized to compare-and-set map
  * entries, the protocol assumes nothing an S3-class store can't provide.
  * The default [[LocalCommitStore]] path is covered by the whole of
  * `SnapshotSpec`.
  */
class CommitStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, idFrom: Int = 0): DataFrame =
    spark.range(idFrom, idFrom + n)
      .select(col("id").as("doc_id"),
        concat(lit("src"), (col("id") % 3).cast("string")).as("source"),
        (col("id") * 7 % 100).as("n_chars"))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  private def withStore[T](s: CommitStore)(body: => T): T = {
    Snapshots.commitStoreOverride = Some(s)
    try body finally Snapshots.commitStoreOverride = None
  }

  test("conditional-PUT contract: CAS pointer swap, exclusive lock, injectable age") {
    val m = new MemoryCommitStore
    assert(m.readPointer("t").isEmpty)
    m.swapPointer("t", -1L, 0L)
    assert(m.readPointer("t").contains(0L))
    intercept[java.util.ConcurrentModificationException](m.swapPointer("t", 5L, 6L))
    // racing CAS from 8 threads at the same expected parent: exactly one wins
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val wins = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            try { m.swapPointer("t", 0L, 10L + i); true }
            catch { case _: java.util.ConcurrentModificationException => false }
        })
      }.count(_.get())
      assert(wins == 1, s"a conditional PUT admits exactly one winner: $wins")
    } finally { pool.shutdownNow(); () }
    // lock: create-if-absent; only the holder's token unlocks
    assert(m.tryLock("t", "a"))
    assert(!m.tryLock("t", "b"))
    m.unlock("t", "b")
    assert(m.lockToken("t").contains("a"), "a foreign token must not unlock")
    m.unlock("t", "a")
    assert(m.tryLock("t", "b"))
    m.plantLock("t", "dead", ageMs = 100000L)
    assert(m.lockAgeMs("t").exists(_ >= 100000L), "planted age drives staleness")
  }

  test("the full snapshot protocol holds over the conditional-PUT store") {
    val m = new MemoryCommitStore
    withStore(m) {
      val t = tmpDir("cps-proto")
      Snapshots.create(spark, t)
      Snapshots.append(spark, t, docs(10).coalesce(1))
      Snapshots.append(spark, t, docs(10, idFrom = 10).coalesce(1))
      assert(ids(Snapshots.read(spark, t)) == (0L until 20L).toSet)
      assert(ids(Snapshots.read(spark, t, Some(1))) == (0L until 10L).toSet,
        "time travel over the virtualized pointer")
      // snapshot isolation across a MOR delete + merge + compact
      val pinned = Snapshots.read(spark, t, Some(2))
      Snapshots.deleteWhereMor(spark, t, col("doc_id") % 3 === 0)
      val mg = Snapshots.merge(spark, t,
        docs(2, idFrom = 1).withColumn("n_chars", lit(-7L)), Seq("doc_id"))
      assert(mg.rowsUpdated == 2)
      Snapshots.compact(spark, t): Unit
      assert(ids(pinned) == (0L until 20L).toSet, "pinned reads stay isolated")
      val want = (0L until 20L).filterNot(_ % 3 == 0).toSet + 1L + 2L
      assert(ids(Snapshots.read(spark, t)) == want)
      // cursor consumption over the virtualized cursor store
      val cur = s"consumer://${t}/c1"
      val r1 = Snapshots.readChangesSince(spark, t, cur)
      assert(r1.mode == "full")
      Snapshots.commitCursor(cur, r1.toV)
      Snapshots.append(spark, t, docs(3, idFrom = 500))
      val r2 = Snapshots.readChangesSince(spark, t, cur)
      assert(r2.mode == "incremental" && ids(r2.df) == (500L until 503L).toSet)
      // retention GC over the fake (manifests/data are real files)
      Snapshots.expire(spark, t, keepLast = 1): Unit
      assert(ids(Snapshots.read(spark, t)) == want ++ (500L until 503L))
      assert(m.swaps.get() >= 7, "every commit rode the conditional PUT")
    }
  }

  test("8 concurrent appenders lose nothing over the conditional-PUT store") {
    val m = new MemoryCommitStore
    withStore(m) {
      val t = tmpDir("cps-race")
      Snapshots.create(spark, t)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val results = (0 until 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long =
              Snapshots.append(spark, t, docs(10, idFrom = i * 100).coalesce(1))
          })
        }
        val versions = results.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        assert(versions.toSet.size == 8, s"each append lands its own version: $versions")
        assert(Snapshots.currentVersion(t).contains(8L))
        assert(ids(Snapshots.read(spark, t)) ==
          (0 until 8).flatMap(i => (i * 100).toLong until (i * 100 + 10).toLong).toSet,
          "no append lost with the lock and pointer virtualized")
      } finally { pool.shutdownNow(); () }
    }
  }

  test("crash retry over the conditional-PUT store: un-swapped manifest is invisible") {
    val m = new MemoryCommitStore
    withStore(m) {
      val t = tmpDir("cps-crash")
      Snapshots.create(spark, t)
      Snapshots.append(spark, t, docs(10)): Unit
      Snapshots.append(spark, t, docs(99, idFrom = 1000)): Unit
      m.forcePointer(t, 1L) // crash after manifest write, before the PUT
      assert(ids(Snapshots.read(spark, t)) == (0L until 10L).toSet,
        "un-swapped commit must be invisible")
      val v = Snapshots.append(spark, t, docs(5, idFrom = 10))
      assert(v == 2L, "retry clears the leftover manifest and lands")
      assert(ids(Snapshots.read(spark, t)) == (0L until 15L).toSet)
    }
  }

  // --- HadoopCommitStore: the hdfs:// impl, executed over file:/// ---
  // FileContext backs local paths via RawLocalFs, so the exact code path
  // a non-local scheme dispatches to (FileContext.rename(OVERWRITE) swap,
  // create(overwrite=false) lock) runs for real here — a typo'd Path or a
  // FileContext quirk fails THIS suite, not a production hdfs deploy
  // (round-13 verdict: this impl previously had zero test execution).

  private def hadoopStore(): HadoopCommitStore =
    new HadoopCommitStore(spark.sparkContext.hadoopConfiguration)

  test("HadoopCommitStore primitives: swap pair, exclusive lock, cursor round-trip") {
    val h = hadoopStore()
    val t = tmpDir("hcs-prim")
    h.prepareTable(t)
    assert(h.readPointer(t).isEmpty)
    h.swapPointer(t, -1L, 0L)
    assert(h.readPointer(t).contains(0L))
    h.swapPointer(t, 0L, 1L)
    assert(h.readPointer(t).contains(1L))
    // the conditional-swap race pair: a writer whose expected parent went
    // stale must be rejected, and the pointer must be left untouched
    intercept[java.util.ConcurrentModificationException](h.swapPointer(t, 0L, 2L))
    assert(h.readPointer(t).contains(1L), "losing swap must not move the pointer")
    // lock: atomic create-if-absent; only the holder's token survives
    assert(h.tryLock(t, "alpha"))
    assert(!h.tryLock(t, "beta"), "create(overwrite=false) admits one holder")
    assert(h.lockToken(t).contains("alpha"))
    assert(h.lockAgeMs(t).exists(_ >= 0L))
    h.breakLock(t)
    assert(h.lockToken(t).isEmpty)
    assert(h.tryLock(t, "beta"))
    h.breakLock(t)
    // cursor: atomic rename write, readable back
    val cur = s"$t/_cursors/c1"
    assert(h.readCursor(cur).isEmpty)
    h.writeCursor(cur, 7L)
    assert(h.readCursor(cur).contains(7L))
    h.writeCursor(cur, 9L)
    assert(h.readCursor(cur).contains(9L))
  }

  test("the full snapshot protocol holds over HadoopCommitStore") {
    withStore(hadoopStore()) {
      val t = tmpDir("hcs-proto")
      Snapshots.create(spark, t)
      Snapshots.append(spark, t, docs(10).coalesce(1))
      Snapshots.append(spark, t, docs(10, idFrom = 10).coalesce(1))
      assert(ids(Snapshots.read(spark, t)) == (0L until 20L).toSet)
      assert(ids(Snapshots.read(spark, t, Some(1))) == (0L until 10L).toSet,
        "time travel over the FileContext-swapped pointer")
      Snapshots.deleteWhereMor(spark, t, col("doc_id") % 3 === 0)
      val mg = Snapshots.merge(spark, t,
        docs(2, idFrom = 1).withColumn("n_chars", lit(-7L)), Seq("doc_id"))
      assert(mg.rowsUpdated == 2)
      Snapshots.compact(spark, t): Unit
      val want = (0L until 20L).filterNot(_ % 3 == 0).toSet + 1L + 2L
      assert(ids(Snapshots.read(spark, t)) == want)
      // cursor consumption through the Hadoop cursor impl
      val cur = s"$t/_cursors/consumer1"
      val r1 = Snapshots.readChangesSince(spark, t, cur)
      assert(r1.mode == "full")
      Snapshots.commitCursor(cur, r1.toV)
      Snapshots.append(spark, t, docs(3, idFrom = 500))
      val r2 = Snapshots.readChangesSince(spark, t, cur)
      assert(r2.mode == "incremental" && ids(r2.df) == (500L until 503L).toSet)
      Snapshots.expire(spark, t, keepLast = 1): Unit
      assert(ids(Snapshots.read(spark, t)) == want ++ (500L until 503L))
    }
  }

  test("stale lock breaks and a held lock blocks loudly, over the fake") {
    val m = new MemoryCommitStore
    withStore(m) {
      val t = tmpDir("cps-lock")
      Snapshots.create(spark, t)
      m.plantLock(t, "dead-owner", ageMs = 10000000L)
      assert(Snapshots.append(spark, t, docs(3)) == 1L,
        "a stale foreign lock must break and the commit proceed")
      m.plantLock(t, "live-owner", ageMs = 0L)
      val prevWait = Snapshots.lockWaitMs
      Snapshots.lockWaitMs = 300L
      try intercept[IllegalStateException](Snapshots.append(spark, t, docs(3, idFrom = 10)))
      finally { Snapshots.lockWaitMs = prevWait; m.breakLock(t) }
      assert(Snapshots.read(spark, t).count() == 3)
    }
  }
}
