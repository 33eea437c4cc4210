package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{IncrementalAgg, Snapshots}

/** Battery entries for the manifest-log snapshot layer
  * ([[graft.operators.Snapshots]]) and the diff-driven materialized
  * aggregates ([[graft.operators.IncrementalAgg]]): every entry drives the
  * REAL commit protocol on scratch disk (create → append/delete/compact →
  * read) and reduces to integers a DuckDB oracle recomputes directly from
  * `documents` — time travel, CDC diffs, copy-on-write skipping, and
  * manifest-stat file pruning all land in the driver's hash gate.
  */
object SnapshotQueries {

  private def fresh(d: String, name: String): String = QueryScratch.fresh(d, name)

  val all: Map[String, Q] = Map(

    // Time travel + copy-on-write delete. v1 = even docs, v2 = +odd docs,
    // v3 = deleteWhere(n_chars < 150). Pins the row count at v1 and v2
    // (v2 read AFTER the delete — immutable-file isolation means time
    // travel still sees the deleted rows) and the post-delete aggregate.
    // COW file-skipping structure is pinned by SnapshotSpec; here the
    // oracle pins the version semantics.
    "k_snapshot_time_travel" -> Q(
      (s, d) => {
        val t = fresh(d, "snap_tbl")
        Snapshots.create(s, t)
        val docs = documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
        Snapshots.append(s, t, docs.filter(col("doc_id") % 2 === 0))
        Snapshots.append(s, t, docs.filter(col("doc_id") % 2 === 1))
        val (_, _, _) = Snapshots.deleteWhere(s, t, col("n_chars") < 150)
        val nV1 = Snapshots.read(s, t, Some(1L)).count()
        val nV2 = Snapshots.read(s, t, Some(2L)).count()
        val cur = Snapshots.read(s, t)
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars")).head()
        import s.implicits._
        Seq((nV1, nV2, cur.getLong(0), cur.getLong(1)))
          .toDF("n_v1", "n_v2", "n_after_delete", "sum_chars_after_delete")
      },
      Some("""SELECT CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_v1,
             |       CAST(count(*) AS BIGINT) AS n_v2,
             |       CAST(count(CASE WHEN n_chars >= 150 THEN 1 END) AS BIGINT) AS n_after_delete,
             |       CAST(sum(CASE WHEN n_chars >= 150 THEN n_chars END) AS BIGINT) AS sum_chars_after_delete
             |FROM documents""".stripMargin),
      Seq("K1", "K5", "S4")
    ),

    // Incremental (CDC) read: the diff between two snapshot versions is
    // read from EXACTLY the files the second commit added (a manifest
    // query), grouped per-lang - the incremental-consumer contract that
    // lets a downstream job keep up with a 100 TB table by reading deltas.
    "k_snapshot_incremental" -> Q(
      (s, d) => {
        val t = fresh(d, "snap_cdc")
        Snapshots.create(s, t)
        val docs = documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
        Snapshots.append(s, t, docs.filter(col("doc_id") % 2 === 0))
        Snapshots.append(s, t, docs.filter(col("doc_id") % 2 === 1))
        Snapshots.diffAppended(s, t, 1L, 2L).get
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      },
      Some("""SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents WHERE doc_id % 2 = 1 GROUP BY lang""".stripMargin),
      Seq("S1", "K1")
    ),

    // Manifest-side file pruning: 8 appends of contiguous doc_id stripes =
    // 8 file groups whose manifest min/max boxes tile the id space; a range
    // predicate must plan to exactly the intersecting stripes WITHOUT
    // opening a parquet footer. The oracle replays the skip decision from
    // the stripes' true min/max (file stats ARE the data min/max), plus the
    // exact filtered aggregate - so both the plan and the answer hash-pin.
    "k_snapshot_prune" -> Q(
      (s, d) => {
        val t = fresh(d, "snap_prune")
        Snapshots.create(s, t)
        val docs = documents(s, d).select(col("doc_id"), col("n_chars"))
        val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
        val w = (n + 7) / 8
        (0L until 8L).foreach { i =>
          Snapshots.append(s, t,
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1))
        }
        val lo = 2 * w + w / 2
        val hi = 5 * w + w / 3
        val plan = Snapshots.scanPlan(s, t, col("doc_id") >= lo && col("doc_id") <= hi)
        plan.df.agg(
          count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("sum_chars"),
          lit(plan.filesTotal).as("files_total"),
          lit(plan.filesScanned).as("files_scanned"))
      },
      Some("""WITH p AS (
             |  SELECT CAST(ceil((max(doc_id)+1) / 8.0) AS BIGINT) AS w FROM documents
             |), b AS (
             |  SELECT 2*w + w//2 AS lo, 5*w + w//3 AS hi, w FROM p
             |), s AS (
             |  SELECT doc_id // (SELECT w FROM p) AS fid, min(doc_id) AS mn, max(doc_id) AS mx
             |  FROM documents GROUP BY fid
             |)
             |SELECT (SELECT count(*) FROM documents, b WHERE doc_id BETWEEN lo AND hi) AS n_rows,
             |       (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents, b
             |        WHERE doc_id BETWEEN lo AND hi) AS sum_chars,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s) AS files_total,
             |       (SELECT CAST(count(*) AS BIGINT) FROM s, b
             |        WHERE mx >= lo AND mn <= hi) AS files_scanned""".stripMargin),
      Seq("F6", "K1")
    ),

    // Snapshot-aware compaction + retention: many small append groups fold
    // to one file as a REPLACE commit (history preserved until expire);
    // expire(keepLast=1) then reclaims every pre-compaction file and
    // manifest while the current version answers identically. files_after
    // and data_files_on_disk are structural pins; rows/sum prove identity.
    "k_snapshot_compact_expire" -> Q(
      (s, d) => {
        val t = fresh(d, "snap_gc")
        Snapshots.create(s, t)
        val docs = documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        (0 until 4).foreach { i =>
          Snapshots.append(s, t, docs.filter(col("doc_id") % 4 === i).coalesce(1))
        }
        Snapshots.compact(s, t, targetRecordsPerFile = 10000000L)
        val (droppedManifests, _) = Snapshots.expire(s, t, keepLast = 1)
        val filesAfter = graft.operators.Lake.dataFileCount(s, s"$t/data")
        Snapshots.read(s, t).agg(
          count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("sum_chars"),
          lit(filesAfter).as("data_files_on_disk"),
          lit(droppedManifests).as("manifests_dropped"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |       CAST(1 AS BIGINT) AS data_files_on_disk,
             |       CAST(5 AS BIGINT) AS manifests_dropped
             |FROM documents""".stripMargin),
      Seq("K1", "K5")
    ),

    // Incrementally-maintained materialized aggregate: rollup refreshed
    // from the snapshot diff (merge of stored partials with the delta's)
    // must equal the from-scratch group-by - the incremental
    // view-maintenance law, hash-pinned per source together with the
    // refresh modes actually taken.
    "k_incremental_agg" -> Q(
      (s, d) => {
        val t = fresh(d, "snap_agg_tbl")
        val a = fresh(d, "snap_agg_mat")
        Snapshots.create(s, t)
        val docs = documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.append(s, t, docs.filter(col("doc_id") % 3 === 0))
        val r1 = IncrementalAgg.refresh(s, t, a, Seq("source"), Seq("n_chars"))
        Snapshots.append(s, t, docs.filter(col("doc_id") % 3 =!= 0))
        val r2 = IncrementalAgg.refresh(s, t, a, Seq("source"), Seq("n_chars"))
        IncrementalAgg.read(s, a)
          .select(col("source"), col("n"), col("sum_n_chars"),
            lit(r1.mode).as("first_mode"), lit(r2.mode).as("second_mode"))
      },
      Some("""SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
             |       'full' AS first_mode, 'incremental' AS second_mode
             |FROM documents GROUP BY source""".stripMargin),
      Seq("A1", "A2", "K1")
    )
  )
}
