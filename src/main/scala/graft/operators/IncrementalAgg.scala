package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files => JFiles, Paths => JPaths, StandardCopyOption}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates over a [[Snapshots]]
  * table: keyed `count` + `sum` rollups that refresh from the SNAPSHOT DIFF
  * instead of rescanning the corpus.
  *
  * At 100 TB the difference is the whole game: a nightly "rows and bytes
  * per source" rollup is a full-table scan (hours, petabyte-read) when
  * recomputed, but count/sum are mergeable, so folding the day's appended
  * files into the stored per-key partials costs one scan of the DELTA plus
  * one shuffle of |keys| + |delta keys| rows — work proportional to what
  * changed, not to what exists. This is the standard incremental
  * view-maintenance result for distributive aggregates, driven here by the
  * manifest's `added_v` file lineage ([[Snapshots.diffAppended]]).
  *
  * Correctness contract: the cheap delta merge applies while every commit
  * since the last refresh is an APPEND (pure inserts). A range containing
  * deletes/merges/compactions switches to CHANGELOG maintenance — signed
  * partials over [[Snapshots.rowChanges]] (inserts +1/+value, deletes
  * -1/-value; count/sum are abelian, so this is exact), cost ∝ the
  * commits' churn. Only an OVERWRITE falls back to a full recompute (its
  * churn is the whole table — the rescan is cheaper than the diff).
  * Either way `refresh` is idempotent (a second call is a no-op) and the
  * refreshed state always equals the from-scratch aggregate of the table
  * version it records (`SnapshotSpec` pins the law).
  *
  * Layout under `aggPath`: versioned state dirs (`state-v<N>/` parquet) and
  * an atomically-swapped `_meta` pointer naming the table version the state
  * reflects — the [[Snapshots]] pointer discipline, so a crash mid-refresh
  * leaves the previous state intact and readable.
  */
object IncrementalAgg {

  final case class Refresh(tableVersion: Long, mode: String)

  private def metaPath(aggPath: String) = s"$aggPath/_meta"
  private def stateDir(aggPath: String, v: Long) = f"$aggPath/state-v$v%08d"

  /** The table version the stored aggregate reflects, if any. */
  def refreshedVersion(aggPath: String): Option[Long] = {
    val p = JPaths.get(metaPath(aggPath))
    if (JFiles.exists(p))
      Some(new String(JFiles.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  private def swapMeta(aggPath: String, v: Long): Unit = {
    JFiles.createDirectories(JPaths.get(aggPath))
    val tmp = JPaths.get(s"${metaPath(aggPath)}.swap-$v")
    JFiles.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    JFiles.move(tmp, JPaths.get(metaPath(aggPath)),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Read the materialized aggregate: `keys..., n, sum_<c>...`. */
  def read(spark: SparkSession, aggPath: String): DataFrame = {
    val v = refreshedVersion(aggPath).getOrElse(
      throw new IllegalArgumentException(s"no materialized aggregate at $aggPath"))
    spark.read.parquet(stateDir(aggPath, v))
  }

  /** Per-key partials of a batch: `n` + `sum_<c>` for each sum column. */
  private def partials(df: DataFrame, keys: Seq[String], sums: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sums.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Merge two partial states (same schema) — sums of sums, counts of counts. */
  private def merge(a: DataFrame, b: DataFrame, keys: Seq[String], sums: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)

  /** Signed per-key partials of a changelog batch: inserts count +1 and
    * add their values, deletes count -1 and subtract — count/sum are
    * abelian-group aggregates, so delete maintenance is exact.
    */
  private def signedPartials(
      ch: DataFrame, keys: Seq[String], sums: Seq[String]): DataFrame = {
    val ins = col("_change_type") === "insert"
    ch.groupBy(keys.map(col): _*).agg(
      sum(when(ins, 1L).otherwise(-1L)).as("n"),
      sums.map(c => sum(when(ins, col(c)).otherwise(-col(c))).as(s"sum_$c")): _*)
  }

  /** Bring the materialized aggregate up to the table's current version.
    * Incremental (delta-only) when every commit since the last refresh is
    * an append; CHANGELOG maintenance (signed partials over
    * [[Snapshots.rowChanges]] — cost ∝ churn) when the range contains
    * deletes/merges/compactions; full recompute only across an overwrite
    * (where the churn diff would cost more than the rescan); no-op when
    * already current.
    */
  def refresh(
      spark: SparkSession,
      tablePath: String,
      aggPath: String,
      keys: Seq[String],
      sums: Seq[String]): Refresh = {
    require(keys.nonEmpty, "at least one key column required")
    val cur = Snapshots.currentVersion(tablePath).getOrElse(
      throw new IllegalArgumentException(s"not a snapshot table: $tablePath"))
    val last = refreshedVersion(aggPath)
    if (last.contains(cur)) return Refresh(cur, "noop")

    val maintainable = Set("create", "append", "delete", "merge", "replace")
    val (state, mode) = last match {
      case Some(from) =>
        Snapshots.diffAppended(spark, tablePath, from, cur) match {
          case Some(delta) if delta.columns.isEmpty =>
            // append commits that contributed zero files — state unchanged,
            // only the recorded version advances
            (read(spark, aggPath), "noop-advance")
          case Some(delta) =>
            (merge(read(spark, aggPath), partials(delta, keys, sums), keys, sums),
              "incremental")
          case None if ((from + 1) to cur).forall(v =>
              maintainable(Snapshots.commitInfo(spark, tablePath, v).op)) =>
            val ch = Snapshots.rowChanges(spark, tablePath, from, cur)
            // keys whose rows all died fold to n == 0 and drop, matching
            // the from-scratch group-by exactly
            (merge(read(spark, aggPath), signedPartials(ch, keys, sums), keys, sums)
              .filter(col("n") =!= 0L), "changelog")
          case None =>
            (partials(Snapshots.read(spark, tablePath), keys, sums), "full")
        }
      case None =>
        (partials(Snapshots.read(spark, tablePath), keys, sums), "full")
    }

    val dir = stateDir(aggPath, cur)
    state.write.mode(SaveMode.Overwrite).parquet(dir)
    val old = refreshedVersion(aggPath)
    swapMeta(aggPath, cur)
    // reclaim superseded state dirs (crash here is harmless: orphans are
    // ignored by read and re-reclaimed on the next refresh)
    val fs = new Path(aggPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(aggPath)).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("state-v") &&
        name != f"state-v$cur%08d" && old.exists(o => name == f"state-v$o%08d"))
        fs.delete(st.getPath, true): Unit
    }
    Refresh(cur, mode)
  }
}
