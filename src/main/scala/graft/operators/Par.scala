package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for fan-out producers over few-split inputs (guide
  * §2.5: one unsplittable input split → repartition right after the read).
  *
  * An input whose whole estimated size fits in ONE scan split plans as a
  * single task, and every narrow operation Spark fuses onto that scan — an
  * n-gram explode, a line split, a MinHash signature, a broadcast-join +
  * scoring pipeline — runs single-threaded regardless of cluster width. The
  * per-row work of these producers is orders of magnitude heavier than the
  * row itself (hundreds of gram hashes per document), so the scan's byte
  * count says nothing about the stage's compute.
  *
  * `spreadSmall` round-robins such inputs across the default parallelism
  * BEFORE the fan-out. Both triggers derive from the Catalyst size estimate
  * vs the session's split size — never from a local core count: at scale a
  * many-split input never satisfies the bound, so no corpus-sized exchange
  * can be added, and when the guard does fire the exchange it adds moves
  * LESS than one split of data by the same bound that fired.
  */
object Par {

  /** True when the plan's estimated output fits in ONE scan split — the
    * regime where a fused file-scan pipeline carries no parallelism of its
    * own. Only meaningful for narrow all-file plans; [[spreadSmall]] checks
    * the plan shape first.
    */
  def fitsOneSplit(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.defaultParallelism > 1 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        df.sparkSession.sessionState.conf.filesMaxPartitionBytes

  /** Per-spread-task input-byte target. The round-14 spread repartitioned to
    * `defaultParallelism` unconditionally, and the driver's scaling run
    * showed that overshooting is not free: a few hundred KB of input spread
    * 32 ways pays 32 tasks of exchange+schedule overhead where ~8 carry the
    * same CPU (the 8-core battery beat the 32-core one). Width therefore
    * derives from the WORK ESTIMATE (input bytes / target), not the core
    * count — scale-adaptive in both directions: a bigger input widens toward
    * the cluster cap, a tiny one stays narrow. 64 KB of input text expands
    * ~100× through the gram/signature fan-outs these call sites guard, so a
    * task is a few MB of generated work — env-tunable for other deployments.
    */
  def spreadTargetBytes: Long =
    sys.env.getOrElse("SPARK_GRAFT_SPREAD_TARGET_BYTES", "65536").toLong

  /** Work-capped spread width for an estimated `bytes` of input:
    * one task per [[spreadTargetBytes]] (callers with heavier per-byte
    * fan-out pass a smaller `targetBytes`), at least 2 (the point of the
    * spread is escaping one task), at most the cluster's parallelism.
    */
  private def widthFor(df: DataFrame, targetBytes: Long): Int = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val t = math.max(1L, targetBytes)
    val w = (bytes + t - 1) / t // BigInt: Catalyst size estimates can exceed Long
    math.max(2, w.min(BigInt(par)).toInt)
  }

  def spreadSmall(df: DataFrame): DataFrame = spreadSmall(df, spreadTargetBytes)

  def spreadSmall(df: DataFrame, targetBytes: Long): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (par <= 1) return df
    val (wide, rddParts, allFileLeaves) =
      org.apache.spark.sql.graft.CheckpointBridge.spreadFacts(df)
    // a wide plan exchanges on its own — its post-shuffle parallelism is
    // AQE's call, and a spread on top is a pure extra exchange (measured:
    // the first version of this guard fired on every checkpoint-backed
    // pretrain stage and cost the composed entry +4 s)
    if (wide) df
    // RDD-backed sources (localCheckpoint results): the partition count is
    // exact and free — spread only a genuinely under-parallel source
    else if (rddParts.nonEmpty) {
      if (!fitsOneSplit(df)) df
      else {
        val w = widthFor(df, targetBytes)
        if (rddParts.sum >= w) df else df.repartition(w)
      }
    }
    // file-backed narrow chains: the size-estimate-vs-split bound
    else if (allFileLeaves && fitsOneSplit(df)) df.repartition(widthFor(df, targetBytes))
    // local relations and other driver-side leaves: nothing to spread
    else df
  }
}
