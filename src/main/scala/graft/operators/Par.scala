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

  def spreadSmall(df: DataFrame): DataFrame = {
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
    else if (rddParts.nonEmpty)
      if (rddParts.sum >= par || !fitsOneSplit(df)) df else df.repartition(par)
    // file-backed narrow chains: the size-estimate-vs-split bound
    else if (allFileLeaves && fitsOneSplit(df)) df.repartition(par)
    // local relations and other driver-side leaves: nothing to spread
    else df
  }
}
