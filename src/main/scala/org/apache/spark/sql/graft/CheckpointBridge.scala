package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Access to the RDD a `Dataset.localCheckpoint` pinned, for DETERMINISTIC
  * release. `Dataset.localCheckpoint` (unlike `df.rdd.localCheckpoint()`)
  * preserves the physical plan's outputPartitioning through the cut — which
  * is what lets an iterative operator prepare a hash-partitioned state table
  * ONCE and join against it shuffle-free every round — but it hides the
  * persisted RDD inside `LogicalRDD`, so without this bridge the storage
  * can only be reclaimed by the context cleaner after a GC happens to
  * collect the Dataset. Lives under `org.apache.spark.sql` only because
  * `LogicalRDD` is `private[sql]`; reading a case-class field is the
  * stable, documented surface.
  */
object CheckpointBridge {
  /** The checkpointed internal RDD behind a `Dataset.localCheckpoint`
    * result (None for any other plan shape).
    */
  def internalRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
