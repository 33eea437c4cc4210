package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated joins
  * and aggregations on the bucket key run shuffle-free forever after — the
  * classic 100 TB co-location play (pay one shuffle at ingest, amortize over
  * every downstream join).
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets for
    * merge-friendly reads).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Join two tables previously bucketed on the same key with the same
    * bucket count: planner elides both exchanges.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   left: String, right: String, key: String,
                   joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
