package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * The battery maps every implemented operator from SURVEY.md §2 (and the
  * training-data extensions) to a named query over `/root/testdata` tables;
  * entries with a DuckDB oracle participate in the driver's hash-compare
  * correctness gate, the rest get rows>0 checks and are pinned by ScalaTest.
  */
object SparkEntry {

  val battery: Map[String, Q] =
    RelationalQueries.all ++ TextQueries.all ++ EventQueries.all ++
      VectorQueries.all ++ PipelineQueries.all ++ SnapshotQueries.all ++ PretrainQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    battery("q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    battery.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    battery.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
