package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Identify
import graft.sources.ChunkStore
import graft.state.PipelineState

/** The thin job entry points mirroring the reference CLI (`cli.py`):
  * `lg status`, `lg validate`, `lg migrate` (SURVEY §3.2-3.3, §7 module 9).
  * `lg process` is [[graft.pipeline.Pipeline.run]]; `lg search` (absent from
  * the reference CLI) is [[graft.operators.Similarity]].
  */
object Ops {

  /** `lg status`: ledger + store counts (A2; reference `cli.py:333-347`). */
  final case class Status(processed: Long, failed: Long, storeChunks: Long, storeDocs: Long)

  def status(spark: SparkSession, statePath: String, store: ChunkStore): Status = {
    val state = new PipelineState(statePath).load(spark)
    val byStatus = state.groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Status(
      processed = byStatus.getOrElse("processed", 0L),
      failed = byStatus.getOrElse("failed", 0L),
      storeChunks = store.count(spark),
      storeDocs = store.distinctDocumentIds(spark).count()
    )
  }

  /** `lg validate`: state ⟷ store doc-id consistency (J2/SO1; reference
    * `validation_service.py:43-65`, report truncation L2 `cli.py:455-470`).
    */
  final case class Validation(isConsistent: Boolean, stateOnly: Seq[String], storeOnly: Seq[String])

  def validate(spark: SparkSession, statePath: String, store: ChunkStore, reportLimit: Int = 10): Validation = {
    val stateIds = new PipelineState(statePath).load(spark)
      .filter(col("status") === "processed").select(col("docId"))
    val diff = Identify.validate(stateIds, store.distinctDocumentIds(spark)).cache()
    try {
      def side(s: String): Seq[String] =
        diff.filter(col("side") === s).orderBy(col("docId")).limit(reportLimit)
          .collect().map(_.getString(0)).toSeq
      val stateOnly = side("state_only")
      val storeOnly = side("store_only")
      Validation(stateOnly.isEmpty && storeOnly.isEmpty, stateOnly, storeOnly)
    } finally { diff.unpersist(); () }
  }

  /** `lg migrate`: store → store copy (K5; reference `cli.py:166-329`). */
  def migrate(spark: SparkSession, source: ChunkStore, target: ChunkStore): Long =
    ChunkStore.migrate(spark, source, target)

  /** F5: the file-exists guard — rows whose `path` does not resolve become
    * failure records instead of aborting the run (reference
    * `file_processing_service.py:63-69`). Executed distributed: the existence
    * check runs inside the scan task, not on the driver.
    */
  def withExistsGuard(df: DataFrame, pathCol: String): DataFrame = {
    val exists = udf((p: String) => p != null && new java.io.File(p).exists())
    df.withColumn("_exists", exists(col(pathCol)))
      .withColumn(
        "error",
        when(!col("_exists"), concat(lit("file not found: "), col(pathCol)))
          .otherwise(lit(null).cast("string"))
      )
      .drop("_exists")
  }
}
