package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.operators.Snapshots

/** Structured Streaming SOURCE over a snapshot table — the read-side twin
  * of the exactly-once snapshot sinks ([[graft.streaming.StreamingPipeline
  * .snapshotWriter]] family): a table a pipeline writes to becomes a live
  * input for the next pipeline, with Spark's checkpointing carrying the
  * consumer position instead of hand-rolled `readRowChangesSince` polling.
  *
  * {{{
  *   spark.readStream.format("graft-snapshot")
  *     .option("path", table).option("mode", "changelog").load()
  * }}}
  *
  * Offsets ARE table versions (a `LongOffset` per commit), so a microbatch
  * is a COMMIT RANGE `(fromV, toV]` — replayable bit-for-bit from the
  * manifest log after any restart, which is what makes the source
  * exactly-once-composable: Spark's offset log pins the range, the
  * manifest log pins the range's content. Planning reads manifests only.
  *
  * Modes:
  *  - `append` (default): each batch is the rows APPENDED in the range,
  *    read from exactly the delta's files ([[Snapshots.diffAppended]] — a
  *    manifest query, nothing else scanned). A non-append commit in range
  *    fails the stream loudly (the Delta discipline: a streaming consumer
  *    of a mutating table must opt into change semantics).
  *  - `changelog`: each batch is the row-level change feed
  *    ([[Snapshots.rowChanges]] — `_change_type` insert|delete +
  *    `_commit_version`), exact across MOR/COW deletes, merges, and
  *    overwrites, with compactions emitting nothing; cost ∝ churn. The
  *    first batch is the starting snapshot tagged as inserts (set
  *    `startingVersion` to begin at a later cursor instead).
  *
  * Schema is pinned at stream start from the table's recorded schema;
  * later evolution null-fills (the fixed-schema contract a running query
  * plan requires). Citation: reference behavior `lovdata_pipeline/
  * orchestration/pipeline_orchestrator.py:214-278` (the incremental sync
  * loop) — this is its push-based face.
  */
object SnapshotStream {
  val FORMAT = "graft-snapshot"

  /** Convenience: `spark.readStream` over a snapshot table.
    * `maxVersionsPerTrigger` bounds a batch's commit range — without it a
    * consumer restarting after a long gap replays its whole backlog as ONE
    * batch (the admission-control knob Delta spells `maxFilesPerTrigger`).
    * Under a continuous trigger every MICROBATCH is capped; under
    * `Trigger.AvailableNow` Spark's v1 wrapper freezes the availability
    * target once per run, so each RUN advances by at most the budget
    * (drain a backlog with repeated runs, each bounded).
    */
  def reader(
      spark: SparkSession, table: String, mode: String = "append",
      startingVersion: Option[Long] = None,
      maxVersionsPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format(classOf[SnapshotStreamProvider].getName)
      .option("path", table).option("mode", mode)
    startingVersion.foreach(v => r.option("startingVersion", v.toString))
    maxVersionsPerTrigger.foreach(k => r.option("maxVersionsPerTrigger", k.toString))
    r.load()
  }

  private[sources] def changelogSchema(base: StructType): StructType =
    base.add("_change_type", StringType).add("_commit_version", LongType)
}

class SnapshotStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = SnapshotStream.FORMAT

  private def baseSchema(
      spark: SparkSession, given: Option[StructType], table: String): StructType =
    given.orElse(Snapshots.tableSchema(spark, table)).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot table $table records no schema yet (empty pre-append table) — " +
          "append once first or pass .schema(...) explicitly"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val table = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot source needs option(\"path\", table)"))
    val base = baseSchema(sqlContext.sparkSession, schema, table)
    val full = parameters.getOrElse("mode", "append") match {
      case "changelog" => SnapshotStream.changelogSchema(base)
      case _ => base
    }
    (SnapshotStream.FORMAT, full)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val table = parameters("path")
    val mode = parameters.getOrElse("mode", "append")
    require(mode == "append" || mode == "changelog",
      s"graft-snapshot mode must be append|changelog, got $mode")
    val base = baseSchema(sqlContext.sparkSession, schema, table)
    new SnapshotStreamSource(sqlContext.sparkSession, table, mode,
      parameters.get("startingVersion").map(_.toLong), base,
      parameters.get("maxVersionsPerTrigger").map(_.toInt))
  }
}

/** One consumer of one snapshot table; see [[SnapshotStream]]. */
class SnapshotStreamSource(
    spark: SparkSession,
    table: String,
    mode: String,
    startingVersion: Option[Long],
    baseSchema: StructType,
    maxVersionsPerTrigger: Option[Int] = None) extends Source {

  override val schema: StructType =
    if (mode == "changelog") SnapshotStream.changelogSchema(baseSchema) else baseSchema

  private def offV(o: Offset): Long = o.json.trim.toLong

  /** Last batch end handed out — the admission-control base. Re-primed
    * from the engine's first getBatch after a restart (Spark replays the
    * checkpointed range before asking for new offsets), so the cap never
    * re-admits committed versions.
    */
  @volatile private var lastEnd: Option[Long] = None

  override def getOffset: Option[Offset] =
    Snapshots.currentVersion(table).map { cur =>
      val capped = (maxVersionsPerTrigger, lastEnd.orElse(startingVersion)) match {
        case (Some(k), Some(base)) => math.min(cur, base + k)
        // first-ever batch is the starting snapshot — indivisible; the
        // cap applies from the next trigger on
        case _ => cur
      }
      LongOffset(capped)
    }

  /** Align a batch to the pinned stream schema: missing (pre-evolution or
    * post-evolution) columns null-fill, extras drop, exactly like the
    * snapshot read path's own conform.
    */
  private def conform(df: DataFrame, to: StructType): DataFrame =
    df.select(to.fields.toIndexedSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = offV(end)
    lastEnd = Some(toV)
    val batch: DataFrame = (start.map(offV).orElse(startingVersion), mode) match {
      case (None, "changelog") =>
        // first batch: the starting snapshot AS INSERTS at its version —
        // replaying it plus every later change reproduces the table
        Snapshots.read(spark, table, Some(toV))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(toV))
      case (None, _) =>
        Snapshots.read(spark, table, Some(toV))
      case (Some(f), "changelog") =>
        Snapshots.rowChanges(spark, table, f, toV)
      case (Some(f), _) =>
        Snapshots.diffAppended(spark, table, f, toV).getOrElse(
          throw new IllegalStateException(
            s"snapshot stream over $table hit a non-append commit in ($f, $toV] — " +
              "append mode cannot represent deletes/merges; restream with " +
              "option(\"mode\", \"changelog\")"))
    }
    org.apache.spark.sql.graft.StreamingBridge.asStreamingBatch(
      conform(batch, schema), schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$table, $mode]"
}
