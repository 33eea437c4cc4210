package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Try

/** S3/K4: the incremental-processing ledger — one row per document
  * (reference `state.py:1-97`: `processed`/`failed` dicts, corrupt→empty
  * fallback at 43-59, atomic tmp+rename save at 61-75).
  *
  * The ledger is tiny relative to the corpus (no content, one row per doc),
  * so it is always broadcastable into the J1 anti-join. The reference saves
  * after every file; Spark's unit of durability is the job/microbatch, so we
  * commit once per batch after the store writes succeed — preserving the
  * observable invariant (state ⟺ store consistency, failed docs retried,
  * SURVEY §7 "atomicity semantics shift").
  */
final class PipelineState(val path: String) extends Serializable {

  import PipelineState._

  private def fs(spark: SparkSession) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Load the ledger; a missing or corrupted state yields an empty ledger
    * (reference `state.py:58-59`).
    *
    * The ledger is materialized eagerly (it is small by construction): a lazy
    * scan would be cache-keyed by path and could serve stale rows after the
    * file is rewritten mid-session, and eager reading also surfaces
    * corruption here, where the fallback applies.
    */
  def load(spark: SparkSession): DataFrame =
    if (!fs(spark).exists(new Path(path))) empty(spark)
    else Try {
      val rows = spark.read.schema(stateSchema).json(path)
        .filter(col("docId").isNotNull).collect().toSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows), stateSchema)
    }.getOrElse(empty(spark))

  /** Atomic commit: write to `<path>.tmp`, then swap (reference `state.py:72-75`). */
  def save(spark: SparkSession, state: DataFrame): Unit = {
    val f = fs(spark)
    val tmp = new Path(path + ".tmp")
    val dst = new Path(path)
    state.select(stateSchema.fieldNames.map(col): _*)
      .coalesce(1) // the ledger is small by construction; single-file like the reference
      .write.mode(SaveMode.Overwrite).json(tmp.toString)
    if (f.exists(dst)) f.delete(dst, true)
    f.rename(tmp, dst)
  }

  /** Mark docs processed: upsert by docId with status=processed, clearing any
    * prior failure (reference `state.py:83-89`).
    */
  def markProcessed(spark: SparkSession, state: DataFrame, done: DataFrame): DataFrame =
    overlayByDoc(
      state,
      done.select(
        col("docId"), col("hash"),
        lit("processed").as("status"), isoNow().as("at"),
        lit(null).cast("string").as("error")
      )
    )

  /** Mark docs failed — failures never enter the processed side, so J1
    * retries them (reference `state.py:91-97`, J4).
    */
  def markFailed(spark: SparkSession, state: DataFrame, failed: DataFrame): DataFrame =
    overlayByDoc(
      state,
      failed.select(
        col("docId"), col("hash"),
        lit("failed").as("status"), isoNow().as("at"),
        coalesce(col("error"), lit("unknown")).as("error")
      )
    )

  /** Remove docs from the ledger entirely (tombstone cleanup,
    * reference `state.py:99-102`).
    */
  def remove(state: DataFrame, docIds: DataFrame): DataFrame =
    state.join(broadcast(docIds.select("docId")), Seq("docId"), "left_anti")

  /** A2: `{processed: n, failed: n}` (reference `state.py:104-109`). */
  def stats(state: DataFrame): DataFrame =
    state.groupBy(col("status")).agg(count(lit(1)).as("n"))

  private def overlayByDoc(state: DataFrame, updates: DataFrame): DataFrame =
    state.join(updates.select("docId"), Seq("docId"), "left_anti")
      .unionByName(updates)
}

object PipelineState {

  val stateSchema: StructType = StructType(Seq(
    StructField("docId", StringType),
    StructField("hash", StringType),
    StructField("status", StringType),
    StructField("at", StringType),
    StructField("error", StringType)
  ))

  /** C14: ISO-UTC second-resolution timestamp (reference `state.py:86-88`). */
  def isoNow(): org.apache.spark.sql.Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'")

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
}
