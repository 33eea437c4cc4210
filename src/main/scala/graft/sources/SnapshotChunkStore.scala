package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** The keyed chunk store backed by a manifest-log SNAPSHOT TABLE — the
  * same [[KeyedChunkStore]] protocol as the bucket-swap [[ChunkStore]]
  * (reference `domain/vector_store.py:11-63`), re-expressed on the
  * engine's own table format so one discipline serves both keyed stores:
  *
  *  - **upsert = MERGE** ([[Snapshots.merge]]): stats-pruned candidate
  *    dismissal + key-only scan + COW rewrite of exactly the files
  *    holding a matched chunkId — the bucket store's touch-only-your-
  *    buckets economics, now with per-file min/max key stats instead of a
  *    fixed hash-bucket layout, plus optimistic concurrency that REBASES
  *    over disjoint concurrent appends instead of a store-wide lock.
  *  - **delete-by-document = keyed merge-on-read delete**
  *    ([[Snapshots.deleteKeysMor]]): ZERO data files rewritten; matching
  *    positions land in a deletion vector and `maintain()` absorbs them —
  *    where the bucket store rewrites every touched bucket.
  *  - **Free on this backend**: time travel ([[readAt]]), the row-level
  *    changelog, exactly-once txn markers, snapshot-isolated readers, and
  *    [[SnapshotStream]] streaming consumption — none of which the
  *    bucket layout can express.
  *
  * The JSONL-tolerant scan (S4) and reference-shaped file layout remain
  * the bucket store's; migration between the two is
  * [[ChunkStore.migrate]] over the shared trait.
  */
final class SnapshotChunkStore(val path: String) extends KeyedChunkStore {
  import ChunkStore.{chunkCols, emptyChunks}

  override def exists(spark: SparkSession): Boolean =
    Snapshots.currentVersion(path).isDefined

  private def ensure(spark: SparkSession): Unit =
    if (!exists(spark)) Snapshots.create(spark, path)

  /** Key + routing columns get manifest stats; the wide text/embedding
    * columns stay out of the manifest (bounded metadata at any scale).
    */
  private val statsCols =
    Seq("chunkId", "documentId", "datasetName", "tokenCount", "chunkIndex")

  override def read(spark: SparkSession): DataFrame =
    if (!exists(spark)) emptyChunks(spark)
    else {
      val df = Snapshots.read(spark, path)
      if (df.columns.isEmpty) emptyChunks(spark) else df.select(chunkCols.map(col): _*)
    }

  /** Time travel over the chunk store — a version's exact contents. */
  def readAt(spark: SparkSession, version: Long): DataFrame =
    Snapshots.read(spark, path, Some(version)).select(chunkCols.map(col): _*)

  override def upsert(spark: SparkSession, chunks: DataFrame): Unit = {
    ensure(spark)
    // MERGE requires unique source keys; resolve within-batch duplicates
    // exactly like Overlay's tie-break (chunkIndex descending)
    val w = Window.partitionBy(col("chunkId")).orderBy(col("chunkIndex").desc)
    val deduped = chunks.select(chunkCols.map(col): _*)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    Snapshots.merge(spark, path, deduped, Seq("chunkId"), statsCols): Unit
  }

  override def deleteByDocuments(spark: SparkSession, docs: DataFrame): Long = {
    if (!exists(spark)) return 0L
    val keys = docs.select(col("docId").as("documentId")).distinct()
    Snapshots.deleteKeysMor(spark, path, keys, Seq("documentId")).rowsDeleted
  }

  /** Absorb deletion-vector debt + small-file debt, expire old versions —
    * the nightly call a long-lived store wants ([[Snapshots.maintain]]).
    */
  def maintain(spark: SparkSession, keepLast: Int = 7): (Long, Long, Long) =
    Snapshots.maintain(spark, path, keepLast = keepLast)
}
