package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min frequency sketches built per shard and merged at report time —
  * the fourth mergeable-sketch discipline (after HLL distinct-count,
  * frequent-items top-k, and KLL quantiles): point-frequency telemetry at
  * 100 TB is per-shard fixed-size counter grids + a report-time merge,
  * never a global group-by of the raw keys.
  *
  * Two laws make CMS the strictest of the sketch family:
  *  - merging is EXACT: counters are sums of per-item increments, so any
  *    sharding of the data merges to bit-identical counters (commutative,
  *    associative integer addition — no promotion like HLL's sparse→dense);
  *  - the error is ONE-SIDED: an estimate is never below the true count,
  *    and exceeds it by at most ε·N with probability 1−δ.
  * Determinism: a fixed seed fixes the hash family, so estimates are
  * reproducible run to run (the battery gate depends on this).
  */
object CountMin {

  /** One CMS per shard over `valueCol` (stringified), returned as
    * serialized fixed-size blobs — the only thing that ever leaves a
    * shard. `(depth × width)` longs per shard regardless of row count.
    */
  def shardSketches(
      df: DataFrame, valueCol: String, shardCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): Dataset[(Int, Array[Byte])] = {
    import df.sparkSession.implicits._
    df.select(col(shardCol).cast("int"), col(valueCol).cast("string"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val cms = CountMinSketch.create(eps, confidence, seed)
        rows.foreach(r => cms.add(r._2))
        val bos = new ByteArrayOutputStream()
        cms.writeTo(bos)
        (shard, bos.toByteArray)
      }
  }

  /** Fold serialized shard sketches into one sketch (driver-side: the
    * input is `nShards` fixed-size blobs, never corpus data).
    */
  def merge(blobs: Seq[Array[Byte]]): CountMinSketch = {
    require(blobs.nonEmpty, "merge of zero sketches")
    val first = CountMinSketch.readFrom(new ByteArrayInputStream(blobs.head))
    blobs.tail.foldLeft(first) { (acc, b) =>
      acc.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(b)))
    }
  }

  /** Collect-and-merge convenience for report time. */
  def mergedSketch(sketches: Dataset[(Int, Array[Byte])]): CountMinSketch =
    merge(sketches.collect().toSeq.sortBy(_._1).map(_._2))

  /** One sketch of a whole DataFrame: per-partition partials, driver merge
    * (the partials are fixed-size; the rows never leave their partitions).
    */
  def sketchOf(
      df: DataFrame, valueCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    if (df.isEmpty) CountMinSketch.create(eps, confidence, seed)
    else mergedSketch(shardSketches(
      df.withColumn("_p", org.apache.spark.sql.functions.spark_partition_id()),
      valueCol, "_p", eps, confidence, seed))

  private def fs(df: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkContext.hadoopConfiguration)

  /** Persist one microbatch's sketch as `batch-<id>.cms` — staged write +
    * checked rename, and KEYED BY BATCH ID so a replayed batch overwrites
    * its own segment instead of double-counting (CMS addition is not
    * idempotent, so the exactly-once guarantee lives in the layout — the
    * same segment discipline as the BM25/MinHash index appends).
    */
  def writeBatchSegment(
      spark: org.apache.spark.sql.SparkSession, df: DataFrame, valueCol: String,
      path: String, batchId: Long,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): Unit = {
    val cms = sketchOf(df, valueCol, eps, confidence, seed)
    val bos = new ByteArrayOutputStream()
    cms.writeTo(bos)
    val hfs = fs(spark, path)
    hfs.mkdirs(new org.apache.hadoop.fs.Path(path))
    val tmp = new org.apache.hadoop.fs.Path(path, s".batch-$batchId.tmp")
    val dst = new org.apache.hadoop.fs.Path(path, s"batch-$batchId.cms")
    val out = hfs.create(tmp, true)
    try out.write(bos.toByteArray) finally out.close()
    if (hfs.exists(dst)) hfs.delete(dst, false)
    require(hfs.rename(tmp, dst), s"rename $tmp -> $dst failed; segment intact at $tmp")
  }

  /** Merge every persisted batch segment — report-time fold of fixed-size
    * blobs, never row data.
    */
  def readMerged(spark: org.apache.spark.sql.SparkSession, path: String): CountMinSketch = {
    val hfs = fs(spark, path)
    val segs = hfs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.endsWith(".cms")).sortBy(_.getPath.getName)
    require(segs.nonEmpty, s"no sketch segments under $path")
    segs.map { s =>
      val in = hfs.open(s.getPath)
      try CountMinSketch.readFrom(in) finally in.close()
    }.reduce { (a, b) => a.mergeInPlace(b); a }
  }
}
