package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-lake file maintenance. Streaming appends, per-microbatch index
  * segments, and partitioned upserts all accumulate SMALL FILES — and at
  * 100 TB the per-file open/footer cost (plus NameNode/object-store
  * listing) dominates scans long before data volume does. Compaction
  * rewrites a table's data into ~target-sized files per partition without
  * changing a single row; it is the lake-side twin of the BM25/signature
  * index compactions (`TextSearch.compactIndex`,
  * `Dedup.compactSignatureIndex`) and shares their staged-write +
  * checked-rename swap discipline.
  */
object Lake {

  final case class CompactStats(filesBefore: Long, filesAfter: Long, rows: Long)

  private def hadoopFs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Count data files under `path` (recursively; `_`-prefixed metadata and
    * hidden files excluded — the same convention Spark's own file index
    * uses).
    */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val fs = hadoopFs(spark, path)
    val it = fs.listFiles(new Path(path), true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Compact a (possibly Hive-partitioned) parquet directory to
    * ~`targetRecordsPerFile` rows per file, preserving the partition
    * layout and every row bit-for-bit.
    *
    * Scale shape: one scan + one shuffle keyed by the partition columns
    * (AQE coalesces many small partition values into few write tasks;
    * `maxRecordsPerFile` re-splits the oversized ones), then an atomic
    * staged swap — readers see the old layout until the rename, and a
    * crash before the swap leaves the table untouched with the compacted
    * copy intact in the staging dir. Row-group locality within a file
    * follows `sortCols` when given (e.g. a time column), which is what
    * makes min/max row-group pruning effective after compaction.
    */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String] = Nil,
      targetRecordsPerFile: Long = 1000000L,
      sortCols: Seq[String] = Nil
  ): CompactStats = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val before = dataFileCount(spark, path)
    val df = spark.read.parquet(path)
    val rows = df.count()
    val tmp = path + ".compact-tmp"
    val shuffled =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else {
        val nFiles = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile)
        df.repartition(nFiles.toInt)
      }
    val sorted =
      if (sortCols.nonEmpty)
        shuffled.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else shuffled
    val writer = sorted.write
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp)
    // verify the staged copy BEFORE touching the live layout: a lossy
    // compaction must never swap in
    val staged = spark.read.parquet(tmp).count()
    require(staged == rows,
      s"staged compaction has $staged rows, source has $rows — aborting swap, $path untouched")
    val fs = hadoopFs(spark, path)
    fs.delete(new Path(path), true)
    require(fs.rename(new Path(tmp), new Path(path)),
      s"rename $tmp -> $path failed after the old layout was deleted; " +
        s"the compacted table is intact at $tmp — move it into place manually")
    CompactStats(before, dataFileCount(spark, path), rows)
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * bucketized dimensions — bit `i` of `x` lands at position `2i+1`, bit
    * `i` of `y` at `2i`. Rows close in z-key are close in BOTH dimensions,
    * so clustering a table by z-key gives every file a tight min/max box
    * in each dimension and a two-dimensional predicate prunes files the
    * way a one-dimensional sort only manages for its leading column —
    * the Delta/Iceberg `OPTIMIZE ZORDER BY` layout discipline. Static
    * shifts only: the whole key stays inside whole-stage codegen.
    */
  def zkey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
    }

  /** Driver twin of [[zkey]] — same bit placement. */
  def zkeyLocal(x: Long, y: Long, bits: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < bits) {
      acc |= ((x >> i) & 1L) << (2 * i + 1)
      acc |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    acc
  }

  /** Per-file min/max statistics of both dimensions under a deterministic
    * `nFiles`-file layout ordered by `sortKeys` — the footer-stats model a
    * scan planner prunes against. The deterministic ntile assignment makes
    * the skip counts oracle-replayable; the physical production path is
    * [[writeClustered]] (repartitionByRange on the same key), which
    * produces the same locality without a global window.
    */
  def layoutStats(
      df: DataFrame, xCol: String, yCol: String,
      sortKeys: Seq[Column], nFiles: Int): DataFrame =
    df.withColumn("fid", ntile(nFiles).over(Window.orderBy(sortKeys: _*)))
      .groupBy(col("fid"))
      .agg(
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"),
        count(lit(1)).as("n"))

  /** Physically write `df` clustered by `key`: range-partition into
    * `nFiles` write tasks and sort within each, so every output file
    * covers a contiguous key range and parquet footer min/max stats are
    * tight. With a [[zkey]] key this is the Z-ORDER OPTIMIZE layout; the
    * shuffle is one range exchange of the rows being laid out — no global
    * single-task sort.
    */
  def writeClustered(
      df: DataFrame, key: Column, nFiles: Int, path: String): Unit =
    df.withColumn("_zk", key)
      .repartitionByRange(nFiles, col("_zk"))
      .sortWithinPartitions(col("_zk"))
      .drop("_zk")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Re-cluster a parquet table in place by the z-order of two integer
    * columns — [[compact]]'s layout-optimizing sibling, with the same
    * staged-write + row-count-verified + checked-rename swap (readers see
    * the old layout until the rename; a crash before it leaves the table
    * untouched).
    */
  def clusterInPlace(
      spark: SparkSession, path: String, xCol: String, yCol: String,
      bits: Int = 16, nFiles: Int = 64): CompactStats = {
    val before = dataFileCount(spark, path)
    val src = spark.read.parquet(path)
    val rows = src.count()
    val tmp = path.stripSuffix("/") + ".zorder-tmp"
    writeClustered(src, zkey(col(xCol), col(yCol), bits), nFiles, tmp)
    val staged = spark.read.parquet(tmp).count()
    require(staged == rows,
      s"staged z-order layout has $staged rows, source has $rows — aborting swap, $path untouched")
    val fs = hadoopFs(spark, path)
    fs.delete(new Path(path), true)
    require(fs.rename(new Path(tmp), new Path(path)),
      s"rename $tmp -> $path failed after the old layout was deleted; " +
        s"the clustered table is intact at $tmp — move it into place manually")
    CompactStats(before, dataFileCount(spark, path), rows)
  }
}
