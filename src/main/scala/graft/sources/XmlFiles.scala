package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 wiring: attach XML content to file records via Spark's `binaryFile`
  * source (whole-file semantics — the chunker needs the full DOM per
  * document, so a streaming XML row source is the wrong tool; SURVEY §2.1).
  *
  * The scan is distributed and columnar-pruned (`content` only for matched
  * paths); joining on normalized path keeps the CDC scan (S1) as the driver
  * of WHICH files are read.
  */
object XmlFiles {

  /** @param files DataFrame with a `path` column of absolute file paths
    * @param rootDir directory to scan for XML files (recursive)
    * @return `files` with an `xml` string column (inner join: files missing
    *         on disk drop out — pair with [[graft.ops.Ops.withExistsGuard]]
    *         to turn those into failure records first)
    */
  def withXml(spark: SparkSession, files: DataFrame, rootDir: String): DataFrame = {
    val bins = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xml")
      .option("recursiveFileLookup", "true")
      .load(rootDir)
      .select(
        regexp_replace(col("path"), "^file:", "").as("path"),
        col("content").cast("string").as("xml")
      )
    files.join(bins, Seq("path"))
  }
}
