package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generates the checked-in golden fixtures that back battery oracles whose
  * semantics are not SQL-expressible (the chunker's fold laws). The chunker
  * is a pure function of (doc_id, text, lang), so its aggregate over a given
  * testdata scale factor is a constant — computed once here, stored with the
  * sf's document count as the key, and verified by DuckDB reading the
  * fixture back (`tools/fixtures/`). Regenerate only when chunker semantics
  * intentionally change:
  *
  *   sbt "runMain graft.FixtureGen"
  */
object FixtureGen {

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("tools/fixtures")
    val sfDirs =
      if (args.length > 1) args.tail.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val q = graft.queries.PipelineQueries.all("s2_chunker_stats").fn
    val frames = sfDirs.map { d =>
      // the (n_docs, corpus_chars) pair identifies the scale factor from the
      // data alone (sf0.001 and sf0.01 share a row count but not content)
      val key = Tables.documents(spark, d)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars")).head()
      q(spark, d)
        .withColumn("n_docs", lit(key.getLong(0)))
        .withColumn("corpus_chars", lit(key.getLong(1)))
    }
    frames.reduce(_ unionByName _)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/s2_chunker_stats")
    println(s"wrote $outDir/s2_chunker_stats for ${sfDirs.mkString(", ")}")
    spark.stop()
  }
}
