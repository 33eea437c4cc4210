package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries in [[SparkEntry.queries]] read through here so that scan-level
  * concerns (nanosecond-timestamp parquet, pushdown-friendly column pruning)
  * are handled once.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** The engine's vector ops assume `array<float>` embeddings (the int8
    * quantizer, the native RandomProject expression, and the local/column
    * cosine twins all match on FloatType). Normalize here so a testdata
    * regeneration that flips the element type to double degrades to a cast,
    * not a battery-wide analysis failure — the same defensive posture
    * [[events]] takes for its timestamp encoding.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => raw
      case _ => raw.withColumn("embedding", col("embedding").cast("array<float>"))
    }
  }

  /** `events.parquet`'s `ts` encoding has varied across testdata generations:
    * nanosecond INT64 (which Spark's parquet reader rejects without
    * `nanosAsLong`) and native TIMESTAMP_MICROS. Normalize either to a
    * `timestamp_ntz` column named `ts`, truncated to microseconds (exactly
    * what DuckDB's µs-precision TIMESTAMP does on the oracle side).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
}
