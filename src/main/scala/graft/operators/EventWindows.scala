package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window aggregations over the `events` table — the batch forms
  * of the Structured Streaming operators in [[graft.streaming]].
  *
  * Tumbling/sliding use Spark's `window()` (epoch-aligned, same bucketing as
  * `time_bucket` in ANSI engines); sessionization is lag+cumsum — one shuffle
  * on the session key, which is also how `session_window` plans it.
  */
object EventWindows {

  /** Tumbling windows: one row per (window start, group). */
  def tumbling(df: DataFrame, tsCol: String, size: String, groupCols: Seq[String]): DataFrame =
    df.groupBy((window(col(tsCol), size).getField("start").as("wstart") +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Sliding windows: each event lands in size/slide windows. */
  def sliding(df: DataFrame, tsCol: String, size: String, slide: String, groupCols: Seq[String]): DataFrame =
    df.groupBy((window(col(tsCol), size, slide).getField("start").as("wstart") +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Gap-based sessions per key: a new session starts when the gap to the
    * previous event exceeds `gapSeconds`. Returns (key, session count,
    * event count).
    */
  def sessionCounts(df: DataFrame, tsCol: String, keyCol: String, gapSeconds: Long): DataFrame = {
    // gap measured in exact microseconds — integer epoch arithmetic is the
    // only gap definition every engine agrees on (second-granularity datediff
    // functions disagree on boundary-crossing vs truncation semantics)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df.withColumn("_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("_prev", lag(col("_us"), 1).over(byKey))
      .withColumn(
        "_new_session",
        when(
          col("_prev").isNull || (col("_us") - col("_prev")) > gapSeconds * 1000000L,
          1L
        ).otherwise(0L)
      )
      .groupBy(col(keyCol))
      .agg(sum(col("_new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Trailing rolling aggregate per key: for every event, the count and sum
    * over the preceding `windowSeconds` (inclusive of peers at the same
    * second — RANGE frame semantics, which every ANSI engine shares). One
    * shuffle on the key; the frame is evaluated in a single sorted pass per
    * partition, so a key's cost is linear in its events, not quadratic.
    */
  def rollingTrailing(
      df: DataFrame, tsCol: String, keyCol: String, aggCol: String,
      windowSeconds: Long): DataFrame = {
    val frame = Window.partitionBy(col(keyCol))
      .orderBy(col("_s"))
      .rangeBetween(-(windowSeconds - 1), Window.currentRow)
    df.withColumn("_s", unix_seconds(col(tsCol).cast("timestamp")))
      .withColumn("roll_n", count(lit(1)).over(frame))
      .withColumn("roll_sum", sum(col(aggCol)).over(frame))
      .drop("_s")
  }
}
