package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to every left row the single right row with the same
  * key and the greatest `rightTime <= leftTime` (the latest-prior-state
  * lookup every event/state reconciliation needs; equal timestamps match).
  *
  * Spark has no native as-of join, and the naive form — an inequality
  * (`theta`) join + per-left-row max — plans as a range cross-product:
  * |left|×|right| pairs per key before the filter, quadratic on hot keys.
  * This implementation is the sort-based form columnar engines use
  * internally: union the two sides, one shuffle on the key, and a running
  * `last(_, ignoreNulls)` over the time-ordered window carries each right
  * payload forward to the left rows that follow it. Cost is one exchange +
  * one sort — linear in |left|+|right| per key, no pair materialization.
  *
  * Left rows with no prior right row keep null payloads (LEFT as-of).
  * Right rows that tie on (key, time) are resolved by `last` in window
  * order — pre-aggregate the right side to one row per (key, time) when
  * the tie matters (the battery query does).
  */
object AsOfJoin {

  /** @param payload right-side columns to attach, each emitted as
    *                `prefix + name`
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      prefix: String = "asof_"
  ): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    // the payload travels as ONE struct so the match is always a single
    // right ROW — per-column windows could otherwise stitch fields from
    // different rows when a payload field is null
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(right.schema.fieldIndex(c))))
    val rightSel = right.select(
      (keyCols.map(col) :+ col(rightTime).as("__t")) :+
        struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__isR", lit(1))
    val leftSel = left.withColumn("__t", col(leftTime)).withColumn("__isR", lit(0))
      .withColumn("__p", lit(null).cast(payloadType))
    val rightAligned = left.columns.foldLeft(rightSel) { (df, c) =>
      if (keyCols.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType))
    }
    // right rows sort BEFORE left rows at equal time (__isR desc), so an
    // equal-timestamp state is visible to its event — the `>=` semantics
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = leftSel.unionByName(rightAligned)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    payload.foldLeft(filled.filter(col("__isR") === 0)) { (df, c) =>
      df.withColumn(prefix + c, col("__p").getField(c))
    }.drop("__t", "__isR", "__p")
  }
}
