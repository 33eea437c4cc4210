package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins — point-in-interval and interval-overlap — as BUCKETIZED
  * equi-joins.
  *
  * Spark plans a bare range predicate (`p BETWEEN lo AND hi`) with no
  * equality conjunct as a BroadcastNestedLoopJoin: every left row is tested
  * against every right row — O(|L|·|R|), a guaranteed 100 TB death. Even
  * with an equality key, a hot key degenerates to the same cross-product
  * within the key. The fix every columnar engine ships (DuckDB's IEJoin,
  * Flink's interval join) is to make the time dimension itself a join key:
  * quantize it into fixed-width buckets, equi-join on the bucket id, and
  * re-check the exact predicate on the survivors. Cost is
  * O(span/width) bucket rows per interval and a plain shuffled equi-join —
  * linear, partitionable, AQE-skew-splittable.
  *
  * Bucket arithmetic is exact-integer (`pmod`-based floor division, never
  * `floor(double / double)` — the double path mis-buckets values within an
  * ulp of a bucket boundary). The residual filter re-applies the ORIGINAL
  * inclusive predicate, so bucketing can only affect performance, never
  * results. Rows with null point/bound values cannot satisfy the predicate
  * and are dropped (inner-join semantics).
  *
  * `bucketWidth` is the scale knob: narrower buckets mean fewer false
  * candidate pairs but more bucket rows per interval. Set it near the
  * TYPICAL interval span so each interval lands in 1–2 buckets.
  */
object RangeJoin {

  /** Exact floor division for longs: (c - pmod(c, w)) is exactly divisible
    * by w, so the double division is exact (values < 2^53).
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c.cast("long") - pmod(c.cast("long"), lit(w))) / lit(w)).cast("long")

  /** Join each point row to every interval row with the same `keys` and
    * `lo <= point <= hi` (inclusive). The point side gets ONE bucket row;
    * the interval side explodes to `sequence(bucket(lo), bucket(hi))`.
    *
    * @param pointCol    integral column on `points` (e.g. epoch micros)
    * @param loCol hiCol integral bound columns on `intervals`
    * @param keys        equality key columns present on BOTH sides
    * @param bucketWidth bucket width in the same unit as the columns
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      keys: Seq[String],
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlapCols = (points.columns.toSet & intervals.columns.toSet) -- keys
    require(overlapCols.isEmpty,
      s"non-key columns present on both sides: ${overlapCols.mkString(", ")}")
    val pts = points.filter(col(pointCol).isNotNull)
      .withColumn("__b", floorDiv(col(pointCol), bucketWidth))
    val ivs = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn("__b",
        explode(sequence(floorDiv(col(loCol), bucketWidth), floorDiv(col(hiCol), bucketWidth))))
    pts.join(ivs, Seq("__b") ++ keys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  /** Join left intervals to right intervals with the same `keys` that
    * OVERLAP: `lLo <= rHi AND rLo <= lHi` (inclusive, so touching
    * endpoints match). Both sides explode to their bucket span; a pair
    * sharing several buckets would match once per shared bucket, so each
    * pair is claimed only in the bucket of `greatest(lLo, rLo)` — the
    * first bucket both intervals occupy — which keeps the join
    * duplicate-free WITHOUT a distinct over the (wide) output.
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      lLo: String,
      lHi: String,
      rLo: String,
      rHi: String,
      keys: Seq[String],
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlapCols = (left.columns.toSet & right.columns.toSet) -- keys
    require(overlapCols.isEmpty,
      s"non-key columns present on both sides: ${overlapCols.mkString(", ")}")
    def buckets(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("__b",
          explode(sequence(floorDiv(col(lo), bucketWidth), floorDiv(col(hi), bucketWidth))))
    buckets(left, lLo, lHi).join(buckets(right, rLo, rHi), Seq("__b") ++ keys)
      .filter(
        col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          col("__b") === floorDiv(greatest(col(lLo), col(rLo)), bucketWidth))
      .drop("__b")
  }
}
