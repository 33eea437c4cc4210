package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Bloom-pre-filtered anti-join — the shuffle-volume optimization for the
  * J1/decontamination family once the exclusion side outgrows broadcast.
  *
  * A plain `left_anti` join past the broadcast ceiling shuffles BOTH sides
  * on the key: at 100 TB that means shuffling the whole corpus to discard
  * (typically) a few percent of it. A Bloom filter of the exclusion keys
  * has no false negatives, so `mightContain = false` proves a row survives
  * the anti-join — it can bypass the shuffle entirely. Only the "maybe"
  * rows (true matches + `fpp` false positives) take the exact anti-join, so
  * shuffle volume drops from |corpus| to ≈|matches| + fpp·|corpus|.
  *
  * The result is EXACTLY equal to `left.join(right, key, "left_anti")` —
  * the bloom only routes rows, the exact join resolves every "maybe".
  *
  * Sizing: the filter costs ~1.2 bytes/key at 1% fpp. It is built
  * distributed (per-partition filters merged on the driver) and broadcast
  * once; beyond ~10⁸ keys prefer a higher fpp (the exact join absorbs the
  * extra false positives) or shard the corpus and run per-shard filters.
  */
object BloomAntiJoin {

  /** `left` minus rows whose `leftKey` appears in `right.rightKey` —
    * identical semantics to a `left_anti` equi-join (null left keys are
    * kept, matching SQL anti-join behavior).
    *
    * @param expectedItems capacity hint for the bloom filter; pass the
    *                      (approximate) distinct-key count of `right`.
    *                      Negative → count `right` first (one extra job).
    */
  def antiJoin(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01
  ): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else math.max(right.count(), 1L)
    val bloom = right.stat.bloomFilter(rightKey, n, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bloom)
    val might: Column = left.schema(leftKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        udf((id: Long) => bc.value.mightContainLong(id)).apply(col(leftKey).cast("long"))
      case StringType =>
        udf((s: String) => s != null && bc.value.mightContainString(s)).apply(col(leftKey))
      case t =>
        throw new IllegalArgumentException(
          s"bloom anti-join supports integral or string keys, got ${t.catalogString}")
    }
    // null key → null "might" → definite keep (a null never equi-matches)
    val tagged   = left.withColumn("__might", coalesce(might, lit(false)))
    val definite = tagged.filter(!col("__might")).drop("__might")
    val maybe    = tagged.filter(col("__might")).drop("__might")
    val resolved = maybe.join(
      right.select(col(rightKey).as(leftKey)), Seq(leftKey), "left_anti")
    definite.unionByName(resolved)
  }
}
