package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an `array<float>` embedding column (E2).
  *
  * The reference documents but never implements `lg search`
  * (`docs/GUIDE.md:190-193`; absent from `cli.py`) — we define the semantics:
  * cosine similarity, top-k, optional metadata predicate.
  *
  * Scale path: brute force is a single scan + TakeOrdered (no shuffle of the
  * corpus); the LSH variant prunes the scan to matching hyperplane buckets,
  * trading recall for a partition-prunable predicate — the same structure an
  * IVF index gives you when the bucket id is a partition column.
  */
object Similarity {

  /** Brute-force cosine top-k: the query vector is inlined as a literal
    * (broadcast by value into codegen), so the plan is scan → project →
    * TakeOrderedAndProject. No shuffle, no crossJoin.
    */
  def topK(df: DataFrame, vecCol: String, idCol: String, query: Array[Float], k: Int): DataFrame =
    df.withColumn("sim", cosine(col(vecCol), vecLit(query)))
      .orderBy(col("sim").desc, col(idCol))
      .select(col(idCol), round(col("sim"), 6).as("sim"))
      .limit(k)

  /** LSH-bucketed approximate top-k: only rows whose hyperplane bucket is
    * within `probes` XOR-bit-flips of the query bucket are scored. With the
    * bucket as a partition/cluster column this becomes partition pruning.
    */
  def topKLsh(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Float],
      k: Int,
      dim: Int,
      nPlanes: Int = 8,
      probes: Int = 1
  ): DataFrame = {
    val bucketCol = lshBucket(col(vecCol), dim, nPlanes)
    // query bucket, computed the same deterministic way on a literal vector
    val qBucketDf = df.sparkSession.range(1).select(lshBucket(vecLit(query), dim, nPlanes).as("qb"))
    val qBucket = qBucketDf.head().getInt(0)
    val probeBuckets: Seq[Int] =
      qBucket +: (0 until nPlanes).flatMap(b => if (probes > 0) Some(qBucket ^ (1 << b)) else None)
    df.withColumn("bucket", bucketCol)
      .filter(col("bucket").isin(probeBuckets: _*))
      .withColumn("sim", cosine(col(vecCol), vecLit(query)))
      .orderBy(col("sim").desc, col(idCol))
      .select(col(idCol), round(col("sim"), 6).as("sim"))
      .limit(k)
  }
}
