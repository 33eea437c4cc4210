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
}
