package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-over-snapshot corpus diff — the engine-level generalization of
  * the reference's file-status CDC scan (`lovlig-state.json`'s
  * added/modified/removed ledger, SURVEY §2.1 S1/F1-F3): given two corpus
  * versions keyed by a document id, classify every id as
  * `added` / `removed` / `changed` / `unchanged`. This is the primitive
  * behind dump-over-dump incremental training-data refreshes (CommonCrawl
  * snapshot N vs N+1): downstream stages re-process ONLY `added ∪ changed`
  * and tombstone `removed`.
  *
  * Scale shape: content is reduced to a sha2-256 digest BEFORE the join, so
  * the full-outer join shuffles two `(id, 64-byte hash)` streams — never
  * document text. At 100 TB corpus size the exchange carries ~gigabytes.
  * Equal-id collisions aside (2⁻¹²⁸), `changed` is exact.
  */
object CorpusDiff {

  /** @return one row per id in either snapshot: (idCol, status) */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      contentCol: String
  ): DataFrame = {
    val o = oldDf.select(col(idCol), sha2(col(contentCol).cast("string"), 256).as("_h_old"))
    val n = newDf.select(col(idCol), sha2(col(contentCol).cast("string"), 256).as("_h_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("_h_old").isNull, lit("added"))
          .when(col("_h_new").isNull, lit("removed"))
          .when(col("_h_old") =!= col("_h_new"), lit("changed"))
          .otherwise(lit("unchanged"))
          .as("status"))
  }

  /** The ids downstream stages must (re)process: `added ∪ changed`. */
  def toReprocess(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      contentCol: String
  ): DataFrame =
    diff(oldDf, newDf, idCol, contentCol)
      .filter(col("status").isin("added", "changed"))
      .select(col(idCol))
}
