package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.{Failure, Success, Try}

/** The metadata-enrichment plugin chain (SURVEY §2.12; reference
  * `metadata_enrichment_service.py:54-139`): an ordered list of named
  * enrichers, each contributing columns, composed with `foldLeft`, with
  * per-enricher failure isolation — one broken plugin never aborts the run
  * (reference `:130-137` catches and continues).
  */
object Enrichers {

  /** One enricher: a named DataFrame → DataFrame stage. */
  final case class Enricher(name: String, apply: DataFrame => DataFrame)

  /** Column-level convenience: add one column, null on per-row failure is
    * inherent to Spark expressions (no exceptions cross rows).
    */
  def column(name: String, colName: String, expr: Column): Enricher =
    Enricher(name, df => df.withColumn(colName, expr))

  /** Apply the chain in order. A stage that throws at plan-construction time
    * is skipped (isolation); the names of skipped stages are returned with
    * the result for reporting.
    */
  def applyChain(df: DataFrame, chain: Seq[Enricher]): (DataFrame, Seq[String]) =
    chain.foldLeft((df, Seq.empty[String])) { case ((acc, failed), e) =>
      Try(e.apply(acc)) match {
        case Success(next) => (next, failed)
        case Failure(_)    => (acc, failed :+ e.name)
      }
    }

  /** The reference's enrichment set, as column enrichers over a chunk
    * DataFrame with `content` and `chunkId` columns (reference
    * `metadata_enrichment_service.py:160-258`).
    */
  def defaultChain: Seq[Enricher] = {
    import graft.functions.TextFunctions._
    Seq(
      column("date", "doc_date", extractDate(col("chunkId"))),
      column("paragraph_ref", "paragraph_ref", paragraphRef(col("content"))),
      column("cross_refs", "text_cross_refs", array_distinct(lovdataRefs(col("content")))),
      column("depth", "depth", chunkDepth(col("chunkId"))),
      column("token_count", "token_count_rel", tokenCount(col("content")))
    )
  }
}
