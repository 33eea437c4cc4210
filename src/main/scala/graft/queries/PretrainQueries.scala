package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{Dedup, Pretrain, Snapshots}

/** The composed crawl→training-shards battery entry: every prep family the
  * engine ships (WARC ingest, HTML strip, normalize, C4/Gopher/repetition/
  * perplexity quality, line + fuzzy dedup, decontamination, token budget,
  * packing, epoch shards) run as ONE pipeline over snapshot tables, with a
  * DuckDB oracle that replays the entire chain from the `documents` table.
  * Cross-family contract drift — id columns, hash families, text shapes —
  * is exactly what this catches and the per-stage entries cannot.
  */
object PretrainQueries {

  private def scratch(d: String, name: String): String = QueryScratch.fresh(d, name)

  /** url scheme the oracle and the entry share: source/lang/doc_id ride in
    * the crawl url so no metadata join is needed after the WARC roundtrip.
    */
  private val UrlRe = "^https://crawl\\.test/([^/]+)/([^/]+)/([0-9]+)$"

  val all: Map[String, Q] = Map(

    "pipeline_pretrain_e2e" -> Q(
      (s, d) => {
        val docs0 = documents(s, d)
        // crawl synthesis: each document served as an HTML page inside a
        // WARC container (the Common Crawl shape)
        val warcDir = scratch(d, "pretrain_warc")
        graft.sources.Warc.write(
          docs0.select(
            concat(lit("https://crawl.test/"), col("source"), lit("/"),
              col("lang"), lit("/"), col("doc_id")).as("url"),
            lit("2024-01-01T00:00:00Z").as("date"),
            Pretrain.crawlHtml(col("text")).as("text")),
          warcDir): Unit
        // ingest: WARC → snapshot table (the lakehouse landing commit)
        val rawTbl = scratch(d, "pretrain_raw_tbl")
        Snapshots.create(s, rawTbl)
        val parsed = graft.sources.Warc.responses(
          graft.sources.Warc.read(s, warcDir + "/*.warc.gz"))
          .select(
            regexp_extract(col("url"), UrlRe, 3).cast("long").as("doc_id"),
            regexp_extract(col("url"), UrlRe, 1).as("source"),
            regexp_extract(col("url"), UrlRe, 2).as("lang"),
            col("text").as("html"))
        Snapshots.append(s, rawTbl, parsed): Unit
        val raw = Snapshots.read(s, rawTbl)
        // the eval set to decontaminate against: the %37 slice of the
        // original corpus (the dd_contamination convention)
        val bench = docs0.filter(col("doc_id") % 37 === 0).select(col("text"))
        val (report, kept) = Pretrain.prepare(s, raw, Some(bench))
        // the final corpus lands in a snapshot table; the 12_final row is
        // read BACK from it, so the sink commit is itself oracle-pinned
        val outTbl = scratch(d, "pretrain_out_tbl")
        Snapshots.create(s, outTbl)
        Snapshots.append(s, outTbl, kept.select(
          col("doc_id"), col("source"), col("lang"), col("text"),
          col("toks"), col("shard"), col("order_key"))): Unit
        val r12 = Snapshots.read(s, outTbl)
          .withColumn("_fp", Dedup.md5Lower60(col("text")))
          .agg(
            count(lit(1)).as("n"),
            coalesce(sum(col("toks")), lit(0L)).as("mass"),
            coalesce(expr("bit_xor(_fp)"), lit(0L)).as("fp"))
          .select(lit("12_final").as("stage"), col("n"), col("mass"), col("fp"))
        report.unionByName(r12).orderBy(col("stage"))
      },
      PretrainOracle.sql,
      Seq("S2", "K1", "A6", "C13", "F9", "L1")
    )
  )
}
