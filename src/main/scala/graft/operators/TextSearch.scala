package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Okapi BM25 full-text search over a document corpus.
  *
  * The reference retrieves chunks by vector similarity only
  * (`infrastructure/chroma_vector_store.py:22-93`); keyword retrieval is the
  * standard complement for a training-data / RAG engine, so it is provided as
  * a first-class extension: BM25 scoring (Robertson idf) over a
  * whitespace-tokenized corpus, plus a persisted inverted-index layout whose
  * term-bucket partitioning turns a query into partition pruning — the same
  * at-rest-layout move as [[Similarity.writeIvf]].
  *
  * Scale shape (the 100 TB argument):
  *   - Brute scoring filters to the query's terms BEFORE the only corpus-wide
  *     shuffle, so the exchange carries `O(matching postings)`, not the
  *     corpus; document-frequency and corpus stats are tiny aggregates that
  *     broadcast back.
  *   - The persisted index pays the full tokenize+count once at build time;
  *     a query then reads only `termBuckets(query)/nBuckets` of the postings
  *     from disk (partition pruning on `bucket`), joins nothing (df is
  *     denormalized onto the posting row), and top-ks.
  */
object TextSearch {

  /** BM25 hyperparameters (standard Okapi defaults). */
  final case class Bm25Params(k1: Double = 1.2, b: Double = 0.75)

  /** Whitespace tokens, empty-dropped — matches the corpus-stats queries
    * (`ta_vocab_top20`) so oracles replay with DuckDB `string_split`.
    */
  private def toks(textCol: String) =
    filter(split(trim(col(textCol)), " "), t => length(t) > 0)

  /** Per-(doc, query-term) postings with document length attached.
    * The `isin` filter runs before the tf groupBy: the aggregate — the one
    * corpus-wide shuffle — only ever carries rows whose term is in the query.
    */
  private def queryPostings(
      docs: DataFrame, textCol: String, idCol: String, query: Seq[String]): DataFrame = {
    val terms = query.distinct
    docs
      .select(col(idCol).as("doc_id"), toks(textCol).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** BM25 score expression for one posting row: idf(df) * tf-saturation.
    * `n`/`avgdl` are corpus scalars folded in as literals — `avgdl` derives
    * from an exact integer sum, so it is reproducible across partitionings.
    */
  private def bm25W(n: Long, avgdl: Double, p: Bm25Params) = {
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    idf * (col("tf") * lit(p.k1 + 1.0)) /
      (col("tf") + lit(p.k1) * (lit(1.0 - p.b) + lit(p.b) * col("dl") / lit(avgdl)))
  }

  /** Per-document BM25 scores for `query` (only docs containing at least one
    * query term appear). Callers round/sort/limit; [[bm25TopK]] is the
    * user-facing composition.
    */
  def bm25Scores(
      docs: DataFrame, textCol: String, idCol: String, query: Seq[String],
      params: Bm25Params = Bm25Params()): DataFrame = {
    val lens = docs.select(col(idCol).as("doc_id"), size(toks(textCol)).as("dl"))
    val row = lens.agg(count(lit(1)), sum(col("dl"))).head()
    val n = row.getLong(0)
    val avgdl = if (n == 0) 1.0 else row.getLong(1).toDouble / n
    val tf = queryPostings(docs, textCol, idCol, query)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df")) // one row per (doc,term) ⇒ count = doc frequency
    tf.join(broadcast(dfreq), "term") // |query| rows — always broadcastable
      .withColumn("w", bm25W(n, avgdl, params))
      .groupBy(col("doc_id")).agg(sum(col("w")).as("score"))
  }

  /** Top-k BM25 search: scores sorted desc with doc-id tie-break. */
  def bm25TopK(
      docs: DataFrame, textCol: String, idCol: String, query: Seq[String], k: Int,
      params: Bm25Params = Bm25Params()): DataFrame =
    bm25Scores(docs, textCol, idCol, query, params)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner for a
    * keyword ranking and a vector ranking over the same id space:
    * `score(id) = Σ_lists 1/(c + rank_in_list)`. Rank-based, so the lists'
    * raw score scales need no calibration. Inputs are already-truncated
    * top-N lists (each a handful of rows), so the un-partitioned rank
    * window is over N rows, never the corpus.
    */
  def fuseRrf(
      results: Seq[DataFrame], idCol: String, scoreCol: String, k: Int,
      c: Int = 60): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(idCol))
    val contribs = results.map { df =>
      df.select(col(idCol), row_number().over(w).as("r"))
        .select(col(idCol), (lit(1.0) / (lit(c) + col("r"))).as("contrib"))
    }
    contribs.reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  // ---------------------------------------------------------------- index

  /** Build and persist the inverted index: one posting row per (term, doc)
    * carrying tf, dl, and the term's document frequency (denormalized so a
    * probe needs no join), partitioned by `bucket = xxhash64(term) mod
    * nBuckets` so a query's scan prunes to its terms' buckets. Corpus
    * scalars live under `_stats` (ignored by partition discovery).
    */
  def writeIndex(
      spark: SparkSession, docs: DataFrame, textCol: String, idCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    import spark.implicits._
    val lens = docs.select(col(idCol).as("doc_id"), toks(textCol).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val tf = lens
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df via groupBy + equi-join, NOT a per-term window: a hyper-common
    // term ("the") would pile its entire postings list into one window
    // partition — the skew trap the duplicateSpans design note documents.
    // The groupBy combines map-side; AQE skew-splits the join-back.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val withDf = tf.join(dfreq, "term")
    withDf
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(path)
    val row = lens.agg(count(lit(1)), sum(col("dl"))).head()
    val n = row.getLong(0)
    val avgdl = if (n == 0) 1.0 else row.getLong(1).toDouble / n
    Seq((n, avgdl, nBuckets)).toDF("n", "avgdl", "n_buckets")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "/_stats")
  }

  /** Query the persisted index: prune the postings scan to the query terms'
    * buckets (partition pruning — reads `|buckets(query)|/nBuckets` of the
    * index), score, top-k. No corpus-wide work at query time.
    */
  def searchIndex(
      spark: SparkSession, path: String, query: Seq[String], k: Int,
      params: Bm25Params = Bm25Params()): DataFrame = {
    val stats = spark.read.parquet(path + "/_stats").head()
    val n = stats.getLong(0)
    val avgdl = stats.getDouble(1)
    val nBuckets = stats.getInt(2)
    val terms = query.distinct
    // The layout hashed with xxhash64; recompute the query terms' buckets via
    // a tiny local DataFrame rather than reimplementing the hash driver-side.
    import spark.implicits._
    val termBuckets = terms.toDF("term")
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .collect().map(_.getLong(1)).distinct.toSeq
    spark.read.parquet(path)
      .filter(col("bucket").isin(termBuckets: _*) && col("term").isin(terms: _*))
      .withColumn("w", bm25W(n, avgdl, params))
      .groupBy(col("doc_id")).agg(sum(col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
