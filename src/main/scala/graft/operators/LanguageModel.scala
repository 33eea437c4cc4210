package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity filtering.
  *
  * The classic training-data quality gate (Wenzek et al., "CCNet"): train a
  * small LM on a trusted corpus slice, score every document's perplexity
  * under it, and drop the worst tail. The reference has no LM stage — this is
  * a training-data extension like the Gopher rules ([[QualityFilters]]) —
  * but it is the filter large-scale pipelines reach for first.
  *
  * The model is a bigram LM with add-k smoothing, kept relational: unigram
  * and bigram counts are DataFrames, scoring is two equi-joins (pair →
  * bigram count, pair head → unigram count). Nothing is collected to the
  * driver, so the vocabulary can be arbitrarily large — at 100 TB the count
  * tables shuffle-join against the corpus pairs like any fact-fact join and
  * AQE picks broadcast when a small trusted slice makes them tiny.
  */
object LanguageModel {

  /** A trained bigram LM: `unigrams(w, c)`, `bigrams(w1, w2, c12)`, corpus
    * scalars, and the add-k smoothing constant.
    */
  final case class BigramLm(
      unigrams: DataFrame, bigrams: DataFrame, vocab: Long, total: Long, addK: Double)

  /** Whitespace tokens, empty-dropped — the corpus-stats tokenization. */
  private def toks(textCol: String) =
    filter(split(trim(col(textCol)), " "), t => length(t) > 0)

  private def pairs(toksCol: String) =
    explode(transform(
      sequence(lit(1), size(col(toksCol)) - 1),
      i => struct(
        element_at(col(toksCol), i).as("w1"),
        element_at(col(toksCol), i + 1).as("w2"))))

  /** Count unigrams and bigrams over `docs` (the trusted slice). Two
    * aggregations, each with map-side partials; the tiny (vocab, total)
    * summary is the only driver materialization.
    */
  def trainBigram(docs: DataFrame, textCol: String, addK: Double = 0.5): BigramLm = {
    // spreadSmall: per-token uni/bigram fan-out fused onto a one-split scan
    // runs single-task (guide §2.5)
    val t = Par.spreadSmall(docs)
      .select(toks(textCol).as("toks")).filter(size(col("toks")) >= 1)
    val uni = t.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = t.filter(size(col("toks")) >= 2)
      .select(pairs("toks").as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val row = uni.agg(sum(col("c")), count(lit(1))).head()
    require(!row.isNullAt(0) && row.getLong(1) > 0,
      "trainBigram: the trusted slice contains no tokens (empty or all-whitespace texts)")
    BigramLm(uni, bi, vocab = row.getLong(1), total = row.getLong(0), addK = addK)
  }

  /** Score every document: `(doc_id, n_toks, logprob, log_ppl)` where
    * `logprob = ln P(w1) + Σ ln P(wᵢ₊₁|wᵢ)` with add-k smoothing
    * (`P(w) = (c+k)/(total+kV)`, `P(w2|w1) = (c12+k)/(c1+kV)`; unseen
    * counts coalesce to 0, so out-of-vocabulary text degrades smoothly
    * instead of hitting log 0) and `log_ppl = -logprob / n_toks`.
    * Zero-token documents are absent from the result.
    */
  def scoreDocs(lm: BigramLm, docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val kV = lm.addK * lm.vocab
    val base = Par.spreadSmall(docs)
      .select(col(idCol).as("doc_id"), toks(textCol).as("toks"))
      .filter(size(col("toks")) >= 1)
    val firstLp = base
      .select(col("doc_id"), element_at(col("toks"), 1).as("w"))
      .join(lm.unigrams, Seq("w"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c"), lit(0L)) + lit(lm.addK)) / lit(lm.total + kV)).as("lp"))
    val uni1 = lm.unigrams.select(col("w").as("w1"), col("c").as("c1"))
    val pairLp = base.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), pairs("toks").as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(uni1, Seq("w1"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c12"), lit(0L)) + lit(lm.addK)) /
          (coalesce(col("c1"), lit(0L)) + lit(kV))).as("lp"))
    val lens = base.select(col("doc_id"), size(col("toks")).as("n_toks"))
    firstLp.unionByName(pairLp)
      .groupBy(col("doc_id")).agg(sum(col("lp")).as("logprob"))
      .join(lens, "doc_id")
      .select(col("doc_id"), col("n_toks"), col("logprob"),
        (-col("logprob") / col("n_toks")).as("log_ppl"))
  }

  /** The CCNet gate: keep documents whose per-token log-perplexity under the
    * trusted-slice LM is at most `maxLogPpl`.
    */
  def perplexityFilter(
      lm: BigramLm, docs: DataFrame, textCol: String, idCol: String,
      maxLogPpl: Double): DataFrame =
    scoreDocs(lm, docs, textCol, idCol).filter(col("log_ppl") <= maxLogPpl)
}
