package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the relational text
  * classifier a training-data pipeline uses where published pipelines plug
  * in a fasttext model: language routing, quality voting (train on a
  * trusted-vs-crawl split), topic bucketing. Same design discipline as
  * [[LanguageModel]]: the MODEL IS DATAFRAMES (per-class token counts +
  * class priors) — training is one groupBy over the exploded corpus,
  * scoring is one equi-join on the term, and the vocabulary never touches
  * the driver (only |classes| and the vocab SIZE do).
  *
  * Scoring math (add-α smoothing, α = 1):
  *   score(d, c) = ln P(c) + Σ_t tf(d,t) · ln((cnt(c,t)+1)/(total(c)+V))
  * Scores are exact given the counts; the battery rounds to 6dp before the
  * argmax (float-sum reassociation noise sits far below that, same
  * contract as the perplexity filter's threshold).
  *
  * Scale shape: training shuffles (label, term) pairs once; scoring
  * explodes each document to its DISTINCT terms (tf carried as a column),
  * multiplies by the class list (a bounded handful, broadcast), and
  * equi-joins the count table — no cartesian against the vocabulary, no
  * driver-side model array.
  */
object NaiveBayes {

  final case class NbModel(
      /** (label, n_docs) */
      priors: DataFrame,
      /** (label, term, cnt) */
      termCounts: DataFrame,
      /** (label, total_toks) */
      classTotals: DataFrame,
      vocabSize: Long,
      nDocs: Long
  )

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /** One pass over the labeled corpus: per-class document counts, per-class
    * token totals, and the (label, term) count table.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String): NbModel = {
    val tokens = docs
      .select(col(labelCol).as("label"), explode(toks(col(textCol))).as("term"))
    val termCounts = tokens.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // feeds totals AND the scoring join — compute once
    val classTotals = termCounts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("total_toks"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val vocabSize = termCounts.select(col("term")).distinct().count()
    val nDocs = docs.count()
    NbModel(priors, termCounts, classTotals, vocabSize, nDocs)
  }

  /** Per-(document, class) log-posterior scores: (`idCol`, label, score).
    * Every document scores against every class (including classes whose
    * terms it never shares — the smoothing floor handles those).
    */
  def score(model: NbModel, docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val classes = model.priors
      .join(model.classTotals, Seq("label"))
      .select(col("label"), col("n_docs"), col("total_toks"))
    val docTf = docs
      .select(col(idCol).as("_id"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("_id"), col("term")).agg(count(lit(1)).as("tf"))
    val perTerm = docTf
      .crossJoin(broadcast(classes)) // |classes| rows — bounded by construction
      .join(model.termCounts, Seq("label", "term"), "left")
      .select(col("_id"), col("label"), col("n_docs"), col("total_toks"),
        (col("tf") *
          log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) /
            (col("total_toks") + lit(model.vocabSize.toDouble)))).as("_w"))
    perTerm
      .groupBy(col("_id"), col("label"), col("n_docs"))
      .agg(sum(col("_w")).as("_sumw"))
      .select(col("_id").as(idCol), col("label"),
        (log(col("n_docs") / lit(model.nDocs.toDouble)) + col("_sumw")).as("score"))
  }

  /** Argmax prediction: (`idCol`, label). Scores are rounded to 6dp before
    * the argmax so engine-order float noise cannot flip a prediction; ties
    * break toward the LARGER label (struct-max), deterministically.
    */
  def predict(model: NbModel, docs: DataFrame, textCol: String, idCol: String): DataFrame =
    score(model, docs, textCol, idCol)
      .groupBy(col(idCol))
      .agg(max(struct(round(col("score"), 6).as("s"), col("label").as("l"))).as("_m"))
      .select(col(idCol), col("_m.l").as("label"))
}
