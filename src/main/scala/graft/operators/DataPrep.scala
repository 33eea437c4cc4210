package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** One-call training-data preparation: the composed pipeline every stage of
  * which exists (and is oracle-checked) as a standalone operator —
  * normalize → Gopher quality → repetition rules → perplexity gate →
  * corpus dedup → benchmark decontamination. README's "training-data prep,
  * end to end" recipe, packaged with per-stage counts so a run reports
  * exactly where documents were lost.
  *
  * Each stage consumes the previous stage's survivors; the stage boundaries
  * are materialization points (localCheckpoint) because every stage is also
  * counted — the count would otherwise recompute the whole prefix per
  * stage. At 100 TB you would persist stage outputs to storage instead;
  * the shape (filter chain over (id, text), no corpus-wide shuffle outside
  * the dedup/decontam joins) is the same.
  */
object DataPrep {

  final case class PrepConfig(
      minWords: Int = 50,
      maxWords: Int = 100000,
      dupWordFracMax: Double = 0.3,
      topNgramCharFracMax: Double = 0.2,
      maxLogPpl: Double = 10.0,
      decontamNgram: Int = 13
  )

  final case class PrepReport(
      input: Long,
      afterQuality: Long,
      afterRepetition: Long,
      afterPerplexity: Long,
      afterDedup: Long,
      afterDecontam: Long,
      kept: DataFrame
  )

  def prepare(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      /** LM training slice for the perplexity gate; None skips the gate. */
      trusted: Option[DataFrame] = None,
      /** eval set for decontamination; None skips it. */
      benchmark: Option[DataFrame] = None,
      config: PrepConfig = PrepConfig()
  ): PrepReport = {
    def checkpointed(df: DataFrame): DataFrame = df.localCheckpoint(false)

    val normalized = checkpointed(
      corpus.withColumn(textCol, TextFunctions.normalizeText(col(textCol))))
    val input = normalized.count()

    val quality = checkpointed(
      QualityFilters.gopherFilter(normalized, idCol, textCol, config.minWords, config.maxWords))
    val nQuality = quality.count()

    val repetition = checkpointed(
      quality.join(
        QualityFilters.repetitionSignals(quality, idCol, textCol, n = 2)
          .filter(col("dup_word_frac") <= config.dupWordFracMax &&
            col("top_ngram_char_frac") <= config.topNgramCharFracMax)
          .select(idCol),
        Seq(idCol), "left_semi"))
    val nRepetition = repetition.count()

    val fluent = trusted match {
      case Some(t) =>
        // normalize the trusted slice the same way the corpus was — the LM's
        // vocabulary must match the tokens it scores (raw newline/tab-fused
        // tokens would push every corpus bigram to the OOV smoothing floor)
        val lm = LanguageModel.trainBigram(
          t.withColumn(textCol, TextFunctions.normalizeText(col(textCol))), textCol)
        checkpointed(repetition.join(
          LanguageModel.perplexityFilter(lm, repetition, textCol, idCol, config.maxLogPpl)
            .select(col("doc_id").as(idCol)),
          Seq(idCol), "left_semi"))
      case None => repetition
    }
    val nFluent = fluent.count()

    val deduped = checkpointed(Dedup.dedupCorpus(fluent, idCol, textCol))
    val nDeduped = deduped.count()

    val clean = benchmark match {
      case Some(bench) =>
        // normalize the benchmark like the corpus (and the trusted slice
        // above): an NFD-composed or control-byte-laden eval item tokenizes
        // differently from the normalized corpus, and its grams would never
        // collide — contaminated documents would walk through the gate
        checkpointed(Dedup.decontaminate(
          deduped, idCol, textCol,
          bench.withColumn(textCol, TextFunctions.normalizeText(col(textCol))),
          textCol, config.decontamNgram))
      case None => deduped
    }
    val nClean = clean.count()

    PrepReport(input, nQuality, nRepetition, nFluent, nDeduped, nClean, clean)
  }
}
