package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based quality filters — the published MassiveText/Gopher
  * rules (Rae et al. 2021, appendix A1.1): excessively repetitious
  * documents (boilerplate, scraper loops, keyword stuffing) are filtered by
  * the fraction of the document made of repeated units. Two of the rule
  * family, both exactly replayable by a SQL oracle:
  *
  *  - `dup_word_frac`: fraction of word occurrences that are repeats of an
  *    earlier word (1 − distinct/total) — pure array arithmetic, no shuffle;
  *  - `top_ngram_char_frac`: fraction of the document's characters covered
  *    by occurrences of its single most frequent word n-gram (count ties
  *    broken toward the lexicographically larger gram) — one explode +
  *    per-document aggregation, shuffled on the document id.
  *
  * Scale shape: the explode is linear in token count and the groupBy key is
  * (id, gram) then id — no skew beyond document length itself; partial
  * aggregation applies. Thresholding (e.g. drop `top_ngram_char_frac` >
  * 0.2 per Gopher) is left to the caller as a plain filter.
  */
object QualityFilters {

  /** @param carry extra input columns carried through to the output (e.g.
    *              a grouping key) — saves the caller a join back to the
    *              source just to recover them.
    */
  def repetitionSignals(
      df: DataFrame, idCol: String, textCol: String, n: Int = 2,
      carry: Seq[String] = Nil
  ): DataFrame = {
    // tokenize ONCE per doc: explode_outer's generator input is evaluated
    // outside the projection's common-subexpression scope, so deriving the
    // word stats and the n-grams from the text column directly would run
    // the split several times per row (measured ~2× on the battery corpus)
    val base = df.select(
      Seq(
        col(idCol),
        split(trim(col(textCol)), "\\s+").as("_toks"),
        length(col(textCol)).as("_chars")
      ) ++ carry.map(col): _*
    )
    val grams = base.select(
      Seq(
        col(idCol),
        col("_chars"),
        size(col("_toks")).as("_n_words"),
        size(array_distinct(col("_toks"))).as("_n_distinct"),
        explode_outer(Dedup.wordNgramsFromTokens(col("_toks"), n)).as("_gram")
      ) ++ carry.map(col): _*
    )
    val keys = Seq(idCol, "_chars", "_n_words", "_n_distinct") ++ carry
    val counted = grams.groupBy(col("_gram") +: keys.map(col): _*)
      .agg(count(col("_gram")).as("_cnt"))
    // most frequent n-gram per doc; ties toward the larger gram string so
    // the pick (and the oracle's) is deterministic
    val ranked = counted.withColumn("_rn",
      row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("_cnt").desc, col("_gram").desc)))
    ranked.filter(col("_rn") === 1)
      .select(
        Seq(
          col(idCol),
          round(lit(1.0) - col("_n_distinct").cast("double")
            / greatest(col("_n_words"), lit(1)).cast("double"), 6).as("dup_word_frac"),
          round(
            when(col("_gram").isNull, lit(0.0)).otherwise(
              col("_cnt").cast("double") * length(col("_gram")).cast("double")
                / greatest(col("_chars"), lit(1)).cast("double")),
            6).as("top_ngram_char_frac")
        ) ++ carry.map(col): _*)
  }
}
