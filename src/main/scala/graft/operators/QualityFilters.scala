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

  /** The eight English words whose presence Gopher's rule 7 requires two
    * of (Rae et al. 2021, A1.1).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher document-level quality rule set (Rae et al. 2021,
    * appendix A1.1) as per-document signal columns plus the combined
    * `gopher_keep` verdict:
    *
    *  1. word count in [minWords, maxWords] (50 / 100,000);
    *  2. mean word length in [3, 10] characters;
    *  3. symbol-to-word ratio (`#` + ellipsis) ≤ 0.1;
    *  4. < 90% of lines start with a bullet;
    *  5. < 30% of lines end with an ellipsis;
    *  6. ≥ 80% of words contain an alphabetic character;
    *  7. ≥ 2 distinct words from the 8-word stopword list.
    *
    * Everything is per-row codegen'd column arithmetic — no shuffle, no
    * UDF; filtering is embarrassingly parallel at any scale. Character
    * classes are explicit ASCII (`[A-Za-z]`) so a RE2-based oracle replays
    * them byte-for-byte.
    */
  def gopherSignals(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      /** rule-7 word list — swap for a corpus-language list (the published
        * constant is English-only and zeroes the rule on multilingual data)
        */
      stopwords: Seq[String] = GopherStopwords,
      minStopwordTypes: Int = 2,
      carry: Seq[String] = Nil
  ): DataFrame = {
    import graft.functions.TextFunctions.occurrences
    val t = col(textCol)
    // spreadSmall: the signal projection folds every token of every doc;
    // fused onto a one-split scan it runs single-task (guide §2.5)
    val base = Par.spreadSmall(df).select(
      Seq(
        col(idCol),
        t.as("_t"),
        split(trim(t), "\\s+").as("_toks"),
        split(t, "\n").as("_lines")
      ) ++ carry.map(col): _*)
    val nWords = size(col("_toks"))
    val sumLen = aggregate(col("_toks"), lit(0), (a, x) => a + length(x))
    val mwl = sumLen.cast("double") / greatest(nWords, lit(1)).cast("double")
    val nSym = occurrences(col("_t"), "#") + occurrences(col("_t"), "...") +
      occurrences(col("_t"), "…")
    val symRatio = nSym.cast("double") / greatest(nWords, lit(1)).cast("double")
    val nLines = greatest(size(col("_lines")), lit(1)).cast("double")
    val bulletFrac = size(filter(col("_lines"), l => {
      val s = ltrim(l)
      s.startsWith("•") || s.startsWith("- ") || s.startsWith("* ")
    })).cast("double") / nLines
    val ellipsisFrac = size(filter(col("_lines"), l => {
      val s = rtrim(l)
      s.endsWith("...") || s.endsWith("…")
    })).cast("double") / nLines
    val alphaFrac = size(filter(col("_toks"), x => x.rlike("[A-Za-z]")))
      .cast("double") / greatest(nWords, lit(1)).cast("double")
    val toksLower = transform(col("_toks"), x => lower(x))
    val stopTypes = size(filter(
      array(stopwords.map(lit): _*), sw => array_contains(toksLower, sw)))
    val keep =
      nWords.between(minWords, maxWords) &&
        mwl.between(3.0, 10.0) &&
        symRatio <= 0.1 &&
        bulletFrac < 0.9 &&
        ellipsisFrac < 0.3 &&
        alphaFrac >= 0.8 &&
        stopTypes >= minStopwordTypes
    base.select(
      Seq(
        col(idCol),
        nWords.cast("long").as("n_words"),
        round(mwl, 6).as("mean_word_len"),
        round(symRatio, 6).as("symbol_ratio"),
        round(bulletFrac, 6).as("bullet_line_frac"),
        round(ellipsisFrac, 6).as("ellipsis_line_frac"),
        round(alphaFrac, 6).as("alpha_word_frac"),
        stopTypes.cast("long").as("stopword_types"),
        keep.as("gopher_keep")
      ) ++ carry.map(col): _*)
  }

  /** Rows of `df` that pass every Gopher rule, schema unchanged. */
  def gopherFilter(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000
  ): DataFrame =
    df.join(
      gopherSignals(df, idCol, textCol, minWords, maxWords)
        .filter(col("gopher_keep")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Ids of documents citing any blocklisted domain: explode the extracted
    * URLs, parse domains, match the blocklist, distinct. A suffix match
    * (`evil.org` also blocks `ads.evil.org`) mirrors how published
    * blocklists (e.g. UT1) are applied.
    *
    * Scale shape: suffix matching is done by EXPLODING each domain's label
    * suffixes (`ads.evil.org` → itself, `evil.org`) and equi-joining the
    * blocklist on them — never an `endsWith` theta-join, which would plan
    * as a nested-loop against every blocklist row. Domains have a handful
    * of labels, so the explode is a small constant factor, the join is
    * hash/broadcast-able, and AQE sizes it (no hint).
    */
  def blockedDomainIds(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blocklist: DataFrame, // one column: `domain`
      suffixMatch: Boolean = true
  ): DataFrame = {
    import graft.functions.TextFunctions.{extractUrls, urlDomain}
    val domains = df
      .select(col(idCol), explode(extractUrls(col(textCol))).as("_url"))
      .select(col(idCol), urlDomain(col("_url")).as("_domain"))
      .filter(col("_domain") =!= "")
    val keys =
      if (!suffixMatch) domains.select(col(idCol), col("_domain").as("_key"))
      else {
        // suffixes keep >= 2 labels (plus the whole domain): evil.org
        // blocks ads.evil.org, but org alone blocks nothing
        val parts = split(col("_domain"), "\\.")
        domains.select(
          col(idCol),
          explode(transform(
            sequence(lit(1), greatest(size(parts) - 1, lit(1))),
            i => array_join(slice(parts, i, size(parts)), "."))).as("_key"))
      }
    keys.join(
      blocklist.select(lower(col("domain")).as("_key")), Seq("_key"))
      .select(col(idCol)).distinct()
  }

  /** Corpus minus documents citing blocklisted domains, schema unchanged. */
  def blocklistFilter(
      df: DataFrame, idCol: String, textCol: String, blocklist: DataFrame,
      suffixMatch: Boolean = true
  ): DataFrame =
    df.join(blockedDomainIds(df, idCol, textCol, blocklist, suffixMatch),
      Seq(idCol), "left_anti")

  /** @param carry extra input columns carried through to the output (e.g.
    *              a grouping key) — saves the caller a join back to the
    *              source just to recover them.
    */
  /** Keep rows at or above the exact per-group `p`-quantile of `scoreCol` —
    * "top (1-p) fraction per language/source", the relative quality gate
    * used when absolute thresholds don't transfer across groups. The
    * threshold is the exact interpolated percentile (not the sketch), so
    * the gate is reproducible; the threshold table is one row per group, so
    * AQE broadcasts it while it fits and falls back to a shuffle join at
    * extreme group cardinality — no forced hint, same as J1/K3. For the
    * sketch variant use `percentile_approx` upstream and accept the error
    * envelope.
    */
  def quantileFilter(
      df: DataFrame, scoreCol: String, groupCol: String, p: Double): DataFrame = {
    val thresholds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($scoreCol, $p)").as("_thr"))
    df.join(thresholds, Seq(groupCol))
      .filter(col(scoreCol) >= col("_thr"))
      .drop("_thr")
  }

  def repetitionSignals(
      df: DataFrame, idCol: String, textCol: String, n: Int = 2,
      carry: Seq[String] = Nil
  ): DataFrame = {
    // tokenize ONCE per doc: explode_outer's generator input is evaluated
    // outside the projection's common-subexpression scope, so deriving the
    // word stats and the n-grams from the text column directly would run
    // the split several times per row (measured ~2× on the battery corpus).
    // spreadSmall: per-token gram fan-out on a one-split scan (guide §2.5)
    val base = Par.spreadSmall(df).select(
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

  /** Cross-document boilerplate removal (the CCNet/web-curation line rule):
    * a line whose TRIMMED form appears in more than `maxDocs` distinct
    * documents — headers, footers, cookie banners, nav chrome — is
    * stripped from every document; everything else rejoins in original
    * order, byte-identical (trimming keys the count, never rewrites the
    * kept line). Run per domain/shard slice: pass the slice, not the
    * corpus, when "common" should mean common-within-site.
    *
    * Scale shape: lines explode once, the distinct-doc count is one
    * map-side-combined aggregation keyed by the line text, and the
    * boilerplate set (tiny by definition — lines repeated across MANY
    * docs) joins back as an equi-key semi-join AQE will broadcast.
    * Documents reassemble with a per-doc sort over their OWN lines.
    * Empty-trim lines (blank spacing) are never counted as boilerplate.
    */
  def stripBoilerplateLines(
      df: DataFrame, idCol: String, textCol: String, maxDocs: Long
  ): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val lines = Par.spreadSmall(df)
      .select(col(idCol).as("_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
      .withColumn("_key", trim(col("_line")))
    val boiler = lines
      .filter(length(col("_key")) > 0)
      .groupBy(col("_key"))
      .agg(countDistinct(col("_id")).as("_docs"))
      .filter(col("_docs") > maxDocs)
      .select(col("_key"))
    val kept = lines
      .join(boiler, Seq("_key"), "left_anti")
      .groupBy(col("_id"))
      .agg(concat_ws("\n",
        transform(sort_array(collect_list(struct(col("_pos"), col("_line")))),
          x => x.getField("_line"))).as("_clean"))
    df.join(kept, df(idCol) === kept("_id"), "left")
      .withColumn(textCol, coalesce(col("_clean"), lit(""))) // all-boilerplate → empty
      .drop("_id", "_clean")
  }
}
