package graft.operators

import graft.SparkSpec

/** End-to-end prep composition: one planted casualty per stage, and the
  * report's counts must show exactly where each was lost.
  */
class DataPrepSpec extends SparkSpec {
  import spark.implicits._

  // a "clean" document: 60 words cycling a 20-word vocabulary slice
  // (distinct ratio 20/60, under the test's 0.8 dup threshold). Slices are
  // DISJOINT apart from two shared stopwords, so clean docs never MinHash-
  // collide with each other (Jaccard 2/38), while the self-trained LM sees
  // every bigram many times.
  private def slice(k: Int): Seq[String] = Seq("the", "and") ++
    (0 until 18).map(j => s"word${k}x$j")

  private def cleanText(k: Int): String =
    (0 until 60).map(i => slice(k)(i % 20)).mkString(" ")

  private def gibberish: String =
    "the and " + (0 until 58).map(i => s"zqx${i}kwv").mkString(" ")

  private val benchText =
    "evaluation benchmark sentence with thirteen consecutive overlapping tokens " +
      "that must never appear inside any training document at all"

  private def corpus = Seq(
    (1L, cleanText(0)),
    (2L, cleanText(1)),
    (3L, cleanText(2)),
    (10L, "too short"), // dropped by Gopher min-words
    (11L, Seq.fill(20)("the data and").mkString(" ")), // 60 words, 3 distinct -> repetition drop
    (12L, gibberish), // fluent-looking shape, unseen vocabulary -> perplexity drop
    (13L, cleanText(0)), // exact duplicate of doc 1 -> dedup drop (keep min id)
    (14L, cleanText(3) + " " + benchText) // contains the benchmark run -> decontam drop
  ).toDF("doc_id", "text")

  test("each stage drops exactly its planted casualty and the report says so") {
    // the trusted slice covers doc 14's vocabulary too (decontamination,
    // not the LM, is what must catch it)
    val trusted = corpus.filter($"doc_id" <= 3 || $"doc_id" === 14)
    val bench = Seq(Tuple1(benchText)).toDF("text")
    val r = DataPrep.prepare(corpus, "doc_id", "text",
      trusted = Some(trusted), benchmark = Some(bench),
      config = DataPrep.PrepConfig(maxLogPpl = 3.5, dupWordFracMax = 0.8))
    assert(r.input == 8)
    assert(r.afterQuality == 7, "doc 10 (9 words) fails the min-words rule")
    assert(r.afterRepetition == 6, "doc 11 (3 distinct words in 60) fails dup-word-frac")
    assert(r.afterPerplexity == 5, s"doc 12 (unseen vocabulary) fails the LM gate: $r")
    assert(r.afterDedup == 4, "doc 13 duplicates doc 1; min id wins")
    assert(r.afterDecontam == 3, "doc 14 shares a 13-gram run with the benchmark")
    val kept = r.kept.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("optional stages are skipped when their inputs are absent") {
    val r = DataPrep.prepare(corpus, "doc_id", "text",
      config = DataPrep.PrepConfig(dupWordFracMax = 0.8))
    assert(r.afterRepetition == r.afterPerplexity, "no trusted slice -> no LM gate")
    assert(r.afterDedup == r.afterDecontam, "no benchmark -> no decontamination")
    assert(r.afterDedup == r.afterRepetition - 1, "the exact duplicate still drops")
  }
}
