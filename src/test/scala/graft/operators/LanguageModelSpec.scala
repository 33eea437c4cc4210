package graft.operators

import graft.SparkSpec

/** Bigram-LM laws: hand-computed smoothed probabilities, graceful
  * out-of-vocabulary behavior, and the perplexity gate itself.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq((0L, "a b a"), (2L, "b b")).toDF("doc_id", "text")
  // unigrams: a→2, b→3; total=5, vocab=2; bigrams: (a,b)→1, (b,a)→1, (b,b)→1
  // addK=0.5 ⇒ kV=1

  test("trained counts and scalars match the hand tally") {
    val lm = LanguageModel.trainBigram(train, "text")
    assert(lm.total == 5 && lm.vocab == 2)
    assert(lm.unigrams.as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 3L))
    assert(lm.bigrams.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L)))
  }

  test("scoring matches the hand-computed smoothed log-probabilities") {
    val lm = LanguageModel.trainBigram(train, "text")
    val got = LanguageModel.scoreDocs(lm, Seq((1L, "a b")).toDF("doc_id", "text"),
      "text", "doc_id").select("logprob", "log_ppl").as[(Double, Double)].head()
    val expected = math.log((2 + 0.5) / (5 + 1.0)) + math.log((1 + 0.5) / (2 + 1.0))
    assert(math.abs(got._1 - expected) < 1e-12)
    assert(math.abs(got._2 - (-expected / 2)) < 1e-12)
  }

  test("out-of-vocabulary text degrades smoothly (no log 0, no NaN)") {
    val lm = LanguageModel.trainBigram(train, "text")
    val got = LanguageModel.scoreDocs(lm, Seq((1L, "z z")).toDF("doc_id", "text"),
      "text", "doc_id").select("logprob").as[Double].head()
    // first: ln(0.5/6); unseen pair with unseen head: ln(0.5/1)
    val expected = math.log(0.5 / 6.0) + math.log(0.5 / 1.0)
    assert(math.abs(got - expected) < 1e-12)
    // and an unseen CONTINUATION of a seen head uses the head's count
    val got2 = LanguageModel.scoreDocs(lm, Seq((1L, "a a")).toDF("doc_id", "text"),
      "text", "doc_id").select("logprob").as[Double].head()
    val expected2 = math.log(2.5 / 6.0) + math.log(0.5 / (2 + 1.0))
    assert(math.abs(got2 - expected2) < 1e-12)
  }

  test("perplexityFilter keeps in-distribution text and drops gibberish") {
    val lm = LanguageModel.trainBigram(train, "text")
    val docs = Seq((1L, "a b a b"), (2L, "z q w x")).toDF("doc_id", "text")
    val scored = LanguageModel.scoreDocs(lm, docs, "text", "doc_id")
      .select("doc_id", "log_ppl").as[(Long, Double)].collect().toMap
    assert(scored(1L) < scored(2L))
    val mid = (scored(1L) + scored(2L)) / 2
    val kept = LanguageModel.perplexityFilter(lm, docs, "text", "doc_id", mid)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("zero-token documents are absent, not NaN rows") {
    val lm = LanguageModel.trainBigram(train, "text")
    val scored = LanguageModel.scoreDocs(
      lm, Seq((1L, "   "), (2L, "a")).toDF("doc_id", "text"), "text", "doc_id")
    assert(scored.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }
}
