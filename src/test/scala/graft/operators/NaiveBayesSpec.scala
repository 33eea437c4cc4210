package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multinomial NB laws: hand-computed smoothed log-posteriors, OOV floor,
  * prediction determinism under repartitioning, separable-data accuracy.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // spam: buy:2 pills:1 now:2 (total 5); ham: meeting:1 notes:1 today:1
  // (total 3); V = 6; priors 2/3, 1/3
  private def labeled = Seq(
    ("spam", "buy pills now"),
    ("spam", "buy now"),
    ("ham", "meeting notes today")
  ).toDF("label", "text")

  test("scores match the hand-computed add-one-smoothed log-posteriors") {
    val model = NaiveBayes.train(labeled, "text", "label")
    assert(model.vocabSize == 6 && model.nDocs == 3)
    val probe = Seq((1L, "buy now pills")).toDF("doc_id", "text")
    val got = NaiveBayes.score(model, probe, "text", "doc_id")
      .select("label", "score").as[(String, Double)].collect().toMap
    val spam = math.log(2.0 / 3) +
      math.log(3.0 / 11) + math.log(3.0 / 11) + math.log(2.0 / 11)
    val ham = math.log(1.0 / 3) + 3 * math.log(1.0 / 9)
    assert(math.abs(got("spam") - spam) < 1e-12)
    assert(math.abs(got("ham") - ham) < 1e-12)
    assert(NaiveBayes.predict(model, probe, "text", "doc_id")
      .select("label").as[String].head() == "spam")
  }

  test("fully-OOV documents fall back to priors plus the smoothing floor") {
    val model = NaiveBayes.train(labeled, "text", "label")
    val probe = Seq((1L, "zzz qqq")).toDF("doc_id", "text")
    val got = NaiveBayes.score(model, probe, "text", "doc_id")
      .select("label", "score").as[(String, Double)].collect().toMap
    // spam floor 1/11 per token, ham floor 1/9 — ham's smaller total wins
    // the likelihood but spam's prior fights back; verify exact values
    assert(math.abs(got("spam") - (math.log(2.0 / 3) + 2 * math.log(1.0 / 11))) < 1e-12)
    assert(math.abs(got("ham") - (math.log(1.0 / 3) + 2 * math.log(1.0 / 9))) < 1e-12)
    // token-less documents are unclassifiable and absent, not erred
    assert(NaiveBayes.score(model, Seq((2L, "   ")).toDF("doc_id", "text"),
      "text", "doc_id").count() == 0)
  }

  test("predictions are stable under repartitioning") {
    val docs = (1L to 120L).map { i =>
      if (i % 3 == 0) (i, "buy pills now buy cheap now")
      else (i, "meeting notes today agenda notes")
    }.toDF("doc_id", "text")
    val model = NaiveBayes.train(labeled, "text", "label")
    val a = NaiveBayes.predict(model, docs.repartition(11), "text", "doc_id")
      .as[(Long, String)].collect().toMap
    val b = NaiveBayes.predict(model, docs.coalesce(1), "text", "doc_id")
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // and the separable corpus classifies perfectly
    assert(a.forall { case (id, l) => l == (if (id % 3 == 0) "spam" else "ham") })
  }
}
