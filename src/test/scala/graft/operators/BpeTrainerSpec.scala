package graft.operators

import graft.SparkSpec

/** BPE trainer laws, hand-computed on the classic subword example corpus
  * (low/lower/newest/widest with frequencies 5/2/6/3):
  *
  * pair tally: l-o 7, o-w 7, w-e 8 (2+6), e-r 2, n-e 6, e-w 6,
  *             e-s 9, s-t 9, w-i 3, i-d 3, d-e 3
  * merge 1: e-s ties s-t at 9 → (e,s) on the a-asc tie-break → "es"
  * merge 2: es-t 9 alone → "est"
  * merge 3: l-o ties o-w at 7 → (l,o) → "lo"
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("learned merges match the hand-computed sequence with deterministic tie-breaks") {
    val merges = BpeTrainer.train(corpus, "text", k = 3)
    assert(merges == Seq(
      BpeTrainer.Merge("e", "s"),
      BpeTrainer.Merge("es", "t"),
      BpeTrainer.Merge("l", "o")))
  }

  test("training is invariant under repartitioning") {
    val a = BpeTrainer.train(corpus.repartition(7), "text", k = 3)
    val b = BpeTrainer.train(corpus.coalesce(1), "text", k = 3)
    assert(a == b)
  }

  test("greedy left-to-right application: 'aaa' under (a,a) becomes [aa, a]") {
    val seg = BpeTrainer.segment(Seq((1L, "aaa")).toDF("doc_id", "text"), "text",
      Seq(BpeTrainer.Merge("a", "a")))
    assert(seg.select("pieces").as[Seq[String]].head() == Seq("aa", "a"))
  }

  test("segment applies merges in order: newest -> [n, e, w, est]") {
    val merges = BpeTrainer.train(corpus, "text", k = 2) // (e,s), (es,t)
    val seg = BpeTrainer.segment(Seq((1L, "newest")).toDF("doc_id", "text"), "text", merges)
    assert(seg.select("pieces").as[Seq[String]].head() == Seq("n", "e", "w", "est"))
  }

  test("training stops when no pair clears minCount") {
    // every word is a single char or unique: no pair occurs twice
    val tiny = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(tiny, "text", k = 5)
    assert(merges.isEmpty)
  }
}
