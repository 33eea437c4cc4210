package graft.chunker

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the chunker invariants the reference only spot-checks
  * (SURVEY §5): token bounds, id uniqueness, text conservation, merge-fold
  * floor behavior — across randomized documents and chunker parameters.
  */
class ChunkerPropertySpec extends AnyFunSuite {

  private val word = Gen.oneOf(
    "lov", "rett", "plikt", "skal", "kan", "gjelder", "denne", "paragraf",
    "ledd", "første", "annet", "tredje", "virksomhet", "person", "foretak"
  )

  private val sentenceGen: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" ") + ".")

  private val leddGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, sentenceGen)).map(_.mkString(" "))

  private def docGen: Gen[(String, Int, Int, Int)] =
    for {
      nLedd <- Gen.chooseNum(0, 6)
      ledds <- Gen.listOfN(nLedd, leddGen)
      shape <- Gen.chooseNum(0, 2)
      target <- Gen.oneOf(16, 32, 64)
      max <- Gen.oneOf(64, 128, 512)
      min <- Gen.oneOf(1, 5, 20)
    } yield {
      val body = shape match {
        case 0 =>
          s"""<section class="section"><h2>Kap</h2><article class="legalArticle" id="p1">
             |<h2><span class="legalArticleValue">&#167; 1</span></h2>
             |${ledds.zipWithIndex.map { case (t, i) => s"""<article class="legalP" id="l$i">$t</article>""" }.mkString}
             |</article></section>""".stripMargin
        case 1 =>
          s"""<section class="section"><h3>I</h3>
             |${ledds.zipWithIndex.map { case (t, i) => s"""<article class="legalP" id="c$i">$t</article>""" }.mkString}
             |</section>""".stripMargin
        case _ =>
          s"""<main class="documentBody"><h1>Lov</h1>
             |${ledds.zipWithIndex.map { case (t, i) => s"""<article class="legalP" id="s$i">$t</article>""" }.mkString}
             |</main>""".stripMargin
      }
      (s"<html><body>$body</body></html>", target, max, min)
    }

  test("invariants: bounded tokens, unique ids, positional index, non-empty text") {
    val prop = forAll(docGen) { case (xml, target, max, min) =>
      val chunker = new LovdataChunker(target, max, min)
      val chunks = chunker.chunk(xml)
      val ids = chunks.map(_.chunkId)
      // max bound holds for un-merged, un-grouped chunks only: the change-law
      // fold respects target (not max), and the merge fold may overshoot max
      // while accumulating to min — both faithful to the reference
      // (`lovdata_chunker.py:140-190`, `:707-829`)
      val boundedUp = chunks
        .filter(c => !c.merged && !c.chunkId.startsWith("section-"))
        .forall(_.tokenCount <= max)
      val positive = chunks.forall(c => c.tokenCount > 0 && c.text.nonEmpty)
      val unique = ids.distinct.length == ids.length
      val positional = chunks.map(_.chunkIndex) == chunks.indices
      // merge floor: every chunk but the last reaches min (the fold flushes
      // only at >= min unless the max guard trips, which needs max < 2*min)
      val mergeFloor = max < 2 * min ||
        chunks.dropRight(1).forall(_.tokenCount >= min)
      boundedUp && positive && unique && positional && mergeFloor
    }
    assert(check(Parameters.default.withMinSuccessfulTests(300), prop).passed)
  }

  test("determinism: same input, same output") {
    val prop = forAll(docGen) { case (xml, target, max, min) =>
      val a = new LovdataChunker(target, max, min).chunk(xml)
      val b = new LovdataChunker(target, max, min).chunk(xml)
      a == b
    }
    assert(check(Parameters.default.withMinSuccessfulTests(100), prop).passed)
  }
}
