package graft.chunker

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordSymbolTokenizer
import graft.model.Chunk

/** Port of the reference chunker suite's assertions
  * (reference `tests/unit/lovdata_chunker_test.py`, 649 LoC). Fixtures mirror
  * the reference's three law shapes; token counts use the engine tokenizer.
  */
class LovdataChunkerSpec extends AnyFunSuite {

  private def chunker = new LovdataChunker(targetTokens = 100, maxTokens = 500)

  private val standardLawXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html lang="no">
      |<head><title>Test Law</title></head>
      |<body>
      |  <main class="documentBody" id="dokument">
      |    <h1>Testlov</h1>
      |    <section class="section">
      |      <h2>Kapittel 1. Innledning</h2>
      |      <article class="legalArticle" data-lovdata-URL="NL/lov/2024-01-01/p1" id="paragraf-1">
      |        <h2 class="legalArticleHeader">
      |          <span class="legalArticleValue">&#167; 1</span>
      |          <span class="legalArticleTitle">Formaal</span>
      |        </h2>
      |        <article class="legalP" id="paragraf-1-ledd-1" data-absoluteaddress="/lov/2024/p1/ledd1">
      |          Dette er foerste ledd i paragraf 1. Det inneholder viktig informasjon om lovens formaal.
      |        </article>
      |        <article class="legalP" id="paragraf-1-ledd-2" data-absoluteaddress="/lov/2024/p1/ledd2">
      |          Dette er andre ledd. Det bygger videre paa foerste ledd og gir ytterligere detaljer.
      |        </article>
      |      </article>
      |    </section>
      |  </main>
      |</body>
      |</html>""".stripMargin

  private val changeLawXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html lang="no">
      |<body>
      |  <main class="documentBody" id="dokument">
      |    <h1>Endringslov</h1>
      |    <section class="section">
      |      <h2>I</h2>
      |      <article class="legalP" id="change-1">
      |        I lov 15. juni 2018 nr. 40 om akvakultur gjoeres foelgende endringer.
      |      </article>
      |      <article class="legalP" id="change-2">
      |        Ny paragraf skal lyde: Dette er en endring av paragrafen.
      |      </article>
      |    </section>
      |  </main>
      |</body>
      |</html>""".stripMargin

  private val simpleLawXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html lang="no">
      |<body>
      |  <main class="documentBody" id="dokument">
      |    <h1>Enkel lov</h1>
      |    <article class="legalP" id="ledd-1">
      |      Dette er foerste ledd i en enkel lov.
      |    </article>
      |    <article class="legalP" id="ledd-2">
      |      Dette er andre ledd.
      |    </article>
      |  </main>
      |</body>
      |</html>""".stripMargin

  private val lawWithListXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html lang="no">
      |<body>
      |  <main class="documentBody" id="dokument">
      |    <h1>Lov med liste</h1>
      |    <section class="section">
      |      <h2>Kapittel 1</h2>
      |      <article class="legalArticle" data-lovdata-URL="NL/lov/2024/p1" id="paragraf-1">
      |        <h2 class="legalArticleHeader">
      |          <span class="legalArticleValue">&#167; 1</span>
      |        </h2>
      |        <article class="legalP" id="paragraf-1-ledd-1">
      |          Loven gjelder for:
      |          <ol>
      |            <li data-name="a)">foretak som driver virksomhet</li>
      |            <li data-name="b)">personer som arbeider i slik virksomhet</li>
      |            <li data-name="c)">alle andre som beroeres</li>
      |          </ol>
      |          <p class="leddfortsettelse">Dette er en fortsettelse etter listen.</p>
      |        </article>
      |      </article>
      |    </section>
      |  </main>
      |</body>
      |</html>""".stripMargin

  // reference `:162-180` — two small ledd merge into one chunk
  test("standard law: small ledd merge into one chunk with metadata") {
    val chunks = chunker.chunk(standardLawXml)
    assert(chunks.length == 1, "small ledd should be merged into 1 chunk")
    val c = chunks.head
    assert(c.paragraphRef == "§ 1")
    assert(c.paragraphTitle == "Formaal")
    assert(c.leddNumber == 1)
    assert(c.documentTitle == "Testlov")
    assert(c.text.toLowerCase.contains("foerste ledd"))
    assert(c.text.toLowerCase.contains("andre ledd"))
    assert(c.merged)
    assert(c.mergedWith == Seq("paragraf-1-ledd-2"))
  }

  // reference `:183-190`
  test("hierarchical context extraction") {
    for (c <- chunker.chunk(standardLawXml)) {
      assert(c.documentTitle == "Testlov")
      assert(c.sectionHeading == "Kapittel 1. Innledning")
      assert(c.chapterPath.contains("Kapittel 1. Innledning"))
    }
  }

  // reference `:192-197`
  test("chunk ids are unique and chunkIndex is positional") {
    val chunks = chunker.chunk(standardLawXml)
    assert(chunks.map(_.chunkId).distinct.length == chunks.length)
    assert(chunks.map(_.chunkIndex) == chunks.indices)
  }

  // reference `:199-205`
  test("token counts are positive and within max") {
    for (c <- chunker.chunk(standardLawXml)) {
      assert(c.tokenCount > 0)
      assert(c.tokenCount <= 500)
    }
  }

  // reference `:212-229`
  test("change law: sections group legalP into section- chunks") {
    val chunks = chunker.chunk(changeLawXml)
    assert(chunks.nonEmpty)
    assert(chunks.head.chunkId.startsWith("section-"))
    assert(chunks.head.sectionHeading == "I" || chunks.head.documentTitle.nonEmpty)
    val grouped = new LovdataChunker(targetTokens = 200, maxTokens = 500).chunk(changeLawXml)
    assert(grouped.nonEmpty)
  }

  // reference `:236-258`
  test("simple law: direct legalP children, aggressive merge") {
    val chunks = chunker.chunk(simpleLawXml)
    assert(chunks.nonEmpty && chunks.length <= 2)
    for (c <- chunks) assert(c.documentTitle == "Enkel lov")
    if (chunks.length == 1) {
      assert(chunks.head.merged)
      assert(chunks.head.mergedWith.nonEmpty)
    }
  }

  // reference `:260-281`
  test("law with no legalP produces no chunks") {
    val xml = """<html><body><main class="documentBody"><h1>Tom lov</h1></main></body></html>"""
    assert(chunker.chunk(xml).isEmpty)
  }

  // reference `:433-449`
  test("empty body produces no chunks") {
    assert(chunker.chunk("""<html><body></body></html>""").isEmpty)
  }

  // reference `:281-299`
  test("list markers and continuation preserved") {
    val chunks = chunker.chunk(lawWithListXml)
    assert(chunks.nonEmpty)
    val text = chunks.head.text
    assert(text.contains("a) foretak som driver virksomhet"))
    assert(text.contains("b) personer som arbeider"))
    assert(text.contains("c)"))
    assert(text.toLowerCase.contains("fortsettelse etter listen"))
  }

  private def longLawXml(nSentences: Int, title: Option[String]) = {
    val long = (0 until nSentences).map(i => s"Dette er setning nummer $i.").mkString(" ")
    val titleSpan = title.map(t => s"""<span class="legalArticleTitle">$t</span>""").getOrElse("")
    s"""<html><body><main class="documentBody"><h1>Lang lov</h1>
       |<section class="section">
       |  <article class="legalArticle" id="para-1">
       |    <h2 class="legalArticleHeader"><span class="legalArticleValue">&#167; 5</span>$titleSpan</h2>
       |    <article class="legalP" id="para-1-ledd-1">$long</article>
       |  </article>
       |</section></main></body></html>""".stripMargin
  }

  // reference `:305-340`
  test("large ledd splits into multiple chunks within max") {
    val chunks = chunker.chunk(longLawXml(200, None))
    assert(chunks.length > 1, "large ledd should split")
    for (c <- chunks) assert(c.tokenCount <= 500)
  }

  // reference `:342-378`
  test("split chunks preserve paragraph metadata") {
    val chunks = chunker.chunk(longLawXml(200, Some("Lang paragraf")))
    for (c <- chunks) {
      assert(c.paragraphRef == "§ 5")
      assert(c.paragraphTitle == "Lang paragraf")
      assert(c.leddNumber == 1)
    }
  }

  // reference `:384-427` — the overlap mechanism
  test("sentence-split chunks overlap") {
    val ck = new LovdataChunker(targetTokens = 50, maxTokens = 500, minTokens = 10, overlapRatio = 0.2)
    val chunks = ck.chunk(longLawXml(120, None))
    assert(chunks.length > 1)
    val overlapping = chunks.sliding(2).count {
      case Seq(a, b) =>
        val sa = a.text.split("(?<=\\.)\\s+").toSet
        val sb = b.text.split("(?<=\\.)\\s+").toSet
        sa.intersect(sb).nonEmpty
      case _ => false
    }
    assert(overlapping > 0, "consecutive chunks should share overlap sentences")
  }

  // W3: nested sections collect outermost-first chapter paths
  test("nested sections build outermost-first chapter path") {
    // note: section heading lookup is first h2-anywhere (reference
    // `_get_section_heading` uses `.//h2` before h3/h4), so the inner
    // section's own h2 must precede the article header in document order
    val xml =
      """<html><body><main class="documentBody"><h1>Lov</h1>
        |<section class="section"><h2>Del 1</h2>
        |  <section class="section"><h2>Kapittel 2</h2>
        |    <article class="legalArticle" id="p1">
        |      <h2 class="legalArticleHeader"><span class="legalArticleValue">&#167; 1</span></h2>
        |      <article class="legalP" id="p1-l1">Tekst her.</article>
        |    </article>
        |  </section>
        |</section></main></body></html>""".stripMargin
    val chunks = chunker.chunk(xml)
    assert(chunks.length == 1)
    assert(chunks.head.chapterPath == Seq("Del 1", "Kapittel 2"), "outermost first")
    assert(chunks.head.sectionHeading == "Kapittel 2", "nearest section wins")
  }

  // reference `:450-480`
  test("paragraph without title yields empty paragraphTitle") {
    val xml =
      """<html><body><main class="documentBody"><h1>Test</h1>
        |<section class="section">
        |  <article class="legalArticle" id="para-1">
        |    <h2 class="legalArticleHeader"><span class="legalArticleValue">&#167; 1</span></h2>
        |    <article class="legalP" id="para-1-ledd-1">Text without title.</article>
        |  </article>
        |</section></main></body></html>""".stripMargin
    val chunks = chunker.chunk(xml)
    assert(chunks.length == 1)
    assert(chunks.head.paragraphTitle == "")
  }

  // reference `:483-515`
  test("cross references extracted from hrefs") {
    val xml =
      """<html><body><main class="documentBody"><h1>Test</h1>
        |<section class="section">
        |  <article class="legalArticle" id="para-1">
        |    <h2 class="legalArticleHeader"><span class="legalArticleValue">&#167; 1</span></h2>
        |    <article class="legalP" id="para-1-ledd-1">
        |      Se <a href="/lov/2020/p5">p 5</a> og <a href="/lov/2020/p10">p 10</a>.
        |    </article>
        |  </article>
        |</section></main></body></html>""".stripMargin
    val chunks = chunker.chunk(xml)
    assert(chunks.length == 1)
    assert(chunks.head.crossRefs.contains("/lov/2020/p5"))
    assert(chunks.head.crossRefs.contains("/lov/2020/p10"))
  }

  // reference `:521-571` — boundary inclusion (<= max, not <)
  test("chunk exactly at max tokens is included") {
    val ck = new LovdataChunker(targetTokens = 50, maxTokens = 100)
    val sentence = "This is a test sentence. "
    var text = ""
    while (WordSymbolTokenizer.countTokens(text + sentence) <= 100) text += sentence
    val xml =
      s"""<html><body><main class="documentBody"><h1>Test</h1>
         |<section class="section">
         |  <article class="legalArticle" id="para-1">
         |    <h2 class="legalArticleHeader"><span class="legalArticleValue">&#167; 1</span></h2>
         |    <article class="legalP" id="para-1-ledd-1">${text.trim}</article>
         |  </article>
         |</section></main></body></html>""".stripMargin
    val chunks = ck.chunk(xml)
    assert(chunks.nonEmpty)
    for (c <- chunks) assert(c.tokenCount <= 100)
  }

  // reference `:573-614` — oversized list part is dropped, not emitted
  test("oversized list part is dropped") {
    val ck = new LovdataChunker(targetTokens = 10, maxTokens = 20)
    val longItem = Seq.fill(50)("word").mkString(" ")
    val xml =
      s"""<html><body><main class="documentBody"><h1>Test</h1>
         |<section class="section">
         |  <article class="legalArticle" id="para-1">
         |    <h2 class="legalArticleHeader"><span class="legalArticleValue">&#167; 1</span></h2>
         |    <article class="legalP" id="para-1-ledd-1"><ol>
         |      <li data-name="a)">$longItem</li>
         |    </ol></article>
         |  </article>
         |</section></main></body></html>""".stripMargin
    val chunks = ck.chunk(xml)
    // tier 1 drops the oversized part (no "-part" chunk); the document then
    // falls through to tier 2, mirroring the reference's fallback order
    assert(!chunks.exists(_.chunkId.contains("-part")), "oversized part must be dropped")
  }

  // A4: exact grouping boundaries of the change-law budget fold
  test("change-law fold groups legalP by token budget exactly") {
    // 5-token paragraphs ("one two three four five."→ 6 tokens each incl '.')
    val para = "alpha beta gamma delta epsilon." // 6 tokens
    val xml =
      s"""<html><body><section class="section"><h2>I</h2>
         |${(1 to 5).map(i => s"""<article class="legalP" id="p$i">$para</article>""").mkString("\n")}
         |</section></body></html>""".stripMargin
    // target 13 → fits two paragraphs (12), third would exceed → groups of 2,2,1
    val ck = new LovdataChunker(targetTokens = 13, maxTokens = 1000, minTokens = 1)
    val chunks = ck.chunk(xml)
    assert(chunks.map(_.leddNumber) == Seq(2, 2, 1), "legalp_count per grouped chunk")
    assert(chunks.map(_.chunkId) == Seq("section-p1", "section-p3", "section-p5"))
    assert(chunks.head.tokenCount == 12)
    assert(chunks.head.text == s"$para\n\n$para")
  }

  // W1: exact overlap window advance — i = max(i+1, j - overlapCount)
  test("overlap window advances by window size minus overlap") {
    // 12 sentences, 4 tokens each ("s N tok ." → ["s",N,"tok","."])
    val text = (1 to 12).map(i => s"s $i tok.").mkString(" ")
    val sentences = (1 to 12).map(i => s"s $i tok.")
    // target 16 → 4 sentences per window; overlap = 16*0.25 = 4;
    // overlapCount = max(1, 12*4/16) = 3 → step = j - 3 = i + 1
    val ck = new LovdataChunker(targetTokens = 16, maxTokens = 20, minTokens = 1, overlapRatio = 0.25)
    val xml =
      s"""<html><body><section class="section">
         |<article class="legalArticle" id="p1">
         |<h2><span class="legalArticleValue">&#167; 1</span></h2>
         |<article class="legalP" id="l1">$text</article>
         |</article></section></body></html>""".stripMargin
    val chunks = ck.chunk(xml)
    assert(chunks.length > 2)
    assert(chunks.head.text == sentences.slice(0, 4).mkString(" "))
    assert(chunks(1).text == sentences.slice(1, 5).mkString(" "), "advance by 1, keep 3 overlap")
  }

  // C17: tail text after child elements is preserved
  test("ledd text keeps child tail text in order") {
    val xml =
      """<html><body><section class="section">
        |<article class="legalArticle" id="p1">
        |<h2><span class="legalArticleValue">&#167; 1</span></h2>
        |<article class="legalP" id="l1">Lead text <span>inner</span> tail text.</article>
        |</article></section></body></html>""".stripMargin
    val chunks = new LovdataChunker(targetTokens = 50, maxTokens = 100, minTokens = 1).chunk(xml)
    assert(chunks.head.text == "Lead text inner tail text.")
  }

  // ---- merge fold unit coverage (reference `:707-829` semantics) ----

  private def mk(id: String, tokens: Int): Chunk = Chunk(
    chunkId = id, chunkIndex = 0, text = s"text-$id", tokenCount = tokens,
    paragraphRef = "", paragraphTitle = "", sectionHeading = "", documentTitle = "",
    chapterPath = Seq.empty, address = "", url = "", crossRefs = Seq.empty,
    leddNumber = 1, merged = false, mergedWith = Seq.empty
  )

  test("merge fold: consecutive small chunks accumulate to min") {
    val ck = new LovdataChunker(targetTokens = 768, maxTokens = 8191, minTokens = 300)
    val out = ck.mergeSmallChunks(Seq(mk("a", 100), mk("b", 100), mk("c", 100), mk("d", 400)))
    assert(out.length == 2)
    assert(out.head.chunkId == "a")
    assert(out.head.tokenCount == 300)
    assert(out.head.merged)
    assert(out.head.mergedWith == Seq("b", "c"))
    assert(out(1).chunkId == "d" && !out(1).merged)
  }

  test("merge fold: trailing small chunk merges backward") {
    val ck = new LovdataChunker(targetTokens = 768, maxTokens = 8191, minTokens = 300)
    val out = ck.mergeSmallChunks(Seq(mk("a", 350), mk("b", 50)))
    assert(out.length == 1)
    assert(out.head.tokenCount == 400)
    assert(out.head.merged)
    assert(out.head.mergedWith == Seq("b"))
    assert(out.head.text == "text-a\n\ntext-b")
  }

  test("merge fold: trailing small chunk stays when combine exceeds max") {
    val ck = new LovdataChunker(targetTokens = 768, maxTokens = 400, minTokens = 300)
    val out = ck.mergeSmallChunks(Seq(mk("a", 390), mk("b", 50)))
    assert(out.length == 2)
    assert(!out(1).merged)
  }

  test("merge fold: single chunk untouched") {
    val ck = new LovdataChunker()
    val out = ck.mergeSmallChunks(Seq(mk("a", 10)))
    assert(out == Seq(mk("a", 10)))
  }
}
