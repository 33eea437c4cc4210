package graft.functions

import graft.SparkSpec
import graft.chunker.LovdataChunker
import graft.config.Settings

/** End-to-end coverage of the cl100k-parity path (SURVEY §7 module 2):
  * the COMMITTED toy rank table (`tools/fixtures/toy.tiktoken`, trained by
  * BpeTrainer via FixtureGen, stored in the published .tiktoken format)
  * through the real file loader, the Settings `--tokenizer=bpe:<file>`
  * resolution, and the chunker's token budgets. The battery twin is
  * `s2_chunker_bpe_stats` (golden-fixture oracle); this spec pins the laws.
  */
class BpeE2ESpec extends SparkSpec {

  private val rankPath = "/root/repo/tools/fixtures/toy.tiktoken"
  private def available = new java.io.File(rankPath).exists()

  private lazy val bpe = BpeTokenCounter.fromTiktokenFile(rankPath, "toy-bpe")

  test("the committed rank table loads and respects the BPE rank invariant") {
    assume(available)
    // 256 byte tokens + at least a handful of learned merges
    assert(bpe.ranks.size > 256)
    // every merged token must be buildable: SOME split into two table
    // tokens with both ranks strictly lower (the pair it was merged from —
    // other splits may hit tokens learned later, which is fine)
    bpe.ranks.filter(_._1.length > 1).foreach { case (tok, rank) =>
      val buildable = (1 until tok.length).exists { cut =>
        val (a, b) = (tok.substring(0, cut), tok.substring(cut))
        bpe.ranks.get(a).exists(_ < rank) && bpe.ranks.get(b).exists(_ < rank)
      }
      assert(buildable, s"token '$tok' ($rank) has no lower-ranked build pair")
    }
  }

  test("encode/decode round-trips bytes exactly, including multi-byte chars") {
    assume(available)
    val samples = Seq(
      "Kongeriket Norges Grunnlov av 1814 § 2",
      "lov om endringer i straffeloven — æøå ÆØÅ",
      "   leading and   internal\t whitespace\n preserved ",
      "ingen ændring: l'état, c'est 42.7%"
    )
    samples.foreach { s =>
      assert(bpe.decode(bpe.encode(s)) == s, s"round-trip broke on: $s")
      assert(bpe.countTokens(s) == bpe.encode(s).length)
    }
  }

  test("merges actually fire: common corpus words cost fewer tokens than bytes") {
    assume(available)
    // the table was trained on the testdata corpus, so at least one common
    // English/Norwegian function word must have a learned multi-byte token
    val words = Seq("the", "and", "som", "det", "ing", "er")
    assert(words.exists(w => bpe.countTokens(w) < w.length),
      s"no merge fired on any of $words - the table is degenerate")
  }

  test("Settings --tokenizer=bpe:<file> resolves to the same counter") {
    assume(available)
    val s = Settings(tokenizer = s"bpe:$rankPath")
    val counter = s.tokenCounter
    assert(counter.isInstanceOf[BpeTokenCounter])
    val probe = "lov om endring av lov 1814"
    assert(counter.countTokens(probe) == bpe.countTokens(probe))
  }

  test("the chunker honors token budgets under the BPE counter") {
    assume(available)
    // budgets sized to the tokenizer's granularity: the toy table merges
    // little (~1.3 bytes/token), so a ~60-char sentence costs ~50 tokens —
    // a word-tokenizer-sized target would put every full sentence over
    // target and the window (reference semantics) would drop them all
    val maxTokens = 500
    val ck = new LovdataChunker(
      targetTokens = 200, maxTokens = maxTokens, minTokens = 30, tokens = bpe)
    val body = (1 to 60).map(i =>
      s"Dette er setning nummer $i i paragrafen om endringer og tillegg.").mkString(" ")
    // the battery's own XML synthesizer — the same document shape
    // s2_chunker_bpe_stats feeds the chunker. docId 3 → standard law, the
    // form whose oversized ledd sentences split within maxTokens (change
    // laws group whole sections and treat maxTokens as a heuristic guard)
    val xml = graft.queries.PipelineQueries.synthXml(3L, body)
    val chunks = ck.chunk(xml)
    info(s"${chunks.length} chunks, tokenCounts ${chunks.map(_.tokenCount).min}..${chunks.map(_.tokenCount).max}")
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      // the chunker accumulates per-sentence counts (the reference's
      // accounting); BPE is not additive across the join — the cl100k
      // pretokenizer glues each space to the following word — so the
      // whole-text recount may drift by ~1 token per boundary, never more
      val recount = bpe.countTokens(c.text)
      assert(math.abs(recount - c.tokenCount) <= c.text.count(_ == '\n') +
        c.text.split("(?<=[.!?])\\s+").length + 2,
        s"chunk ${c.chunkId}: accumulated ${c.tokenCount} vs recount $recount")
      assert(c.tokenCount <= maxTokens,
        s"chunk ${c.chunkId} exceeds maxTokens: ${c.tokenCount} > $maxTokens")
    }
    // the long paragraph really was split under the tighter byte-level counts
    assert(chunks.length > 1)
  }
}
