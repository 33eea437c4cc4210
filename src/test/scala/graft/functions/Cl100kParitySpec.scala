package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact parity with the reference's real tokenizer (tiktoken
  * cl100k_base — `domain/splitters/token_counter.py:25-34`): the single
  * biggest chunk-boundary divergence risk SURVEY §7 names.
  *
  * The ~1.6 MB public rank file cannot ship from inside the zero-egress
  * sandbox; `tools/fetch_cl100k.sh` documents the one-command fetch. This
  * spec CANCELS (does not pass vacuously) while the file is absent and,
  * once it is present, pins [[BpeTokenCounter]] against token sequences
  * published with tiktoken itself — ids, not just counts, so a merge-order
  * or pretokenizer bug cannot hide behind a lucky count.
  */
class Cl100kParitySpec extends AnyFunSuite {

  private val rankFile = new java.io.File("tools/fixtures/cl100k_base.tiktoken")

  private def ids(enc: BpeTokenCounter, text: String): Seq[Int] =
    enc.encode(text).toSeq.map(enc.ranks)

  test("published tiktoken outputs reproduce byte-exactly") {
    assume(rankFile.exists,
      s"cl100k_base.tiktoken absent — run tools/fetch_cl100k.sh (needs egress)")
    val enc = BpeTokenCounter.fromTiktokenFile(rankFile.getPath)
    assert(enc.ranks.size > 100000, "full rank table loaded")
    // the example published in tiktoken's own README
    assert(ids(enc, "tiktoken is great!") == Seq(83, 1609, 5963, 374, 2294, 0))
    assert(ids(enc, "hello world") == Seq(15339, 1917))
    // decode is the exact inverse on these
    assert(enc.decode(enc.encode("tiktoken is great!")) == "tiktoken is great!")
    // count used by the chunker equals the id-sequence length
    assert(enc.countTokens("tiktoken is great!") == 6)
    assert(enc.countTokens("hello world") == 2)
  }
}
