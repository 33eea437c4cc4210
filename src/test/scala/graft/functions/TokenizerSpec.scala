package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

/** C1/C2 tokenizer behavior (reference `domain/splitters/token_counter.py`). */
class TokenizerSpec extends AnyFunSuite {

  test("counts words and symbols") {
    assert(WordSymbolTokenizer.countTokens("hello world") == 2)
    assert(WordSymbolTokenizer.countTokens("hello, world!") == 4)
    assert(WordSymbolTokenizer.countTokens("") == 0)
    assert(WordSymbolTokenizer.countTokens(null) == 0)
    assert(WordSymbolTokenizer.countTokens("a1b2 c3") == 2)
  }

  test("hard split respects max tokens per part (reference token_counter.py:58-79)") {
    val text = (1 to 25).map(i => s"word$i").mkString(" ")
    val parts = WordSymbolTokenizer.hardSplit(text, 10)
    assert(parts.length == 3)
    assert(parts.forall(p => WordSymbolTokenizer.countTokens(p) <= 10))
    assert(WordSymbolTokenizer.hardSplit("", 10).isEmpty)
  }

  test("BPE: merges follow ascending rank until no pair is in the vocab") {
    // vocab implies the merge chain h+e → he, l+l → ll, ll+o → llo, he+llo → hello
    val bpe = BpeTokenCounter.fromVocab(Seq("he", "ll", "llo", "hello"))
    assert(bpe.encode("hello").toSeq == Seq("hello"))
    assert(bpe.countTokens("hello") == 1)
    // 'help': h+e merges, 'lp' has no rank → he l p
    assert(bpe.encode("help").toSeq == Seq("he", "l", "p"))
    assert(bpe.countTokens("help") == 3)
    // unseen text falls back to single bytes per pretoken
    assert(bpe.countTokens("xyz") == 3)
    assert(bpe.countTokens("") == 0 && bpe.countTokens(null) == 0)
  }

  test("BPE: cl100k-style pretokenizer splits contractions, digits, punctuation") {
    val bpe = BpeTokenCounter.fromVocab(Seq.empty)
    // with no merges, token count = UTF-8 byte count; pretokens partition text
    assert(bpe.decode(bpe.encode("it's 1234, ok?\nnæste")) == "it's 1234, ok?\nnæste")
    // digit runs cap at 3 per pretoken piece: "1234" → "123" + "4" (byte tokens here)
    val withDigits = BpeTokenCounter.fromVocab(Seq("12", "123", "1234"))
    assert(withDigits.encode("1234").toSeq == Seq("123", "4"),
      "\\p{N}{1,3} must stop a 4-digit run from merging into one token")
  }

  test("BPE: decode is byte-lossless; hard split preserves ASCII exactly") {
    val bpe = BpeTokenCounter.fromVocab(Seq("se", "nt", "sent"))
    // full-text round trip keeps every byte, unicode and odd spacing included
    val uni = "sentences,  with   odd spacing\nand æøå unicode"
    assert(bpe.decode(bpe.encode(uni)) == uni)
    // hard split re-joins losslessly on single-byte text (like tiktoken's
    // split_by_tokens, a boundary inside a multi-byte char is decode-lossy)
    val ascii = "sentences,  with   odd spacing\nand plain ascii"
    val parts = bpe.hardSplit(ascii, 5)
    assert(parts.mkString == ascii, "split parts must concatenate to the exact input")
    assert(parts.forall(p => bpe.encode(p).length <= 6))
  }

  test("BPE: tiktoken rank-file loader round-trips base64 token/rank lines") {
    val dir = java.nio.file.Files.createTempDirectory("bpe")
    val file = dir.resolve("mini.tiktoken")
    val b64 = java.util.Base64.getEncoder
    def enc(s: String) = b64.encodeToString(s.getBytes("UTF-8"))
    val lines = ((0 until 256).map(b => b64.encodeToString(Array(b.toByte)) + s" $b") ++
      Seq(enc("th") + " 256", enc("the") + " 257")).mkString("\n")
    java.nio.file.Files.write(file, lines.getBytes("UTF-8"))
    val bpe = BpeTokenCounter.fromTiktokenFile(file.toString)
    assert(bpe.encode("the").toSeq == Seq("the"))
    assert(bpe.countTokens("this") == 3) // th + i + s
    assert(bpe.name == "cl100k_base")
  }

  test("chunker produces equivalent structure under either token counter") {
    val xml = "<html><body><main class=\"documentBody\"><h1>L</h1>\n" +
      (1 to 12).map(i => s"<article class=\"legalP\" id=\"d-l$i\">Sentence number $i is here.</article>").mkString("\n") +
      "\n</main></body></html>"
    val bpe = BpeTokenCounter.fromVocab(Seq("Se", "en", "ent", "Sent", "nce", "Sente"))
    val wordChunks = new graft.chunker.LovdataChunker(100, 150, 50, 0.15).chunk(xml)
    val bpeChunks = new graft.chunker.LovdataChunker(100, 150, 50, 0.15, tokens = bpe).chunk(xml)
    assert(wordChunks.nonEmpty && bpeChunks.nonEmpty)
    // same documents, same text content overall; counts differ by tokenizer
    assert(bpeChunks.map(_.text).mkString.contains("Sentence number 1"))
    assert(bpeChunks.forall(_.tokenCount > 0))
  }

  test("property: BPE decode∘encode is identity; count equals encode length") {
    val bpe = BpeTokenCounter.fromVocab(Seq("ab", "bc", "abc", "the", "he"))
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("the", "abc", "ab c", "æøå", " ")))
      .map(_.mkString(" "))
    val prop = forAll(gen) { text =>
      bpe.decode(bpe.encode(text)) == text &&
        bpe.countTokens(text) == bpe.encode(text).length
    }
    assert(check(Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("property: count equals encode length; split parts re-count within bound") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.mkString(" "))
    val prop = forAll(wordGen) { text =>
      val parts = WordSymbolTokenizer.hardSplit(text, 5)
      WordSymbolTokenizer.countTokens(text) == WordSymbolTokenizer.encode(text).length &&
        parts.forall(p => WordSymbolTokenizer.countTokens(p) <= 5) &&
        parts.map(WordSymbolTokenizer.countTokens).sum == WordSymbolTokenizer.countTokens(text)
    }
    assert(check(Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }
}
