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
