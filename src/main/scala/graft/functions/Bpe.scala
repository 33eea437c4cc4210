package graft.functions

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.Base64
import java.util.regex.Pattern

/** Byte-level BPE token counter (reference
  * `domain/splitters/token_counter.py:25-34`: tiktoken `cl100k_base`).
  *
  * Implements the published tiktoken algorithm: split text with the
  * cl100k-style pretokenizer regex, UTF-8-encode each piece, then repeatedly
  * merge the adjacent token pair whose concatenated bytes have the lowest
  * rank in the vocabulary until no mergeable pair remains. With the real
  * cl100k_base rank table (the public `.tiktoken` file: one
  * `base64(tokenBytes) rank` pair per line, loadable via
  * [[BpeTokenCounter.fromTiktokenFile]]) this reproduces the reference's
  * token counts byte-for-byte, so chunk boundaries match a store produced by
  * the Python pipeline. This sandbox has no network access to fetch that
  * file, so tests pin the algorithm with a small embedded vocabulary
  * ([[BpeTokenCounter.fromVocab]]); the loader accepts the real table
  * unchanged.
  *
  * Token strings are ISO-8859-1-encoded byte sequences: concatenating the
  * encoded tokens reproduces the exact input bytes, so [[TokenCounter
  * .hardSplit]] is byte-lossless here (unlike the whitespace-normalizing
  * [[WordSymbolTokenizer]]).
  */
final class BpeTokenCounter(
    /** byte-string (ISO-8859-1 key) → rank; lower rank merges first. */
    val ranks: Map[String, Int],
    val name: String
) extends TokenCounter {

  /** cl100k_base pretokenizer (published with tiktoken): contractions,
    * letter runs with optional leading non-letter, 1-3 digit runs,
    * punctuation runs, newline and whitespace handling.
    */
  @transient private lazy val pretokenizer: Pattern = Pattern.compile(
    "'(?i:[sdmt]|ll|ve|re)|[^\\r\\n\\p{L}\\p{N}]?+\\p{L}+|\\p{N}{1,3}|" +
      " ?[^\\s\\p{L}\\p{N}]++[\\r\\n]*|\\s*[\\r\\n]|\\s+(?!\\S)|\\s+"
  )

  private def pretokens(text: String): Iterator[String] = {
    val m = pretokenizer.matcher(text)
    new Iterator[String] {
      private var ready = m.find()
      def hasNext: Boolean = ready
      def next(): String = { val p = m.group(); ready = m.find(); p }
    }
  }

  /** tiktoken's byte-pair merge over one pretokenized piece. */
  private def encodePiece(piece: String): Vector[String] = {
    var parts: Vector[String] =
      piece.getBytes(UTF_8).map(b => new String(Array(b), ISO_8859_1)).toVector
    var done = parts.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrElse(parts(i) + parts(i + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        parts = parts.patch(best, Seq(parts(best) + parts(best + 1)), 2)
        if (parts.length < 2) done = true
      }
    }
    parts
  }

  override def countTokens(text: String): Int =
    if (text == null || text.isEmpty) 0
    else pretokens(text).map(encodePiece(_).length).sum

  override def encode(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else pretokens(text).flatMap(encodePiece).toArray

  /** Byte-exact: tokens are byte strings partitioning the UTF-8 input. */
  override def decode(tokens: Array[String]): String =
    new String(tokens.mkString.getBytes(ISO_8859_1), UTF_8)
}

object BpeTokenCounter {

  /** Load a `.tiktoken` rank table: one `base64(tokenBytes) rank` per line
    * (the published file format; cl100k_base.tiktoken works unchanged).
    */
  def fromTiktokenFile(path: String, name: String = "cl100k_base"): BpeTokenCounter = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val ranks = src.getLines().filter(_.trim.nonEmpty).map { line =>
        val Array(b64, rank) = line.trim.split("\\s+", 2)
        new String(Base64.getDecoder.decode(b64), ISO_8859_1) -> rank.trim.toInt
      }.toMap
      new BpeTokenCounter(ranks, name)
    } finally src.close()
  }

  /** Build a rank table from a merged-token list for tests/small domains:
    * all 256 single bytes rank 0..255, then `merged(i)` at rank 256+i —
    * the same ordering invariant the real table has (a token's rank exceeds
    * the ranks of the pair that builds it).
    */
  def fromVocab(merged: Seq[String], name: String = "test-vocab"): BpeTokenCounter = {
    val bytes = (0 until 256).map(b => new String(Array(b.toByte), ISO_8859_1) -> b)
    val mergedRanks = merged.zipWithIndex.map { case (t, i) =>
      new String(t.getBytes(UTF_8), ISO_8859_1) -> (256 + i)
    }
    new BpeTokenCounter((bytes ++ mergedRanks).toMap, name)
  }
}
