package graft.functions

/** Deterministic tokenizer behind a trait (SURVEY.md §7 module 2; C1/C2).
  *
  * The reference counts cl100k_base BPE tokens (`domain/splitters/token_counter.py:25-34`)
  * and hard-splits on token boundaries (`token_counter.py:58-79`). Exact BPE
  * byte-parity is not required for engine-internal consistency — what matters
  * is that the same counter is used at chunk time and at query/test time. The
  * default implementation is a word-or-symbol scanner whose counts are also
  * expressible in ANSI SQL (see [[TextFunctions.tokenCount]]), so oracles can
  * check it.
  */
trait TokenCounter extends Serializable {
  def countTokens(text: String): Int
  def encode(text: String): Array[String]
  def decode(tokens: Array[String]): String

  /** C2: token-boundary hard split — encode, slice every `maxTokens`, decode. */
  def hardSplit(text: String, maxTokens: Int): Seq[String] = {
    val toks = encode(text)
    if (toks.isEmpty) Seq.empty
    else toks.grouped(maxTokens).map(decode).toSeq
  }
}

/** Word-or-symbol tokenizer: maximal `[A-Za-z0-9]+` runs, every other
  * non-space character is its own token. Whitespace is dropped by `encode`
  * and re-inserted as single spaces by `decode` (deterministic round-trip
  * for counting purposes; not byte-identity).
  */
object WordSymbolTokenizer extends TokenCounter {
  private val pattern = "[A-Za-z0-9]+|[^\\sA-Za-z0-9]".r

  override def countTokens(text: String): Int =
    if (text == null) 0 else pattern.findAllIn(text).size

  override def encode(text: String): Array[String] =
    if (text == null) Array.empty else pattern.findAllIn(text).toArray

  override def decode(tokens: Array[String]): String = tokens.mkString(" ")
}
