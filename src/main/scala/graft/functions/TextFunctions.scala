package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text operators (SURVEY.md §2.9 C-series + the text-analysis
  * extensions). Everything here is built from `org.apache.spark.sql.functions`
  * so it stays inside whole-stage codegen — no UDFs on the hot path.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed string. */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** C1 (relational form): deterministic token count — word-or-symbol
    * tokens, a BPE-ish approximation that any ANSI oracle can recompute via
    * `len(regexp_extract_all(c, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))`. (The
    * reference counts cl100k_base BPE tokens, `token_counter.py:25-34`; our
    * engine is internally consistent instead — SURVEY §7 module 2.)
    *
    * Uses the native codegen [[graft.expressions.TokenCount]] when the
    * session has [[graft.expressions.GraftExtensions]] registered (single
    * byte scan, no regex, no array materialization); falls back to the
    * equivalent built-in composition otherwise.
    */
  def tokenCount(c: Column): Column = {
    val native = org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      scala.util.Try(s.catalog.functionExists("token_count")).getOrElse(false)
    }
    if (native) call_function("token_count", c)
    else size(regexp_extract_all(c, lit("[A-Za-z0-9]+|[^\\sA-Za-z0-9]"), lit(0))).cast("long")
  }

  /** C3: sentence split on terminal punctuation (Java regex lookbehind,
    * reference `lovdata_chunker.py:436,497`).
    */
  def sentenceSplit(c: Column): Column = split(c, "(?<=[.!?])\\s+")

  /** C4: `(\d{4}-\d{2}-\d{2})` date extraction from a dokid
    * (reference `metadata_enrichment_service.py:160-165`).
    */
  def extractDate(c: Column): Column =
    to_date(regexp_extract(c, "(\\d{4}-\\d{2}-\\d{2})", 1))

  /** C5: paragraph-ref extraction → `§ n`
    * (reference `metadata_enrichment_service.py:190-194`).
    */
  def paragraphRef(c: Column): Column = {
    val n = regexp_extract(c, "(?:paragraf-|§\\s*)(\\d+[a-z]?)", 1)
    when(n =!= "", concat(lit("§ "), n)).otherwise(lit(null).cast("string"))
  }

  /** C6: all lovdata refs in free text
    * (reference `metadata_enrichment_service.py:253-258`).
    */
  def lovdataRefs(c: Column): Column =
    regexp_extract_all(c, lit("lov/\\d{4}-\\d{2}-\\d{2}-\\d+"), lit(0))

  /** C7: keep hrefs with the `lov/` prefix (reference `metadata_enrichment_service.py:241-249`). */
  def lovHrefs(arr: Column): Column = filter(arr, x => x.startsWith("lov/"))

  /** C8: cross_refs list ⇄ CSV codec (reference `models.py:115-116`, `cli.py:256-263`). */
  def crossRefsToCsv(arr: Column): Column = concat_ws(",", arr)
  def csvToCrossRefs(c: Column): Column =
    filter(split(c, ","), x => length(x) > 0)

  /** C9: depth = count of `-` in a chunk id (reference `metadata_enrichment_service.py:211-215`). */
  def chunkDepth(c: Column): Column = (size(split(c, "-")) - 1).cast("long")

  /** C12: path stem → doc_id (reference `lovlig.py:88,96`). */
  def pathStem(c: Column): Column =
    regexp_replace(regexp_extract(c, "[^/]+$", 0), "\\.[A-Za-z0-9.]+$", "")

  /** C12: dataset dir = dataset name minus `.tar.bz2`. */
  def datasetDir(c: Column): Column = regexp_replace(c, "\\.tar\\.bz2$", "")

  /** C16: first non-empty of a fallback chain (reference `chunking_service.py:71-80`). */
  def coalesceNonEmpty(cols: Column*): Column =
    coalesce(cols.map(c => when(length(trim(c)) > 0, c)): _*)

  // ---- text-analysis extensions (training-data pipeline operators) ----

  /** Unicode NFC canonical composition — the native codegen
    * [[graft.expressions.NfcNormalize]] when the session has
    * [[graft.expressions.GraftExtensions]] registered, else a UDF fallback
    * (Spark ships no built-in normalization function).
    */
  def nfcNormalize(c: Column): Column = {
    val native = org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      scala.util.Try(s.catalog.functionExists("nfc_normalize")).getOrElse(false)
    }
    if (native) call_function("nfc_normalize", c)
    else udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)).apply(c)
  }

  /** Control characters to scrub: C0 minus `\t`/`\n`, DEL, and the C1 block.
    * Spelled as explicit ranges (NOT `\p{Cc}` intersections — RE2 oracles
    * have no char-class intersection syntax, and Java/RE2 agree on `\x{…}`).
    */
  private val controlCharClass = "[\\x00-\\x08\\x0B-\\x1F\\x7F\\x{80}-\\x{9F}]"

  /** Strip control characters (keeps `\t` and `\n`). */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, controlCharClass, "")

  /** Collapse whitespace runs to single spaces and trim the ends. */
  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** HTML → text extraction — the WET-style primitive every web-crawl
    * pipeline runs before any quality/dedup stage: drop script/style
    * blocks and comments wholesale (their CONTENT is not text), strip
    * remaining tags, decode the five predefined entities plus `&nbsp;`
    * (`&amp;` last, the standard order that never double-decodes), and
    * collapse the whitespace the removals leave behind. Every pattern is
    * RE2-compatible (inline `(?is)` flags, no backreferences), so a SQL
    * oracle replays the chain verbatim. Regex tag-stripping is the
    * deliberate 100 TB trade: a DOM parse per document costs more than
    * the fidelity buys for *training-corpus* extraction (malformed markup
    * degrades to dropped fragments, not failures).
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // entity strings contain no regex metacharacters — plain patterns keep
    // the chain RE2-replayable (\Q…\E quoting would not be)
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (from, to)) =>
        regexp_replace(col0, from, to)
      }
    collapseWhitespace(ent)
  }

  /** Canonical text normalization for dedup/fingerprint stability:
    * NFC composition → control-char strip → whitespace collapse. Run this
    * BEFORE hashing/shingling so visually identical strings from different
    * sources (NFD exports, stray control bytes, ragged whitespace) land in
    * the same dedup bucket.
    */
  def normalizeText(c: Column): Column =
    collapseWhitespace(stripControlChars(nfcNormalize(c)))

  /** Quality signals: length, punctuation ratio, distinct-word ratio,
    * stopword ratio. All codegen'd column arithmetic.
    */
  def distinctWordRatio(c: Column): Column = {
    val toks = wsTokens(c)
    size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,;:!?]", ""))).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "og", "i", "en", "det")

  def stopwordRatio(c: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = wsTokens(lower(c))
    val sw = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: favors mid-length, low-punct,
    * lexically diverse text with some stopword glue.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val diversity = distinctWordRatio(c)
    val glue = least(stopwordRatio(c) * 5.0, lit(1.0))
    round((lenScore + diversity + glue) / 3.0, 6)
  }

  /** Language-ID heuristic: score stopword hits per language, pick argmax.
    * An n-gram-free approximation suited to codegen; real pipelines would
    * plug a model in behind the same column contract.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "la", "los", "y", "de", "un"),
    "no" -> Seq("og", "i", "det", "en", "er", "som")
  )

  /** Column-level let-binding: evaluates `value` ONCE and hands `body` a
    * variable reference to it. Catalyst's subexpression elimination skips
    * subtrees that sit under higher-order-function lambdas, so an expensive
    * expression repeated across N lambda-bearing siblings is recomputed N
    * times (the hoisting trap documented in BENCHNOTES); wrapping it as the
    * input of a 1-element `transform` pins a single evaluation while keeping
    * the whole expression codegen'd.
    */
  private[graft] def letCol(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  def langIdScore(c: Column, lang: String): Column = {
    val toks = wsTokens(lower(c))
    val sw = array(langStopwords(lang).map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  private def langIdScoreOf(toks: Column, lang: String): Column = {
    val sw = array(langStopwords(lang).map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  def langId(c: Column): Column = letCol(wsTokens(lower(c))) { toks =>
    val scored = langStopwords.keys.toSeq.sorted.map { l =>
      struct(langIdScoreOf(toks, l).as("score"), lit(l).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Character-n-gram language ID: score = occurrences of each language's
    * characteristic trigrams in the (lowercased, space-padded) text,
    * normalized by text length; argmax wins. The n-gram-profile method
    * (Cavnar–Trenkle style, truncated to a handful of high-frequency
    * trigrams per language) — still pure codegen'd column arithmetic.
    */
  val langTrigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", " th", "ing", "and", " an", "ion"),
    "de" -> Seq("der", "sch", "ein", "und", "ich", "en "),
    "fr" -> Seq("les", " le", "ent", "des", " de", "que"),
    "es" -> Seq("los", " la", "ión", " de", "que", "ado"),
    "no" -> Seq("det", " og", "en ", " er", "som", "ske")
  )

  /** Non-overlapping occurrences of a literal substring: the native
    * single-scan [[graft.expressions.OccurrenceCount]] when the extensions
    * are registered; the length-minus-replace idiom (which copies the
    * string per pattern) as the no-extensions fallback. Value-identical —
    * both count left-to-right non-overlapping matches.
    */
  def occurrences(c: Column, pat: String): Column = {
    require(pat.nonEmpty, "pattern must be non-empty")
    val native = org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      scala.util.Try(s.catalog.functionExists("occurrence_count")).getOrElse(false)
    }
    if (native) call_function("occurrence_count", c, lit(pat))
    else ((length(c) - length(call_function("replace", c, lit(pat), lit("")))) / lit(pat.length))
      .cast("long")
  }

  private def trigramScore(padded: Column, lang: String): Column =
    langTrigrams(lang).map(g => occurrences(padded, g))
      .reduce(_ + _).cast("double") / greatest(length(padded), lit(1)).cast("double")

  def langIdNgram(c: Column): Column =
    letCol(concat(lit(" "), lower(trim(c)), lit(" "))) { padded =>
      val scored = langTrigrams.keys.toSeq.sorted.map { l =>
        struct(trigramScore(padded, l).as("score"), lit(l).as("lang"))
      }
      array_max(array(scored: _*)).getField("lang")
    }

  /** URL extraction + domain parsing — web-corpus curation primitives.
    * Patterns are RE2-safe (no lookaround) so SQL oracles replay them
    * byte-for-byte.
    */
  val urlRe = "https?://[^\\s]+"

  def extractUrls(c: Column): Column = regexp_extract_all(c, lit(urlRe), lit(0))

  /** The host part of a URL (up to the first `/ : ? #` after the scheme),
    * lowercased — the blocklist join key.
    */
  def urlDomain(u: Column): Column =
    lower(regexp_extract(u, "^https?://([^/:?#]+)", 1))

  /** URL canonicalization — the dedup key for web-crawl corpora: the same
    * page arrives as `HTTP://Site.COM:80/p?utm_source=x#top` and
    * `http://site.com/p`, and URL-keyed dedup/blocklists need one spelling.
    * Steps (every regex RE2-compatible — no lookaround — so a SQL oracle
    * replays the chain): strip the fragment; drop tracking params
    * (`utm_*`, `fbclid`, `gclid`, `ref`); repair the query separator a
    * removed leading param leaves behind (`path&a=1` → `path?a=1`); drop a
    * dangling `?`/`&`; lowercase scheme+host ONLY (paths are
    * case-sensitive); strip default ports (`:80` for http, `:443` for
    * https); strip a trailing slash. Non-URL input passes through the
    * host-lowering step unchanged (the extract matches nothing).
    */
  def canonicalizeUrl(u: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.expressions.CanonicalizeUrl(
        org.apache.spark.sql.graft.ColumnBridge.toExpression(u)))

  /** The composed-builtin twin of [[canonicalizeUrl]] — the 8-step
    * `regexp_replace`/`regexp_extract` chain the DuckDB oracles replay.
    * Kept as the executable specification of the native expression (a
    * property test pins bit-parity); NOT used on hot paths: inside
    * whole-stage codegen the chain expands past janino's 64 KB method
    * limit and silently drops the stage to interpreted execution.
    */
  def canonicalizeUrlComposed(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val noTrack = regexp_replace(noFrag, "[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*", "")
    val sepFixed = regexp_replace(noTrack, "^([^?]*)&", "$1?")
    val noDangle = regexp_replace(sepFixed, "[?&]$", "")
    val hostLowered = concat(
      lower(regexp_extract(noDangle, "(?i)^(https?://[^/:?#]+)", 1)),
      regexp_replace(noDangle, "(?i)^https?://[^/:?#]+", ""))
    val noHttpPort =
      regexp_replace(hostLowered, "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    val noHttpsPort =
      regexp_replace(noHttpPort, "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    regexp_replace(noHttpsPort, "/$", "")
  }

  /** Document fingerprint: first 16 hex chars of sha-256 over the
    * whitespace-normalized, lowercased text — stable across formatting noise.
    */
  def fingerprint(c: Column): Column =
    substring(sha2(regexp_replace(lower(trim(c)), "\\s+", " "), 256), 1, 16)

  /** PII scrubbing — the standard pre-training redaction pass (emails,
    * IPv4 addresses, phone-shaped numbers → typed placeholders). Patterns
    * are deliberately RE2-compatible (no lookaround/backrefs) so the exact
    * same regexes run in Spark's Java engine and a DuckDB oracle; applied
    * email → ip → phone so earlier placeholders can't be re-matched.
    *
    * The IP boundary is an explicit consumed-and-restored `[^0-9.]` class,
    * NOT `\b`: Java's `\b` counts Unicode letters as word characters while
    * RE2's is ASCII-only, so `10.0.0.4ø` would scrub in the oracle but not
    * in the engine. The class form behaves identically in both (and, as a
    * bonus, refuses dotted version strings like `1.2.3.4.5`).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "(^|[^0-9.])([0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3})([^0-9.]|$)"
  val phoneRe = "\\+[0-9][0-9 ()./-]{6,}[0-9]"

  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipv4Re, "$1<IP>$3"),
      phoneRe, "<PHONE>")

  /** C4-style line filtering (Raffel et al. 2020 §2.2): keep only lines
    * that end in terminal punctuation AND have at least `minWords` words;
    * drop the document's other lines and re-join. Lines are split on
    * newline; the whole pass is codegen'd array ops — no UDF, no shuffle.
    */
  def c4LineFilter(c: Column, minWords: Int = 3): Column = {
    val lines = split(c, "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"']\\s*$") &&
        size(split(trim(l), "\\s+")) >= minWords && (length(trim(l)) > 0))
    concat_ws("\n", kept)
  }
}
