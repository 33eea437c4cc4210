package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as ONE native codegen expression — the crawl-corpus
  * dedup key (reference context: URL-keyed page identity; the composed form
  * lives in [[graft.functions.TextFunctions.canonicalizeUrl]]'s scaladoc).
  *
  * Why native: the equivalent 8-step `regexp_replace`/`regexp_extract`
  * chain expands, inside whole-stage codegen, into a generated method
  * exceeding janino's 64 KB limit ("Code grows beyond 64 KB"), silently
  * dropping the WHOLE stage to interpreted execution — the engine's one
  * interpreted hot path at crawl scale (billions of URLs). This expression
  * compiles to a single static call with memoized `java.util.regex`
  * patterns (the [[NfcNormalize]]/[[OccurrenceCount]] discipline), keeping
  * the stage inside codegen.
  *
  * Semantics are BIT-IDENTICAL to the composed chain (a property test
  * pins it), so the DuckDB oracles that replay the RE2-safe chain —
  * `ta_url_canon`, `dd_url_dedup` — hold unchanged. Steps: strip fragment;
  * drop tracking params (`utm_*`, `fbclid`, `gclid`, `ref`); repair the
  * query separator a removed leading param leaves (`path&a=1` → `path?a=1`);
  * drop a dangling `?`/`&`; lowercase scheme+host ONLY (paths are
  * case-sensitive; same UTF8String.toLowerCase the `lower` builtin uses);
  * strip default ports (`:80` http, `:443` https); strip one trailing
  * slash. Already-canonical input (the common case at recrawl) returns the
  * input `UTF8String` untouched — no allocation.
  */
final case class CanonicalizeUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canonicalize_url requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    CanonicalizeUrl.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CanonicalizeUrl.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)

  override def prettyName: String = "canonicalize_url"
}

object CanonicalizeUrl {
  // compiled once per JVM, shared across all tasks — patterns are
  // immutable and thread-safe; each call allocates only Matchers
  private val Frag = java.util.regex.Pattern.compile("#.*$")
  private val Track =
    java.util.regex.Pattern.compile("[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*")
  private val SepFix = java.util.regex.Pattern.compile("^([^?]*)&")
  private val Dangle = java.util.regex.Pattern.compile("[?&]$")
  private val Host =
    java.util.regex.Pattern.compile("(?i)^(https?://[^/:?#]+)")
  private val HttpPort =
    java.util.regex.Pattern.compile("^(http://[^/:?#]+):80([/?#].*)?$")
  private val HttpsPort =
    java.util.regex.Pattern.compile("^(https://[^/:?#]+):443([/?#].*)?$")
  private val TrailSlash = java.util.regex.Pattern.compile("/$")

  def canonicalize(u: UTF8String): UTF8String = {
    val s0 = u.toString
    var s = s0
    // guards are char-PRESENCE scans only (a pattern whose required char is
    // absent cannot match anywhere) — never last-char checks: Java's `$`
    // also matches before a final line terminator, so replaceAll can fire
    // on "…?\n" where a last-char guard would skip, and bit-parity with the
    // composed regexp_replace chain is the contract here
    if (s.indexOf('#') >= 0) s = Frag.matcher(s).replaceAll("")
    if (s.indexOf('?') >= 0 || s.indexOf('&') >= 0) {
      s = Track.matcher(s).replaceAll("")
      if (s.indexOf('&') >= 0) s = SepFix.matcher(s).replaceAll("$1?")
      if (s.indexOf('?') >= 0 || s.indexOf('&') >= 0)
        s = Dangle.matcher(s).replaceAll("")
    }
    // scheme+host lowering: Spark `lower` semantics (UTF8String.toLowerCase)
    // on the extracted prefix, original casing kept for the remainder —
    // exactly lower(regexp_extract(...)) || regexp_replace(..., "")
    val hm = Host.matcher(s)
    if (hm.find()) {
      val prefix = UTF8String.fromString(hm.group(1)).toLowerCase.toString
      s = prefix + s.substring(hm.end(1))
      // replaceAll (not matches): anchored ^…$ still fires before a final
      // line terminator, and "$1$2" substitutes "" for the absent group 2 —
      // both exactly the composed chain's regexp_replace semantics
      s = HttpPort.matcher(s).replaceAll("$1$2")
      s = HttpsPort.matcher(s).replaceAll("$1$2")
    }
    if (s.indexOf('/') >= 0) s = TrailSlash.matcher(s).replaceAll("")
    if (s == s0) u else UTF8String.fromString(s)
  }
}
