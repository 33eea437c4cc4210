package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Native codegen canonicalize_url: bit-parity with the composed
  * regexp_replace/regexp_extract chain it replaces (the DuckDB oracles
  * replay that chain, so parity IS the correctness contract), SQL
  * registration, and the no-alloc identity fast path.
  */
class CanonicalizeUrlSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-picked edge cases + a deterministic fuzz grid over the parts the
    * regexes distinguish: scheme case, ports, tracking params in every
    * position, fragments, dangling separators, non-URL text, and line
    * terminators (Java's `$` matches before a final newline — the guard
    * discipline inside the native expression exists for exactly that).
    */
  private def corpus: Seq[String] = {
    val hand = Seq(
      "HTTP://WWW.Example.COM:80/Path/?utm_source=x&id=5&fbclid=a#top",
      "https://A.B.com:443/p?a=1&gclid=z&ref=feed",
      "http://x.com/?utm_medium=m",
      "http://X.com:8080/CaseD",
      "https://site.org/a/",
      "not a url", "", "   ", "#onlyfrag", "?", "&", "a&b=1",
      "http://h.com:80", "https://h.com:443", "http://h.com:80/",
      "http://h.com:80?q=1", "http://h.com:80#f", "ftp://h.com:80/x",
      "http://:80/x", "HtTpS://MiXeD.CaSe/Path?UTM_SOURCE=up", // utm_ match is lowercase-only
      "http://h.com/p?utm_a=1&utm_b=2&utm_c=3", "http://h.com/p?ref=&a=2",
      "http://h.com/a//", "http://h.com/p?a=1&", "http://h.com/p&a=1",
      // line-terminator traps: $ fires before a final \n in Java
      "http://h.com/p?\n", "http://h.com/a/\n", "http://h.com:80/x\n",
      "http://h.com/p#f\nmore", "æøå://host/π")
    val fuzz = for {
      scheme <- Seq("http://", "HTTPS://", "")
      host <- Seq("Ex.COM", "ex.com:80", "ex.com:443", "ex.com:8080")
      path <- Seq("", "/", "/P/a", "/p/")
      query <- Seq("", "?utm_source=x", "?a=1&utm_x=2", "?utm_x=2&a=1", "&a=1", "?")
      frag <- Seq("", "#f")
    } yield scheme + host + path + query + frag
    hand ++ fuzz
  }

  test("native expression is bit-identical to the composed regex chain") {
    val df = corpus.toDF("u")
    val rows = df.select(
      TextFunctions.canonicalizeUrl(col("u")).as("native"),
      TextFunctions.canonicalizeUrlComposed(col("u")).as("composed"),
      col("u")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"parity break on '${r.getString(2)}': native='${r.getString(0)}' " +
          s"composed='${r.getString(1)}'")
    }
  }

  test("registered in SQL; already-canonical input returns the input unchanged") {
    val got = spark.sql(
      "SELECT canonicalize_url('HTTP://A.com:80/P?utm_source=1&x=2#f')").head().getString(0)
    assert(got == "http://a.com/P?x=2")
    // identity fast path: no new allocation for canonical input
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("http://a.com/p?x=1")
    assert(CanonicalizeUrl.canonicalize(s) eq s)
  }
}
