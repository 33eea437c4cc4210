package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Column-function unit coverage (C-series + text-analysis + vector math). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head().getAs[T]("v")

  private def oneSeq(c: org.apache.spark.sql.Column): Seq[String] =
    spark.range(1).select(c.as("v")).head()
      .getAs[scala.collection.Seq[String]]("v").toSeq

  test("C4/C5: date and paragraph-ref extraction") {
    assert(one[java.sql.Date](extractDate(lit("dok-2024-03-15-77"))).toString == "2024-03-15")
    assert(one[String](paragraphRef(lit("se paragraf-12a her"))) == "§ 12a")
    assert(one[String](paragraphRef(lit("§ 7 gjelder"))) == "§ 7")
    assert(one[String](paragraphRef(lit("no ref here"))) == null)
  }

  test("C6/C7: lovdata refs and href filtering") {
    val refs = oneSeq(lovdataRefs(lit("jf lov/2005-06-17-62 og lov/1814-05-17-0.")))
    assert(refs == Seq("lov/2005-06-17-62", "lov/1814-05-17-0"))
    val kept = oneSeq(lovHrefs(array(lit("lov/a"), lit("doc/b"), lit("lov/c"))))
    assert(kept == Seq("lov/a", "lov/c"))
  }

  test("C8/C9/C12: csv codec, depth, path ops") {
    assert(one[String](crossRefsToCsv(array(lit("a"), lit("b")))) == "a,b")
    assert(oneSeq(csvToCrossRefs(lit("a,,b"))) == Seq("a", "b"))
    assert(one[Long](chunkDepth(lit("doc-1-2-3"))) == 3L)
    assert(one[String](pathStem(lit("data/ds/doc_9.xml"))) == "doc_9")
    assert(one[String](pathStem(lit("x/archive.tar.bz2"))) == "archive")
    assert(one[String](datasetDir(lit("gjeldende.tar.bz2"))) == "gjeldende")
  }

  test("C16: coalesceNonEmpty skips blanks") {
    assert(one[String](coalesceNonEmpty(lit(""), lit("  "), lit("x"), lit("y"))) == "x")
  }

  test("text analysis: ratios and quality bounds") {
    assert(one[Double](distinctWordRatio(lit("a a b b"))) == 0.5)
    assert(one[Double](stopwordRatio(lit("the cat the dog"))) == 0.5)
    assert(one[Double](punctRatio(lit("ab,."))) == 0.5)
    val q = one[Double](qualityScore(lit("the quick brown fox jumps over the lazy dog")))
    assert(q > 0.0 && q <= 1.0)
    assert(one[String](fingerprint(lit("  Hello   World "))) ==
      one[String](fingerprint(lit("hello world"))), "fingerprint normalizes case+whitespace")
  }

  test("C4 line filter keeps terminal-punctuated lines of enough words") {
    val doc = Seq(
      "A proper sentence ends like this.",
      "short one.",
      "no punctuation on this line",
      "Is a question fine?",
      "  ",
      "Quoted line works too.\""
    ).mkString("\n")
    val kept = one[String](c4LineFilter(lit(doc), minWords = 3))
    assert(kept == Seq(
      "A proper sentence ends like this.",
      "Is a question fine?",
      "Quoted line works too.\"").mkString("\n"))
  }

  test("normalizeText: NFC composes, controls stripped, whitespace collapsed") {
    // NFD e + combining acute composes to a single codepoint
    assert(one[String](nfcNormalize(lit("Ame\u0301lie"))) == "Am\u00e9lie")
    assert(one[Int](length(nfcNormalize(lit("e\u0301")))) == 1)
    // already-NFC strings pass through unchanged
    assert(one[String](nfcNormalize(lit("plain ascii"))) == "plain ascii")
    // C0 (minus \t\n), DEL, and C1 controls are stripped; \t and \n survive
    assert(one[String](stripControlChars(lit("a\u0007b\u009Fc\td\ne"))) == "abc\td\ne")
    // whitespace runs collapse and ends trim
    assert(one[String](collapseWhitespace(lit("  a \t b\n\nc  "))) == "a b c")
    // the composition
    assert(one[String](normalizeText(lit(" Ame\u0301lie\u0007  x "))) == "Am\u00e9lie x")
  }

  test("occurrence_count: single-scan count equals the length-minus-replace idiom") {
    val cases = Seq(
      ("aaa", "aa"),       // overlap: non-overlapping count = 1, not 2
      ("aaaa", "aa"),      // = 2
      ("the the the", "the"),
      ("", "x"),
      ("abc", "abc"),
      ("ababab", "abab"),  // = 1 (second match would overlap)
      ("héhéhé", "hé"),    // multi-byte
      ("no hits here", "zz")
    )
    cases.foreach { case (s, g) =>
      val native = one[Long](call_function("occurrence_count", lit(s), lit(g)))
      val idiom = one[Double](
        (length(lit(s)) - length(call_function("replace", lit(s), lit(g), lit("")))) / lit(g.length))
      assert(native.toDouble == idiom, s"'$s' / '$g': native=$native idiom=$idiom")
    }
    assert(one[Long](call_function("occurrence_count", lit("abc"), lit(""))) == 0L,
      "empty pattern counts 0")
  }

  test("vector math: dot, norm, cosine on known values") {
    val a = vecLit(Array(3f, 4f))
    val b = vecLit(Array(4f, 3f))
    assert(one[Double](dot(a, a)) == 25.0)
    assert(one[Double](norm(a)) == 5.0)
    assert(math.abs(one[Double](cosine(a, b)) - 24.0 / 25.0) < 1e-12)
    assert(one[Double](cosine(a, vecLit(Array(0f, 0f)))) == 0.0, "zero norm → 0")
  }

  test("int8 quantization: local twin is bit-identical to the column expression") {
    val rng = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(64)((rng.nextFloat() * 2 - 1))) :+
      Array.fill(64)(0f) :+ Array(1e-8f, -1e-8f, 0.5f) // tiny + tie-prone values
    vecs.zipWithIndex.foreach { case (v, i) =>
      val fromCol = spark.range(1)
        .select(quantizeInt8(vecLit(v)).getField("q").as("q"))
        .head().getAs[scala.collection.Seq[Long]]("q").toSeq
      assert(fromCol == quantizeInt8Local(v).toSeq, s"vector $i")
    }
  }

  test("int8 quantization: quantized cosine within 0.02 of full precision") {
    val rng = new scala.util.Random(11)
    (0 until 30).foreach { i =>
      val a = Array.fill(64)((rng.nextFloat() * 2 - 1))
      val b = Array.fill(64)((rng.nextFloat() * 2 - 1))
      val full  = one[Double](cosine(vecLit(a), vecLit(b)))
      val qa    = array(quantizeInt8Local(a).map(lit): _*)
      val qb    = array(quantizeInt8Local(b).map(lit): _*)
      val quant = one[Double](cosineQuantized(qa, qb))
      assert(math.abs(full - quant) < 0.02, s"pair $i: full=$full quant=$quant")
    }
    // zero-vector guard
    assert(one[Double](cosineQuantized(array(lit(0L)), array(lit(0L)))) == 0.0)
  }

  test("int8 quantization: dequantize roundtrip error within half a step") {
    val v = Array(0.9f, -0.3f, 0.05f, -1.0f)
    val row = spark.range(1)
      .select(dequantizeInt8(quantizeInt8(vecLit(v))).as("d"))
      .head().getAs[scala.collection.Seq[Double]]("d")
    v.zip(row).foreach { case (x, xhat) =>
      assert(math.abs(x - xhat) <= 0.5 * 1.0 / 127.0 + 1e-9, s"$x vs $xhat")
    }
    // zero vector dequantizes to zeros, not NaN
    val z = spark.range(1)
      .select(dequantizeInt8(quantizeInt8(vecLit(Array(0f, 0f)))).as("d"))
      .head().getAs[scala.collection.Seq[Double]]("d")
    assert(z == Seq(0.0, 0.0))
  }

  test("random projection: column/local twins bit-identical, plan shuffle-free") {
    val rng = new scala.util.Random(13)
    val vecs = Seq.fill(30)(Array.fill(64)(rng.nextFloat() * 2 - 1)) :+ Array.fill(64)(0f)
    vecs.zipWithIndex.foreach { case (v, i) =>
      val fromCol = spark.range(1)
        .select(randomProject(vecLit(v), 64, 16).as("p"))
        .head().getAs[scala.collection.Seq[Float]]("p").toSeq
      assert(fromCol == randomProjectLocal(v, 16).toSeq, s"vector $i")
    }
    // per-row arithmetic only: no Exchange in the projection plan
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .select(col("id"), randomProject(col("v"), 64, 16).as("p"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    // a short vector or a null component projects to NULL — never a silent
    // plausible-looking projection with 0.0 substituted
    val degenerate = spark.sql(
      """SELECT random_project(array(CAST(NULL AS FLOAT), 1.0F), 2, 4) AS withNull,
        |       random_project(array(1.0F), 2, 4) AS tooShort""".stripMargin).head()
    assert(degenerate.isNullAt(0) && degenerate.isNullAt(1))
  }

  test("url canonicalization: tracking params, case, ports, fragments collapse") {
    import graft.functions.TextFunctions.canonicalizeUrl
    val cases = Seq(
      // tracking + fragment + host case + default port, leading utm repairs ?
      ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&id=5&fbclid=a#top",
        "http://www.example.com/Path/?id=5"),
      // https default port; gclid mid-query; ref param
      ("https://A.B.com:443/p?a=1&gclid=z&ref=feed", "https://a.b.com/p?a=1"),
      // all params are tracking → dangling ? drops, then trailing slash
      ("http://x.com/?utm_medium=m", "http://x.com"),
      // non-default port survives; path case survives
      ("http://X.com:8080/CaseD", "http://x.com:8080/CaseD"),
      // plain trailing slash strip; no query
      ("https://site.org/a/", "https://site.org/a"),
      // non-URL text passes through (minus nothing — no url parts match)
      ("not a url", "not a url"))
    val got = cases.map(_._1).toDF("u")
      .select(canonicalizeUrl(col("u"))).as[String].collect().toSeq
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want, s"want $want got $g") }
  }

  test("random projection: JL distance preservation on random pairs") {
    // 64 → 16 dims, ε ≈ sqrt(log n / outDim): squared distances should be
    // preserved within a loose (1±0.8) envelope for EVERY sampled pair and
    // within ±15% on AVERAGE — a statistical gate on the projection being a
    // genuine near-isometry, not on the RNG's luck
    val rng = new scala.util.Random(17)
    def v(): Array[Float] = Array.fill(64)(rng.nextGaussian().toFloat)
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val pairs = Seq.fill(60)((v(), v()))
    val ratios = pairs.map { case (a, b) =>
      val pa = randomProjectLocal(a, 16)
      val pb = randomProjectLocal(b, 16)
      d2(pa, pb) / d2(a, b)
    }
    assert(ratios.forall(r => r > 0.2 && r < 1.8),
      s"pairwise envelope violated: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio $mean drifts from isometry")
  }

  test("native vec_dot is bit-identical to the HOF fold, null algebra included") {
    import graft.functions.VectorFunctions.{dot, dotHof}
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(40)(i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat),
        Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("id", "a", "b")
    val both = rows.select(col("id"), dot(col("a"), col("b")).as("n"),
      dotHof(col("a"), col("b")).as("h")).collect()
    both.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
      s"row ${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}"))
    // unequal lengths and null elements → null, exactly like the fold
    val weird = Seq(
      (1L, Array(1f, 2f), Array(1f, 2f, 3f)),
      (2L, Array(1f, 2f), Array(3f, 4f))
    ).toDF("id", "a", "b")
      .union(Seq((3L, Array(1f, 2f), Array(1f, 2f))).toDF("id", "a", "b")
        .select(col("id"), col("a"),
          array(lit(1f), lit(null).cast("float")).as("b")))
    val w = weird.select(col("id"), dot(col("a"), col("b")).as("n"),
      dotHof(col("a"), col("b")).as("h")).collect()
    w.foreach(r => assert(r.isNullAt(1) == r.isNullAt(2),
      s"row ${r.getLong(0)} null mismatch"))
    assert(w.filter(_.getLong(0) != 2L).forall(_.isNullAt(1)))
    // doubles on one side (pooled vectors) work too
    val mixed = Seq((1L, Array(1f, 2f), Array(0.5, 0.25))).toDF("id", "a", "b")
      .select(dot(col("a"), col("b")).as("n")).head().getDouble(0)
    assert(mixed == 1.0)
  }

  test("native lsh_bucket equals the composed column form, quirks included") {
    import graft.functions.VectorFunctions.{lshBucket, lshBucketCols}
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(80)(i => (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("id", "v")
    for ((planes, seed) <- Seq((4, 42), (8, 42), (6, 7))) {
      val got = rows.select(col("id"), lshBucket(col("v"), 16, planes, seed).as("n"),
        lshBucketCols(col("v"), 16, planes, seed).as("h")).collect()
      got.foreach(r => assert(r.getInt(1) == r.getInt(2),
        s"row ${r.getLong(0)} planes=$planes: native ${r.getInt(1)} != ${r.getInt(2)}"))
      assert(got.map(_.getInt(1)).distinct.length > 1, "buckets actually spread")
    }
    // a null component lands in bucket 0 on both forms (the null sum falls
    // to the otherwise-branch); a SHORT vector crashes the composed form
    // under ANSI element_at — the native degrades to bucket 0 instead
    val nullComp = Seq((2L, Array.fill(16)(1f))).toDF("id", "v")
      .select(col("id"), concat(slice(col("v"), 1, 15),
        array(lit(null).cast("float"))).as("v"))
    val w = nullComp.select(col("id"), lshBucket(col("v"), 16, 4).as("n"),
      lshBucketCols(col("v"), 16, 4).as("h")).collect()
    w.foreach(r => assert(r.getInt(1) == 0 && r.getInt(2) == 0))
    val short = Seq((1L, Array(1f, 2f))).toDF("id", "v")
      .select(lshBucket(col("v"), 16, 4).as("n")).head()
    assert(short.getInt(0) == 0, "short vector buckets to 0 instead of throwing")
  }

  test("stripHtml: blocks drop wholesale, tags strip, entities decode once") {
    import graft.functions.TextFunctions.stripHtml
    def strip(s: String): String =
      Seq(s).toDF("h").select(stripHtml(col("h")).as("t")).head().getString(0)
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    assert(strip("<script>var x = 'not text';</script>after") == "after",
      "script CONTENT is not text")
    assert(strip("<STYLE>p{}</STYLE>ok") == "ok", "case-insensitive block match")
    assert(strip("a<!-- secret -->b") == "a b")
    assert(strip("T&amp;C &lt;x&gt; &quot;q&#39;s&quot;&nbsp;!") ==
      "T&C <x> \"q's\" !")
    assert(strip("&amp;lt;") == "&lt;",
      "double-encoded decodes exactly once (amp last)")
    assert(strip("<a href=\"http://e.com?a=1&amp;b=2\">link</a>") == "link")
    assert(strip("plain text, no markup") == "plain text, no markup")
    assert(strip("<script a=1>s1</script>mid<script>s2</script>") == "mid",
      "lazy block match: two scripts drop separately, text between survives")
  }
}
