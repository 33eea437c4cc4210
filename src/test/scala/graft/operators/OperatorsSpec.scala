package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.{DeterministicProvider, Embedding}

/** Dedup, similarity, window, and embedding operator behavior. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds a true near-dup pair without a cartesian join") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val unrelated = (100 to 140).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df, "doc_id", "text", numHashes = 16, bands = 4)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "banded join must not be all-pairs")
    val got = pairs.as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "near-dup pair must bucket together")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("bucket-size cap drops a degenerate hot bucket but keeps true near-dups") {
    // adversarial corpus: 300 identical boilerplate docs all land in the same
    // band buckets (a quadratic hot partition at scale) + one genuine pair
    val boiler = (1 to 300).map(i => (i.toLong, "standard boilerplate disclaimer text"))
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val df = (boiler ++ Seq((1001L, base), (1002L, nearDup))).toDF("doc_id", "text")

    val capped = Dedup.minhashCandidates(df, "doc_id", "text", 16, 4, maxBucketSize = 50)
    assert(!capped.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val pairs = capped.as[(Long, Long)].collect().toSet
    assert(pairs.contains((1001L, 1002L)), "true near-dup pair survives the cap")
    assert(!pairs.exists { case (a, b) => a <= 300 && b <= 300 },
      "the degenerate 300-doc bucket (≈45k pairs) is dropped, not joined")

    // uncapped control: the hot bucket would dominate the output
    val uncapped = Dedup.minhashCandidates(df, "doc_id", "text", 16, 4, maxBucketSize = Int.MaxValue)
    assert(uncapped.count() == capped.count() + 300L * 299 / 2)

    // same guard on the embedding-cosine variant
    val vecs = ((1 to 200).map(i => (i.toLong, Array(1f, 0f, 0f, 0f))) ++
      Seq((901L, Array(0f, 1f, 0.1f, 0f)), (902L, Array(0f, 1f, 0.11f, 0f)))).toDF("vec_id", "embedding")
    val cos = Dedup.cosineCandidates(vecs, "vec_id", "embedding", dim = 4, nPlanes = 4,
      threshold = 0.5, maxBucketSize = 50)
    val cosPairs = cos.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!cosPairs.exists { case (a, b) => a <= 200 && b <= 200 })
    assert(cosPairs.contains((901L, 902L)))
  }

  test("semantic candidates pair near-identical embeddings within a k-means cell") {
    // two tight clusters on orthogonal axes + a lone outlier: k-means with
    // k=2 separates the clusters; within each cell only the near-identical
    // pair clears the threshold
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0.99f, 0.05f, 0f, 0f)), // near-dups
      (3L, Array(0.6f, 0.8f, 0f, 0f)), // same half-space, not a dup
      (10L, Array(0f, 0f, 1f, 0f)), (11L, Array(0f, 0.05f, 0.99f, 0f)), // near-dups
      (12L, Array(0f, 0.8f, 0.6f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticCandidates(vecs, "vec_id", "embedding", k = 2, iters = 2,
      threshold = 0.95)
    assert(!pairs.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "cell-equi-join, never all-pairs")
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (10L, 11L)))

    // one-call dedup keeps the canonical (min-id) member of each pair
    val kept = Dedup.semanticDedup(vecs, "vec_id", "embedding", k = 2, iters = 2,
      threshold = 0.95).select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 10L, 12L))
  }

  test("semantic candidates are partitioning-invariant and cap degenerate cells") {
    // deterministic k-means ⇒ identical pairs under any input partitioning
    val rnd = new scala.util.Random(7)
    def v(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    val base = (1L to 200L).map(i => (i, v()))
    val df = base.toDF("vec_id", "embedding")
    val p1 = Dedup.semanticCandidates(df, "vec_id", "embedding", k = 4, iters = 2,
      threshold = 0.5).collect().map(_.toString).toSet
    val p2 = Dedup.semanticCandidates(df.repartition(7), "vec_id", "embedding", k = 4,
      iters = 2, threshold = 0.5).collect().map(_.toString).toSet
    assert(p1 == p2, "pairs must not depend on partitioning")

    // a degenerate cell (300 identical embeddings) is dropped by the cap,
    // while a genuine near-dup pair in another cell survives
    val clones = (1001L to 1300L).map(i => (i, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val pair = Seq(
      (1L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0f, 0.99f, 0.05f, 0f, 0f, 0f, 0f, 0f)))
    val df2 = (clones ++ pair).toDF("vec_id", "embedding")
    val capped = Dedup.semanticCandidates(df2, "vec_id", "embedding", k = 2, iters = 2,
      threshold = 0.95, maxCellSize = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)),
      "the 300-clone cell (~45k trivial pairs) is dropped, the true pair kept")
  }

  test("connected components collapse transitive near-dup chains to one keeper") {
    // a 10-link chain (needs multiple propagation rounds) + a separate pair
    val chain = (1L to 9L).map(i => (i, i + 1))
    val pairs = (chain :+ (100L, 101L)).toDF("id_a", "id_b")
    val comps = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert((1L to 10L).forall(comps(_) == 1L), "whole chain labels to its minimum id")
    assert(comps(100L) == 100L && comps(101L) == 100L)
    // canonical selection: drop everything that is not its cluster minimum
    val dups = Dedup.duplicateIds(pairs).as[Long].collect().toSet
    assert(dups == ((2L to 10L).toSet + 101L))
  }

  test("hash sampling and splits: deterministic, disjoint, exhaustive, proportional") {
    val df = (1L to 10000L).toDF("id")
    val s1 = Sampling.sampleByHash(df, "id", 0.3).as[Long].collect().toSet
    val s2 = Sampling.sampleByHash(df.repartition(7), "id", 0.3).as[Long].collect().toSet
    assert(s1 == s2, "membership must not depend on partitioning")
    assert(math.abs(s1.size - 3000) < 300, s"~30% expected, got ${s1.size}")
    // a 10% sample is a subset of the 30% sample (nested thresholds)
    val s3 = Sampling.sampleByHash(df, "id", 0.1).as[Long].collect().toSet
    assert(s3.subsetOf(s1))

    val splits = Sampling.assignSplits(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byGroup = splits.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byGroup.values.sum == 10000, "every row lands in exactly one split")
    assert(math.abs(byGroup("train") - 8000) < 400 && math.abs(byGroup("val") - 1000) < 200)
    // growing the corpus never moves an existing row between splits
    val bigger = Sampling.assignSplits((1L to 20000L).toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val joined = splits.withColumnRenamed("split", "s1")
      .join(bigger.withColumnRenamed("split", "s2"), Seq("id"))
    assert(joined.filter(col("s1") =!= col("s2")).isEmpty)

    // rebalance: per-key fractions apply, unlisted keys kept whole
    val keyed = (1L to 6000L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val rebalanced = Sampling.rebalance(keyed, "id", "key", Map("k0" -> 0.5, "k1" -> 0.1))
      .groupBy("key").count().as[(String, Long)].collect().toMap
    assert(math.abs(rebalanced("k0") - 1000) < 200 && math.abs(rebalanced("k1") - 200) < 100)
    assert(rebalanced("k2") == 2000, "keys without a fraction are untouched")
  }

  test("corpus diff: added/removed/changed/unchanged exact; reprocess = added ∪ changed") {
    val oldV = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val newV = Seq((2L, "beta"), (3L, "GAMMA2"), (4L, "delta")).toDF("id", "text")
    val st = CorpusDiff.diff(oldV, newV, "id", "text").as[(Long, String)].collect().toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    val rp = CorpusDiff.toReprocess(oldV, newV, "id", "text").as[Long].collect().toSet
    assert(rp == Set(3L, 4L), "downstream reprocesses exactly added ∪ changed")
    // identical snapshots: everything unchanged, reprocess empty
    assert(CorpusDiff.diff(oldV, oldV, "id", "text")
      .filter(col("status") =!= "unchanged").isEmpty)
    // the join must carry hashes, not the content column
    val plan = CorpusDiff.diff(oldV, newV, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      "diff exchanges must not ship document text")
  }

  test("leakage-safe splits: clusters land whole, singletons match assignSplits") {
    val docs = (1L to 2000L).toDF("id")
    // a 5-clique, a chain, and a pair — plus 1988 singletons
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L),  // clique-ish
      (10L, 11L), (11L, 12L),                             // chain
      (100L, 101L)
    ).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplits(docs, "id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // no near-dup pair may straddle splits
    val bySplit = out.select(col("id"), col("split"))
      .as[(Long, String)].collect().toMap
    val edges = pairs.as[(Long, Long)].collect()
    edges.foreach { case (a, b) =>
      assert(bySplit(a) == bySplit(b), s"pair ($a,$b) straddles splits")
    }
    // clustered rows carry their component's canonical id as the group
    val groups = out.select(col("id"), col("split_group"))
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(groups(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(groups(_) == 10L))
    assert(groups(100L) == 100L && groups(101L) == 100L)
    // unclustered rows are their own group and match plain assignSplits
    val plain = Sampling.assignSplits(docs, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val clustered = edges.flatMap(e => Seq(e._1, e._2)).toSet
    docs.as[Long].collect().filterNot(clustered).foreach { id =>
      assert(groups(id) == id)
      assert(bySplit(id) == plain(id), s"singleton $id diverged from assignSplits")
    }
    // star variant produces the identical assignment
    val star = Sampling.leakageSafeSplits(docs, "id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), star = true)
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    assert(star == bySplit, "componentsStar path must agree with components")
  }

  test("url blocklist: domain parse, suffix semantics, exact-only mode") {
    import graft.functions.TextFunctions.{extractUrls, urlDomain}
    val urls = spark.range(1).select(
      extractUrls(lit("x https://A.Evil.org/p?q=1 y http://ok.com z ftp://skipped.net")).as("u"))
      .head().getAs[scala.collection.Seq[String]]("u")
    assert(urls == Seq("https://A.Evil.org/p?q=1", "http://ok.com"))
    assert(spark.range(1).select(urlDomain(lit("https://A.Evil.org:8080/p")).as("d"))
      .head().getString(0) == "a.evil.org")

    val docs = Seq(
      (1L, "see https://ads.evil.org/banner"),   // suffix-blocked by evil.org
      (2L, "see https://evil.org/front"),        // exact-blocked
      (3L, "see https://notevil.org/x"),         // NOT blocked (label boundary)
      (4L, "see https://fine.com/x"),
      (5L, "no urls at all")
    ).toDF("id", "text")
    val bl = Seq("evil.org").toDF("domain")
    val blocked = QualityFilters.blockedDomainIds(docs, "id", "text", bl)
      .as[Long].collect().toSet
    assert(blocked == Set(1L, 2L), s"got $blocked")
    val exactOnly = QualityFilters.blockedDomainIds(docs, "id", "text", bl, suffixMatch = false)
      .as[Long].collect().toSet
    assert(exactOnly == Set(2L))
    val kept = QualityFilters.blocklistFilter(docs, "id", "text", bl)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("gopherSignals: hand-computed rules and the combined keep verdict") {
    // 6 words, mean len (3+3+2+3+4+3)/6 = 3.0, all alphabetic, 3 stopword
    // types (the, of, and), no symbols — fails only the 50-word minimum
    val goodish = "the cat of the卵 and cat"
    //   NB: the 4th token "the卵" still contains [A-Za-z]
    val bullets = "• one\n• two\n- three\nplain..."
    val df = Seq((1L, goodish), (2L, bullets)).toDF("id", "text")
    val sig = QualityFilters.gopherSignals(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val g = sig(1L)
    assert(g.getAs[Long]("n_words") == 6L)
    assert(g.getAs[Double]("mean_word_len") == 3.0) // (3+3+2+4+3+3)/6
    assert(g.getAs[Double]("alpha_word_frac") == 1.0)
    assert(g.getAs[Long]("stopword_types") == 3L)
    assert(!g.getAs[Boolean]("gopher_keep"), "fails the 50-word minimum")

    val b = sig(2L)
    assert(b.getAs[Double]("bullet_line_frac") == 0.75, "3 of 4 lines are bullets")
    assert(b.getAs[Double]("ellipsis_line_frac") == 0.25, "1 of 4 lines ends in ellipsis")
    assert(!b.getAs[Boolean]("gopher_keep"))

    // a passing document: 60 varied words with stopwords and clean lines
    val words = (1 to 56).map(i => s"word$i").mkString(" ")
    val pass = s"the cat of and $words"
    val p = QualityFilters.gopherSignals(Seq((3L, pass)).toDF("id", "text"), "id", "text")
      .head()
    assert(p.getAs[Boolean]("gopher_keep"), s"expected pass, got $p")
    // and gopherFilter applies the verdict as a semi-join
    val kept = QualityFilters.gopherFilter(
      Seq((1L, goodish), (3L, pass)).toDF("id", "text"), "id", "text")
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(3L))
  }

  test("as-of join: latest prior-or-equal state per key, null before first state, row-atomic payload") {
    val clicks = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L), (2L, 50L, 103L))
      .toDF("user", "t", "click_id")
    val states = Seq(
      (1L, 10L, 7L, "a"),   // equal-time state IS visible to click t=10
      (1L, 15L, 8L, "b"),
      (2L, 60L, 9L, "c")    // after user 2's only click → no match
    ).toDF("user", "t", "sid", "tag")
    val out = AsOfJoin.asOf(clicks, states, Seq("user"), "t", "t", Seq("sid", "tag"))
      .select("click_id", "asof_sid", "asof_tag")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(100L) == (Some(7L), Some("a")), "equal timestamp matches")
    assert(out(101L) == (Some(8L), Some("b")), "latest prior wins")
    assert(out(102L) == (None, None), "click before any state → null")
    assert(out(103L) == (None, None), "state strictly after the click never matches")

    // payload is row-atomic: a later state with a null field must not let an
    // older field value bleed through
    val states2 = Seq(
      (1L, 10L, Some(7L), Some("old")),
      (1L, 15L, Some(8L), None: Option[String])
    ).toDF("user", "t", "sid", "tag")
    val atomic = AsOfJoin.asOf(
      Seq((1L, 20L, 1L)).toDF("user", "t", "click_id"),
      states2, Seq("user"), "t", "t", Seq("sid", "tag"))
      .select("asof_sid", "asof_tag").head()
    assert(atomic.getLong(0) == 8L && atomic.isNullAt(1),
      "the t=15 row matches as a unit — tag must be its null, not t=10's value")
  }

  test("bloom anti-join: exactly equals left_anti on long and string keys, keeps null keys") {
    val left = ((1L to 5000L).map(i => (i: java.lang.Long, s"v$i")) :+
      ((null: java.lang.Long), "nullkey")).toDF("id", "payload")
    val right = (4000L to 9000L by 3).toDF("id")
    val viaBloom = BloomAntiJoin.antiJoin(left, "id", right, "id", fpp = 0.05)
      .select("payload").as[String].collect().toSet
    val viaAnti = left.join(right, Seq("id"), "left_anti")
      .select("payload").as[String].collect().toSet
    assert(viaBloom == viaAnti)
    assert(viaBloom.contains("nullkey"), "null keys never equi-match → kept")

    val sl = (1 to 2000).map(i => s"doc$i").toDF("k")
    val sr = (1500 to 2500).map(i => s"doc$i").toDF("k")
    val sBloom = BloomAntiJoin.antiJoin(sl, "k", sr, "k").as[String].collect().toSet
    assert(sBloom == (1 until 1500).map(i => s"doc$i").toSet)
  }

  test("temperatureMix: flattens the mixture, keeps the scarce-per-target source whole") {
    // skewed corpus: 8000 / 1500 / 500 rows across three sources
    val rows = (1L to 8000L).map(i => (i, "big")) ++
      (8001L to 9500L).map(i => (i, "mid")) ++ (9501L to 10000L).map(i => (i, "small"))
    val df = rows.toDF("id", "key")
    // alpha = 1 is the identity mixture: every source kept whole
    val id = Sampling.temperatureMix(df, "id", "key", alpha = 1.0)
      .groupBy("key").count().as[(String, Long)].collect().toMap
    assert(id == Map("big" -> 8000L, "mid" -> 1500L, "small" -> 500L))
    // alpha = 0.5 tempers: kept counts ~ c*sqrt(n_s) — ratios flatten from
    // 16:3:1 toward 4:sqrt(3):1, and the binding source stays whole
    val t = Sampling.temperatureMix(df, "id", "key", alpha = 0.5)
      .groupBy("key").count().as[(String, Long)].collect().toMap
    val expected = Map(
      "big" -> 500.0 * math.sqrt(8000.0 / 500.0),
      "mid" -> 500.0 * math.sqrt(1500.0 / 500.0),
      "small" -> 500.0)
    expected.foreach { case (k, e) =>
      assert(math.abs(t(k) - e) < 0.15 * e + 50, s"$k: got ${t(k)}, want ~$e")
    }
    assert(t("small") == 500L, "the scarcest-per-target source is kept whole")
    // deterministic: re-running yields the identical kept set
    val a = Sampling.temperatureMix(df, "id", "key", alpha = 0.5).select("id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(df.repartition(5), "id", "key", alpha = 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("dedupCorpus: exact twins, transitive near-dups, and uniques compose") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near1 = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val unique = (100 to 140).map(i => s"other$i").mkString(" ")
    val df = Seq(
      (1L, base), (2L, base),        // exact twins → keep 1
      (3L, near1),                   // near-dup of base → clustered with 1
      (4L, unique)                   // unrelated → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(df, "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(kept.contains(4L), "unique doc survives")
    assert(kept.contains(1L), "cluster canonical (minimum id) survives")
    assert(!kept.contains(2L), "exact twin dropped")
    assert(!kept.contains(3L), "near-dup clustered away")
    val keptStar = Dedup.dedupCorpus(df, "doc_id", "text", star = true)
      .select("doc_id").as[Long].collect().toSet
    assert(keptStar == kept, "star clustering keeps the identical set")
  }

  test("simhash: near-dups have small hamming distance, unrelated large") {
    val df = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (2L, (3 to 40).map(i => s"tok$i").mkString(" ")),
      (3L, (100 to 140).map(i => s"other$i").mkString(" "))
    ).toDF("id", "text")
      .withColumn("sig", Dedup.simhash(Dedup.wordSet(col("text"))))
    val sigs = df.select("id", "sig").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
  }

  test("md5Lower60 matches DuckDB's md5_number_lower >> 4") {
    // oracle-side value: SELECT md5_number_lower('abc') >> 4 = 515660037898893677
    val got = spark.range(1).select(Dedup.md5Lower60(lit("abc")).as("h")).head().getLong(0)
    assert(got == 515660037898893677L)
    assert(got > 0, "60-bit hash must stay positive in a signed long")
  }

  test("jaccard pairs: blocked candidates with threshold") {
    val df = Seq(
      (1L, "a b c d e", "s1", 9L),
      (2L, "a b c d f", "s1", 9L),
      (3L, "x y z w v", "s1", 9L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", Seq("source", "n_chars"), 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // jaccard(1,2)=4/6; others 0
  }

  test("shingles produce distinct n-grams") {
    val out = spark.range(1).select(Dedup.shingles(lit("abcdef"), 3).as("s"))
      .head().getSeq[String](0)
    assert(out == Seq("abc", "bcd", "cde", "def"))
  }

  test("cosine topK: exact ranking against hand-computed similarities") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.topK(vecs, "embedding", "vec_id", Array(1f, 0f, 0f), 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("LSH topK returns the same neighbors as brute force for close vectors") {
    val vecs = (0 until 50).map { i =>
      val angle = i / 50.0 * math.Pi
      (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat,
        0.1f * (i % 3), 0.05f * (i % 5)))
    }.toDF("vec_id", "embedding")
    val q = Array(1f, 0f, 0f, 0f)
    val brute = Similarity.topK(vecs, "embedding", "vec_id", q, 5).select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.topKLsh(vecs, "embedding", "vec_id", q, 5, dim = 4, nPlanes = 4, probes = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(lsh.intersect(brute).nonEmpty, "LSH probe buckets must cover near neighbors")
  }

  test("multi-probe LSH: probes=nPlanes covers every bucket and matches brute force") {
    val vecs = (0 until 50).map { i =>
      val angle = i / 50.0 * math.Pi
      (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat,
        0.1f * (i % 3), 0.05f * (i % 5)))
    }.toDF("vec_id", "embedding")
    val q = Array(1f, 0f, 0f, 0f)
    val brute = Similarity.topK(vecs, "embedding", "vec_id", q, 5).select("vec_id").as[Long].collect().toSeq
    // Hamming radius = nPlanes ⇒ the probe set is the whole bucket space
    val all = Similarity.topKLsh(vecs, "embedding", "vec_id", q, 5, dim = 4, nPlanes = 4, probes = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == brute, "full-radius probing must equal brute force")
    // each extra probe radius can only widen the scanned set
    def scanned(p: Int) =
      Similarity.topKLsh(vecs, "embedding", "vec_id", q, 50, dim = 4, nPlanes = 4, probes = p).count()
    assert(scanned(0) <= scanned(1) && scanned(1) <= scanned(2) && scanned(2) <= scanned(4))
  }

  test("driver-side query bucket equals the column-expression bucket") {
    import graft.functions.VectorFunctions._
    val qs = Seq(
      Array(1f, 0f, 0f, 0f), Array(-0.3f, 0.7f, 0.1f, -0.9f), Array(0.2f, 0.2f, 0.2f, 0.2f))
    qs.foreach { q =>
      val colBucket = spark.range(1).select(lshBucket(vecLit(q), 4, 8).as("b")).head().getInt(0)
      assert(Similarity.lshBucketLocal(q, 8) == colBucket)
    }
  }

  test("IVF index: nearest-probe search finds the brute-force top result") {
    val vecs = (0 until 60).map { i =>
      val angle = i / 60.0 * 2 * math.Pi
      (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val index = Similarity.buildIvf(vecs, "embedding", "vec_id", k = 6)
    assert(index.centroids.length == 6)
    val q = Array(1f, 0.05f, 0f, 0f)
    val brute = Similarity.topK(vecs, "embedding", "vec_id", q, 3).select("vec_id").as[Long].collect()
    val ivf = Similarity.topKIvf(index, "embedding", "vec_id", q, 3, nProbes = 2)
      .select("vec_id").as[Long].collect()
    assert(ivf.nonEmpty)
    assert(ivf.contains(brute.head), "IVF with 2 probes must find the exact nearest vector")
  }

  test("IVF-SQ8: all-cell probing equals brute quantized; 2-probe finds the nearest") {
    val vecs = (0 until 60).map { i =>
      val angle = i / 60.0 * 2 * math.Pi
      (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val index = Similarity.buildIvf(vecs, "embedding", "vec_id", k = 6)
    val q = Array(1f, 0.05f, 0f, 0f)
    // probing every cell must reduce exactly to the brute quantized ranking
    val all = Similarity.topKIvfSq8(index, "embedding", "vec_id", q, 5, nProbes = 6)
      .collect().map(_.toSeq).toSeq
    val brute = Similarity.topKQuantized(vecs, "embedding", "vec_id", q, 5)
      .collect().map(_.toSeq).toSeq
    assert(all == brute, "full-probe IVF-SQ8 must equal brute quantized top-k")
    // and the narrow probe still finds the exact nearest vector
    val narrow = Similarity.topKIvfSq8(index, "embedding", "vec_id", q, 3, nProbes = 2)
      .select("vec_id").as[Long].collect()
    val bruteTop = Similarity.topK(vecs, "embedding", "vec_id", q, 1)
      .select("vec_id").as[Long].head()
    assert(narrow.contains(bruteTop))
  }

  test("range join point-in-interval: equals naive BETWEEN join, inclusive bounds, null drop") {
    val rng = new scala.util.Random(11)
    val points = (0 until 300).map(i =>
      (i.toLong, (i % 5).toLong, if (i == 7) null.asInstanceOf[java.lang.Long]
       else java.lang.Long.valueOf(rng.nextInt(10000).toLong)))
      .toDF("pid", "k", "p")
    val intervals = (0 until 80).map { i =>
      val lo = rng.nextInt(9500).toLong
      (1000L + i, (i % 5).toLong, lo, lo + rng.nextInt(2000).toLong)
    }.toDF("iid", "k", "lo", "hi")
    // widths much smaller and larger than typical spans give identical results
    for (w <- Seq(64L, 1024L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", Seq("k"), w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val naive = points.as("a").join(intervals.as("b"),
          col("a.k") === col("b.k") && col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"width $w must match the naive range join")
    }
    // inclusive endpoints: p == lo and p == hi both match
    val edge = RangeJoin.pointInInterval(
      Seq((1L, 0L, 100L), (2L, 0L, 200L), (3L, 0L, 99L)).toDF("pid", "k", "p"),
      Seq((9L, 0L, 100L, 200L)).toDF("iid", "k", "lo", "hi"),
      "p", "lo", "hi", Seq("k"), 7L)
    assert(edge.select("pid").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("range join overlap: equals naive overlap join with no duplicate pairs") {
    val rng = new scala.util.Random(23)
    def mk(n: Int, idBase: Long, span: Int) = (0 until n).map { i =>
      val lo = rng.nextInt(8000).toLong
      (idBase + i, (i % 3).toLong, lo, lo + rng.nextInt(span).toLong)
    }
    val left = mk(120, 0L, 3000).toDF("lid", "k", "l_lo", "l_hi")
    val right = mk(90, 5000L, 50).toDF("rid", "k", "r_lo", "r_hi")
    val naive = left.as("a").join(right.as("b"),
        col("a.k") === col("b.k") && col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    // narrow buckets force long intervals to share MANY buckets — the
    // claim-bucket rule must still emit each pair exactly once
    for (w <- Seq(16L, 500L, 100000L)) {
      val got = RangeJoin.overlap(left, right, "l_lo", "l_hi", "r_lo", "r_hi", Seq("k"), w)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"width $w must match the naive overlap join, duplicate-free")
    }
    // touching endpoints overlap (inclusive semantics)
    val touch = RangeJoin.overlap(
      Seq((1L, 0L, 0L, 100L)).toDF("lid", "k", "l_lo", "l_hi"),
      Seq((2L, 0L, 100L, 200L), (3L, 0L, 101L, 200L)).toDF("rid", "k", "r_lo", "r_hi"),
      "l_lo", "l_hi", "r_lo", "r_hi", Seq("k"), 30L)
    assert(touch.select("rid").as[Long].collect().toSeq == Seq(2L))
  }

  test("range join plans as an equi-join — never a nested-loop cross-product") {
    val points = Seq((1L, 0L, 5L)).toDF("pid", "k", "p")
    val intervals = Seq((9L, 0L, 0L, 10L)).toDF("iid", "k", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", Seq("k"), 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketized range join must be an equi-join, got:\n$plan")
  }

  test("duplicateSpans equals brute-force ExactSubstr on a random corpus") {
    // small vocab forces natural n-gram repeats; two docs also share an
    // injected exact sentence
    val rng = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val shared = "x y z w x y z w x y"
    val docs: Seq[(Long, String)] = (0 until 25).map { i =>
      val body = Seq.fill(12 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size))).mkString(" ")
      (i.toLong, if (i % 9 == 0) s"$body $shared" else body)
    }
    val n = 3
    // brute force: gram -> occurrences; mark all but the (doc,pos)-first
    // occurrence of each repeated gram; merge overlapping/adjacent ranges
    val occ = for {
      (id, t) <- docs
      toks = t.trim.split("\\s+").toSeq
      i <- 0 to toks.size - n
    } yield (toks.slice(i, i + n).mkString(" "), id, i + 1)
    val dupPos = occ.groupBy(_._1).values.filter(_.size > 1).flatMap {
      _.sortBy(o => (o._2, o._3)).tail.map(o => (o._2, o._3))
    }.toSeq
    val expected = dupPos.groupBy(_._1).flatMap { case (id, ps) =>
      ps.map(_._2).sorted.map(p => (p, p + n - 1))
        .foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, (s2, e2)) if s2 <= e + 1 => (s, math.max(e, e2)) :: rest
          case (acc, r) => r :: acc
        }.map { case (s, e) => (id, s.toLong, e.toLong) }
    }.toSet
    val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    // spans are maximal (no overlap/adjacency within a doc) and >= n tokens
    got.groupBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.toSeq.sortBy(_._2)
      sorted.foreach { case (_, s, e) => assert(e - s + 1 >= n) }
      sorted.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) => assert(s2 > e1 + 1, "merged spans must not touch")
        case _ =>
      }
    }
  }

  test("removeDuplicateSpans drops exactly the covered tokens, leaves clean docs byte-identical") {
    val docs = Seq(
      (1L, "p q r s t u v w"),          // first occurrence — kept whole
      (2L, "m n  p q r s t u v w"),     // dup tail removed (note double space)
      (3L, "completely unrelated words here")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 4)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "p q r s t u v w", "canonical copy is kept")
    assert(out(2L) == "m n", "every duplicated token goes; survivors re-joined")
    assert(out(3L) == "completely unrelated words here", "untouched docs pass through byte-identical")
  }

  test("takeWeighted: size, determinism, weight-monotonicity, zero-weight exclusion") {
    val df = (1 to 200).map(i => (i.toLong, i.toDouble)).toDF("id", "w")
    val a = Sampling.takeWeighted(df, "id", "w", n = 30).as[(Long, Double)].collect().toSet
    assert(a.size == 30)
    val again = Sampling.takeWeighted(df, "id", "w", n = 30).as[(Long, Double)].collect().toSet
    assert(a == again, "same salt draws the same sample")
    // heavier rows are favored: the heavy half carries 75% of the weight
    // mass, so it should clearly exceed its 50% population share (uniform
    // sampling would center on 15 of 30; proportional on ~22)
    assert(a.count(_._1 > 100) >= 18, "selection probability must grow with weight")
    // monotone under a fixed salt: raising one selected row's weight keeps it
    val boosted = df.withColumn("w",
      when(col("id") === a.head._1, col("w") * 1000).otherwise(col("w")))
    val b = Sampling.takeWeighted(boosted, "id", "w", n = 30).as[(Long, Double)].collect().toSet
    assert(b.exists(_._1 == a.head._1), "raising a selected row's weight cannot evict it")
    // zero/negative weights can never be selected
    val withZero = df.withColumn("w",
      when(col("id") <= 100, lit(0.0)).otherwise(col("w")))
    val c = Sampling.takeWeighted(withZero, "id", "w", n = 150).as[(Long, Double)].collect()
    assert(c.length == 100 && c.forall(_._1 > 100))
    // NaN weights can never be selected either — NaN > 0 is TRUE under
    // Spark's NaN-greatest ordering and log(NaN)+g sorts first, so without
    // its own guard a 0.0/0.0 upstream ratio would always win the sample
    val withNaN = df.withColumn("w",
      when(col("id") === 7, lit(Double.NaN)).otherwise(col("w")))
    val nn = Sampling.takeWeighted(withNaN, "id", "w", n = 30).as[(Long, Double)].collect()
    assert(!nn.exists(_._1 == 7L), "a NaN-weight row must never be selected")
    // TakeOrdered, not a global sort
    val plan = Sampling.takeWeighted(df, "id", "w", n = 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$plan")
  }

  test("sampleKPerGroup: exactly k per group, deterministic, salt-sensitive") {
    val df = (0 until 200).map(i => (i.toLong, s"g${i % 5}")).toDF("id", "grp")
    val a = Sampling.sampleKPerGroup(df, "id", Seq("grp"), k = 7, salt = "s1")
      .as[(Long, String)].collect().toSet
    assert(a.groupBy(_._2).values.forall(_.size == 7))
    val again = Sampling.sampleKPerGroup(df, "id", Seq("grp"), k = 7, salt = "s1")
      .as[(Long, String)].collect().toSet
    assert(a == again, "same salt draws the same sample")
    val b = Sampling.sampleKPerGroup(df, "id", Seq("grp"), k = 7, salt = "s2")
      .as[(Long, String)].collect().toSet
    assert(a != b, "different salts draw different samples")
    // undersized groups are kept whole
    val tiny = Seq((1L, "g"), (2L, "g")).toDF("id", "grp")
    assert(Sampling.sampleKPerGroup(tiny, "id", Seq("grp"), k = 7).count() == 2)
    // the rank<=k filter must compile to a WindowGroupLimit (map-side trim)
    val plan = Sampling.sampleKPerGroup(df, "id", Seq("grp"), k = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("componentsStar equals min-label components on chains, cliques, forests, random graphs") {
    val rng = new scala.util.Random(7)
    val graphs: Seq[(String, Seq[(Long, Long)])] = Seq(
      ("long chain", (1L to 29L).map(i => (i, i + 1))),
      ("clique", (for { a <- 1L to 8L; b <- (a + 1) to 8L } yield (a, b))),
      ("forest of pairs+triples", Seq((10L, 11L), (20L, 21L), (21L, 22L), (30L, 30L))),
      ("random", (1 to 120).map(_ => (rng.nextInt(60).toLong, rng.nextInt(60).toLong))),
      ("reversed ids", (1L to 9L).map(i => (i + 1, i)))
    )
    graphs.foreach { case (name, es) =>
      val pairs = es.toDF("id_a", "id_b")
      // min-label needs rounds = diameter (40 covers the 29-link chain);
      // star converges within its default 20 on every shape here.
      // finishThreshold = -1 forces the distributed rounds; the defaults
      // take the driver union-find finish — all four must agree.
      val viaLabel = Dedup.components(pairs, maxIter = 40, finishThreshold = -1L)
        .as[(Long, Long)].collect().toMap
      val viaStar = Dedup.componentsStar(pairs, maxIter = 20, finishThreshold = -1L)
        .as[(Long, Long)].collect().toMap
      val viaDriver = Dedup.components(pairs, maxIter = 40).as[(Long, Long)].collect().toMap
      val viaDriverStar = Dedup.componentsStar(pairs).as[(Long, Long)].collect().toMap
      assert(viaStar == viaLabel, s"$name: star and min-label disagree")
      assert(viaDriver == viaLabel, s"$name: driver finish and min-label disagree")
      assert(viaDriverStar == viaLabel, s"$name: driver star finish and min-label disagree")
    }
  }

  test("components driver finish handles string ids with the same min-label contract") {
    val pairs = Seq(("docB", "docA"), ("docB", "docC"), ("docX", "docX"), ("docY", "docZ"))
      .toDF("id_a", "id_b")
    val got = Dedup.components(pairs).as[(String, String)].collect().toMap
    assert(got == Map(
      "docA" -> "docA", "docB" -> "docA", "docC" -> "docA",
      "docX" -> "docX", "docY" -> "docY", "docZ" -> "docY"))
  }

  test("componentsStar converges in O(log d) rounds on a chain min-label needs O(d) for") {
    // 200-link chain: min-label at maxIter=20 would NOT converge (diameter
    // 200); the star rounds contract it comfortably inside 20
    val pairs = (1L to 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.componentsStar(pairs, maxIter = 20, finishThreshold = -1L)
      .as[(Long, Long)].collect()
    assert(comps.length == 201)
    assert(comps.forall(_._2 == 1L), "whole chain collapses to the minimum id")
  }

  test("IVF assigner: mapPartitions path (k>64) matches the codegen argmax bit-for-bit") {
    // 300 vectors spread over a ring plus some collinear ties; 128 centroids
    // forces the mapPartitions path, which must agree with the k<=64
    // column-expression path on every row (same fold order, same tie-break)
    val vecs = (0 until 300).map { i =>
      val angle = i / 300.0 * 2 * math.Pi
      val r = 1f + (i % 3) * 0.5f
      (i.toLong, Array((r * math.cos(angle)).toFloat, (r * math.sin(angle)).toFloat,
        (i % 7) / 7f, 0.25f))
    }.toDF("vec_id", "embedding")
    val cents = (0 until 128).map { c =>
      val angle = c / 128.0 * 2 * math.Pi
      (c, Array(math.cos(angle).toFloat, math.sin(angle).toFloat, (c % 5) / 5f, 0.1f))
    }
    val viaMapPartitions = Similarity.assignCells(vecs, "embedding", cents)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    // the column-expression path has no k limit of its own — invoke it
    // directly on the same centroids as the ground truth
    val simStructs = array(cents.map { case (cid, v) =>
      struct(graft.functions.VectorFunctions.cosineToLit(col("embedding"), v).as("sim"),
        lit(cid).as("cid"))
    }: _*)
    val viaExpr = vecs.withColumn("cid", array_max(simStructs).getField("cid"))
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    assert(viaMapPartitions.size == 300)
    assert(viaMapPartitions == viaExpr)
  }

  test("decontamination flags n-gram collisions with a benchmark set, plan has no cartesian") {
    val benchText = (1 to 30).map(i => s"bench$i").mkString(" ")
    val leaked = "prefix words then " + (5 to 20).map(i => s"bench$i").mkString(" ") // shares 13-grams
    val nearMiss = (1 to 30).map(i => s"bench$i").grouped(12).map(_.mkString(" ")).mkString(" UNIQUE ")
    val clean = (1 to 40).map(i => s"clean$i").mkString(" ")
    val corpus = Seq((1L, leaked), (2L, clean), (3L, nearMiss), (4L, "short text"))
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchText)).toDF("text")

    val contaminated = Dedup.contaminatedIds(corpus, "doc_id", "text", bench, "text", n = 13)
    assert(!contaminated.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    assert(contaminated.as[Long].collect().toSet == Set(1L),
      "only the doc sharing a full 13-gram run is flagged (interrupted runs and short docs are not)")

    val kept = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text", n = 13)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    assert(kept.columns.toSeq == corpus.columns.toSeq, "schema unchanged")

    // minCollisions raises the bar: doc 1 shares exactly 4 distinct 13-grams
    // (16 bench tokens → 4 windows), so a threshold of 5 clears it
    val strict = Dedup.contaminatedIds(corpus, "doc_id", "text", bench, "text",
      n = 13, minCollisions = 5)
    assert(strict.as[Long].collect().isEmpty)
    val atBar = Dedup.contaminatedIds(corpus, "doc_id", "text", bench, "text",
      n = 13, minCollisions = 4)
    assert(atBar.as[Long].collect().toSet == Set(1L))
  }

  test("contamination report ranks eval items by leak fraction, hand-computed") {
    // bench item A: tokens a1..a6, n=3 → 4 distinct grams; corpus doc 1
    // contains a1..a4 (grams a1a2a3, a2a3a4 → 2 leaked), corpus doc 2
    // contains a2..a4 (gram a2a3a4 — already counted once for A, second
    // leaking DOC). Item B is untouched (0 leaked, but still reported).
    val bench = Seq(
      (100L, "a1 a2 a3 a4 a5 a6"),
      (200L, "b1 b2 b3 b4")).toDF("bench_id", "text")
    val corpus = Seq(
      (1L, "x a1 a2 a3 a4 y"),
      (2L, "z a2 a3 a4 w"),
      (3L, "clean text entirely unrelated")).toDF("doc_id", "text")
    val r = Dedup.contaminationReport(
      corpus, "doc_id", "text", bench, "bench_id", "text", n = 3)
      .collect().map(row => row.getLong(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))).toMap
    assert(r(100L) == ((4L, 2L, 2L, 0.5)))
    assert(r(200L) == ((2L, 0L, 0L, 0.0)))
  }

  test("nnJoin returns per-query brute-force top-k at full probe radius, no cartesian") {
    val corpus = (0 until 48).map { i =>
      val a = i / 48.0 * 2 * math.Pi
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat, 0.2f, 0f))
    }.toDF("vec_id", "embedding")
    val queries = Seq(
      (100L, Array(1f, 0.05f, 0.2f, 0f)),
      (101L, Array(-1f, -0.05f, 0.2f, 0f))
    ).toDF("vec_id", "embedding")

    val nn = Similarity.nnJoin(corpus, "vec_id", queries, "vec_id", "embedding",
      dim = 4, k = 3, nPlanes = 4, probes = 4) // radius = nPlanes → every bucket probed
    assert(!nn.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = nn.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // brute-force ground truth per query via the single-query operator
    val b100 = Similarity.topK(corpus, "embedding", "vec_id", Array(1f, 0.05f, 0.2f, 0f), 3)
      .select("vec_id").as[Long].collect().toSet
    val b101 = Similarity.topK(corpus, "embedding", "vec_id", Array(-1f, -0.05f, 0.2f, 0f), 3)
      .select("vec_id").as[Long].collect().toSet
    assert(got(100L) == b100 && got(101L) == b101,
      "full-radius nnJoin must equal per-query brute force")

    // map-side partial top-k: the aggregate ships k rows per query per
    // partition, not every candidate
    assert(nn.queryExecution.executedPlan.toString.contains("partial_top_k"))
  }

  test("PII scrub redacts emails, IPv4 and phones; clean text is untouched") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, "mail me at alice.smith+x@sub.example.org today"),
      (2L, "server 192.168.001.12 responded"),
      (3L, "call +47 22 33 44 55 now"),
      (4L, "version 3.4 of chapter 12 is fine"), // dotted short number: not an IP
      (5L, "all three: bob@x.io from 10.0.0.7 dial +1 (555) 123-4567 done")
    ).toDF("id", "t")
    val got = rows.select(col("id"), TextFunctions.scrubPii(col("t")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "mail me at <EMAIL> today")
    assert(got(2L) == "server <IP> responded")
    assert(got(3L) == "call <PHONE> now")
    assert(got(4L) == "version 3.4 of chapter 12 is fine")
    assert(got(5L) == "all three: <EMAIL> from <IP> dial <PHONE> done")
  }

  test("PII scrub IP boundary: non-ASCII neighbors and dotted versions behave like the oracle") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, "node 10.0.0.4ø marker"), // Java \b would NOT fire here, RE2's would — class boundary fires in both
      (2L, "semver 1.2.3.4.5 is not an address"),
      (3L, "10.0.0.1 starts and ends 10.0.0.2")
    ).toDF("id", "t")
    val got = rows.select(col("id"), TextFunctions.scrubPii(col("t")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "node <IP>ø marker")
    assert(got(2L) == "semver 1.2.3.4.5 is not an address")
    assert(got(3L) == "<IP> starts and ends <IP>")
  }

  test("repetition signals: dup-word and top-2gram fractions match hand computation") {
    // "a b a b a b": 6 words, 2 distinct → dup_word_frac = 4/6; 2-grams:
    // "a b"×3, "b a"×2 → top gram "a b" (3 occurrences × 3 chars) / 11 chars
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "all words here are unique tokens"),
      (3L, "x") // fewer words than the 2-gram size
    ).toDF("doc_id", "text")
    val sig = QualityFilters.repetitionSignals(df, "doc_id", "text", n = 2)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(sig(1L)._1 == math.rint((1.0 - 2.0 / 6.0) * 1e6) / 1e6)
    assert(sig(1L)._2 == math.rint(3.0 * 3.0 / 11.0 * 1e6) / 1e6)
    assert(sig(2L)._1 == 0.0 && sig(2L)._2 < 0.5)
    assert(sig(3L)._1 == 0.0 && sig(3L)._2 == 0.0, "sub-n-gram docs score zero, not null")
  }

  test("sequence packing: bins are contiguous token windows, stable per stream") {
    val df = Seq(
      (1L, "s1", 600), (2L, "s1", 600), (3L, "s1", 600), (4L, "s1", 600),
      (10L, "s2", 2000), (11L, "s2", 100)
    ).toDF("doc_id", "source", "toks")
    val packed = Sampling.packSequences(df, "doc_id", "toks", "source", 1000)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // s1 prefix sums 0,600,1200,1800 → bins 0,0,1,1; s2: 0,2000 → bins 0,2
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 10L -> 0L, 11L -> 2L))
  }

  test("nnJoinIvf at full probe width equals per-query brute force") {
    val corpus = (0 until 48).map { i =>
      val a = i / 48.0 * 2 * math.Pi
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat, 0.2f, 0f))
    }.toDF("vec_id", "embedding")
    val queries = Seq(
      (100L, Array(1f, 0.05f, 0.2f, 0f)),
      (101L, Array(-1f, -0.05f, 0.2f, 0f))
    ).toDF("vec_id", "embedding")
    val index = Similarity.buildIvf(corpus, "embedding", "vec_id", k = 6)
    // probing every cell = exhaustive search, so results must match brute
    // force (the only nested-loop in the plan is the intentional broadcast
    // of the k-row centroid table; the corpus join stays equi-key on cid)
    val nn = Similarity.nnJoinIvf(index, "vec_id", queries, "vec_id", "embedding", k = 3, nProbes = 6)
    assert(!nn.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = nn.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    Seq((100L, Array(1f, 0.05f, 0.2f, 0f)), (101L, Array(-1f, -0.05f, 0.2f, 0f))).foreach {
      case (qid, qv) =>
        val brute = Similarity.topK(corpus, "embedding", "vec_id", qv, 3)
          .select("vec_id").as[Long].collect().toSet
        assert(got(qid) == brute, s"query $qid diverges from brute force")
    }
    // reduced probing narrows the scan but still returns k rows per query
    val narrow = Similarity.nnJoinIvf(index, "vec_id", queries, "vec_id", "embedding", k = 3, nProbes = 2)
    assert(narrow.collect().groupBy(_.getLong(0)).values.forall(_.length == 3))
  }

  test("winnowing fingerprint: deterministic, overlap-sensitive") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val shared = (1 to 25).map(i => s"w$i").mkString(" ") + " x1 x2 x3 x4 x5"
    val unrelated = (100 to 130).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, shared), (3L, unrelated), (4L, "a b")).toDF("id", "text")
      .withColumn("fp", Dedup.winnowingFingerprint(col("text")))
    val fps = df.select("id", "fp").as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L) == df.select(Dedup.winnowingFingerprint(col("text")).as("fp"))
      .where(col("fp").isNotNull).as[Seq[Long]].head(4).head, "deterministic across evaluations")
    val overlap12 = fps(1L).toSet.intersect(fps(2L).toSet).size
    val overlap13 = fps(1L).toSet.intersect(fps(3L).toSet).size
    assert(overlap12 > 0, "documents sharing a long run share fingerprints")
    assert(overlap13 == 0, "unrelated documents share none")
    assert(fps(4L).isEmpty, "text shorter than k-gram size has an empty fingerprint")
  }

  test("approximate aggregates stay within error bounds of exact") {
    val df = (1 to 10000).map(i => (i % 137, i.toDouble)).toDF("k", "v")
    val approx = df.agg(approx_count_distinct(col("k"))).head().getLong(0)
    assert(math.abs(approx - 137) <= 137 * 0.05, s"HLL estimate $approx vs 137")
    val p50 = df.agg(percentile_approx(col("v"), lit(0.5), lit(1000))).head().getDouble(0)
    assert(math.abs(p50 - 5000) <= 100, s"approx median $p50 vs 5000")
  }

  test("langId picks the language whose stopwords dominate") {
    val df = Seq(
      ("the cat and the dog of the town is big", "en"),
      ("der hund und die katze ist ein tier", "de"),
      ("le chat et la maison les arbres des fleurs", "fr")
    ).toDF("text", "expected")
    val out = df.withColumn("pred", graft.functions.TextFunctions.langId(col("text")))
      .select("expected", "pred").as[(String, String)].collect()
    out.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("langIdNgram classifies via character trigram profiles") {
    val df = Seq(
      ("the thing standing there was singing another song", "en"),
      ("der schnelle braune fuchs und der hund sind schon eins", "de"),
      ("les enfants que nous avons vus dans les descentes", "fr")
    ).toDF("text", "expected")
    val out = df.withColumn("pred", graft.functions.TextFunctions.langIdNgram(col("text")))
      .select("expected", "pred").as[(String, String)].collect()
    out.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("session windows: gap splits sessions per key") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val df = Seq(
      (1L, at(0)), (1L, at(10)), (1L, at(100)), // gap 90min → 2 sessions
      (2L, at(0))
    ).toDF("user_id", "ts")
    val sessions = EventWindows.sessionCounts(df, "ts", "user_id", 1800L)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(sessions == Map(1L -> 2L, 2L -> 1L))
  }

  test("tumbling windows bucket counts") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "a", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:50:00"), "a", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), "a", 3.0)
    ).toDF("ts", "event_type", "value")
    val out = EventWindows.tumbling(df, "ts", "1 hour", Seq("event_type"))
    assert(out.count() == 2)
    assert(out.agg(sum("n")).head().getLong(0) == 3)
  }

  test("deterministic embedding: stable, unit-norm, strict batch zip (E1)") {
    val p = new DeterministicProvider(32)
    val v1 = p.embedBatch(Seq("hello"))
    val v2 = p.embedBatch(Seq("hello", "world"))
    assert(v1.head.toSeq == v2.head.toSeq, "same text must embed identically")
    val norm = math.sqrt(v1.head.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)

    val df = (1 to 250).map(i => (i.toLong, s"text $i")).toDF("id", "text")
    val out = Embedding.embed(df, "text", p, batchSize = 100)
    assert(out.count() == 250)
    assert(out.select("embedding").head().getSeq[Float](0).length == 32)
    assert(out.select("embeddingModel").head().getString(0) == p.modelName)
  }

  test("overlay keeps exactly one row per key, updates win") {
    val old = Seq(("k1", 1, "old"), ("k2", 1, "old")).toDF("id", "idx", "v")
    val upd = Seq(("k1", 2, "new")).toDF("id", "idx", "v")
    val out = Overlay.overlay(old, upd, Seq("id"), Seq("idx"))
      .select("id", "v").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "new", "k2" -> "old"))
  }

  test("stripBoilerplateLines: shared chrome goes, unique content stays byte-identical") {
    val df = Seq(
      (1L, "unique article one\nSITE FOOTER\n  SITE FOOTER  \nsecond line 1"),
      (2L, "unique article two\nSITE FOOTER\nsecond line 2"),
      (3L, "unique article three\nSITE FOOTER"),
      (4L, "no chrome at all\n\nwith a blank line")
    ).toDF("doc_id", "text")
    val out = QualityFilters.stripBoilerplateLines(df, "doc_id", "text", maxDocs = 2)
      .as[(Long, String)].collect().toMap
    // the footer hits 3 > 2 docs under TRIMMED matching (doc 1's padded
    // copy counts and strips too); everything else keeps exact bytes+order
    assert(out(1L) == "unique article one\nsecond line 1")
    assert(out(2L) == "unique article two\nsecond line 2")
    assert(out(3L) == "unique article three")
    assert(out(4L) == "no chrome at all\n\nwith a blank line",
      "untouched documents must come back byte-identical, blank lines intact")
    // blank lines never count as boilerplate even though every doc could
    // share them; a doc that is ALL boilerplate collapses to empty
    val all = Seq((1L, "F"), (2L, "F"), (3L, "F")).toDF("doc_id", "text")
    val stripped = QualityFilters.stripBoilerplateLines(all, "doc_id", "text", maxDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(stripped.values.toSet == Set(""))
    // threshold boundary: exactly maxDocs occurrences is NOT boilerplate
    val atBar = QualityFilters.stripBoilerplateLines(
      Seq((1L, "F"), (2L, "F")).toDF("doc_id", "text"), "doc_id", "text", maxDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(atBar.values.toSet == Set("F"))
  }

  test("meanPool: hand-computed element-wise group means, order and dims preserved") {
    val df = Seq(
      ("a", Array(1f, 2f, 3f)),
      ("a", Array(3f, 4f, 5f)),
      ("b", Array(10f, 0f, -2f))
    ).toDF("grp", "vec")
    val pooled = Similarity.meanPool(df, Seq("grp"), "vec")
      .as[(String, Array[Float])].collect().toMap
    assert(pooled("a").toSeq == Seq(2f, 3f, 4f))
    assert(pooled("b").toSeq == Seq(10f, 0f, -2f))
    // repartition-stable at the checked precision
    val re = Similarity.meanPool(df.repartition(5), Seq("grp"), "vec")
      .as[(String, Array[Float])].collect().toMap
    assert(re.view.mapValues(_.toSeq).toMap == pooled.view.mapValues(_.toSeq).toMap)
    // null/empty vectors drop out; all-null groups are absent
    val withNulls = Seq(
      ("a", Array(2f, 2f)), ("a", null.asInstanceOf[Array[Float]]),
      ("c", null.asInstanceOf[Array[Float]])
    ).toDF("grp", "vec")
    val p2 = Similarity.meanPool(withNulls, Seq("grp"), "vec")
      .as[(String, Array[Float])].collect().toMap
    assert(p2.keySet == Set("a") && p2("a").toSeq == Seq(2f, 2f))
  }
}
