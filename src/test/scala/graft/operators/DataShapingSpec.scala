package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Global line dedup, semantic decontamination, and the deterministic epoch
  * shuffle — the round-9 corpus-shaping additions.
  */
class DataShapingSpec extends SparkSpec {
  import spark.implicits._

  test("dedupLines keeps each distinct line's first (doc,pos) occurrence corpus-wide") {
    val df = Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),
      (3L, "gamma\nalpha\nepsilon")
    ).toDF("doc_id", "text")
    val byId = Dedup.dedupLines(df, "doc_id", "text")
      .select("doc_id", "text", "n_lines_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) == (("alpha\nbeta\ngamma", 0L)), "doc 1 owns every first occurrence")
    assert(byId(2L) == (("delta", 1L)), "doc 2 loses the repeated 'beta'")
    assert(byId(3L) == (("epsilon", 2L)), "doc 3 loses 'gamma' and 'alpha'")
  }

  test("dedupLines: within-doc repeats collapse; untouched docs pass byte-identical") {
    val df = Seq(
      (1L, "x\ny\nx\nx"),
      (2L, "unique one\nunique two")
    ).toDF("doc_id", "text")
    val byId = Dedup.dedupLines(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_lines_removed")))).toMap
    assert(byId(1L) == (("x\ny", 2L)))
    assert(byId(2L) == (("unique one\nunique two", 0L)))
  }

  test("dedupLines minChars exempts short lines from dedup") {
    // the empty line appears in both docs; with minChars=1 it is exempt and
    // every occurrence survives, while the shared long line still dedups
    val df = Seq(
      (1L, "shared line\n\ntail one"),
      (2L, "\nshared line\ntail two")
    ).toDF("doc_id", "text")
    val byId = Dedup.dedupLines(df, "doc_id", "text", minChars = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(byId(1L) == "shared line\n\ntail one")
    assert(byId(2L) == "\ntail two", "doc 2 keeps its exempt empty line, loses the shared one")
  }

  test("dedupLines decision exchanges hashes, not text; an exact-dup doc empties") {
    val df = Seq(
      (1L, "a b\nc d"),
      (2L, "a b\nc d") // exact duplicate document: loses every line
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, "doc_id", "text")
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("text"), r.getAs[Long]("n_lines_removed")))).toMap
    assert(byId(1L) == (("a b\nc d", 0L)))
    assert(byId(2L) == (("", 2L)))
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("semanticContaminatedIds flags cosine hits against the eval set only") {
    val eval = Seq((100L, Array(1f, 0f)), (101L, Array(0f, 1f))).toDF("eid", "vec")
    val corpus = Seq(
      (1L, Array(2f, 0f)),   // cos 1.0 with eval 100
      (2L, Array(0.9f, 0.1f)), // cos ~0.9939 with eval 100
      (3L, Array(1f, 1f)),   // cos ~0.7071 with both — below 0.95
      (4L, Array(0f, 0f))    // zero norm: never flagged
    ).toDF("vec_id", "vec")
    val out = Dedup.semanticContaminatedIds(corpus, "vec_id", "vec", eval, "vec", 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_eval_hits"), r.getAs[Double]("max_cos")))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L)._1 == 1L && out(2L)._2 > 0.99 && out(2L)._2 < 1.0)
    // the corpus side must not shuffle: broadcast nested loop, no exchange
    // above the scan on the corpus branch
    val plan = Dedup.semanticContaminatedIds(corpus, "vec_id", "vec", eval, "vec", 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected broadcast NL join:\n$plan")
  }

  test("shuffleShards: deterministic permutation, salt-sensitive, ranges partition the key space") {
    val df = (1L to 500L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val a = Sampling.shuffleShards(df, "doc_id", 8, salt = "ep0")
      .select("doc_id", "order_key", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val b = Sampling.shuffleShards(df.repartition(7), "doc_id", 8, salt = "ep0")
      .select("doc_id", "order_key", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "same salt → same permutation regardless of partitioning")
    val c = Sampling.shuffleShards(df, "doc_id", 8, salt = "ep1")
      .select("order_key").as[Long].collect().sorted
    assert(c.toSeq != a.map(_._2).sorted.toSeq, "different salt → different permutation")
    assert(a.forall { case (_, _, s) => s >= 0 && s < 8 })
    // shard is the top-bits range of the key: shard asc, key asc is global order
    val q = (BigInt(2).pow(63) + 7) / 8
    assert(a.forall { case (_, k, s) => (BigInt(k) / q).toInt == s })
  }

  test("writeShuffleShards: one file per shard, epoch order within each shard") {
    val df = (1L to 200L).map(i => (i, i * 2)).toDF("doc_id", "v")
    val dir = tmpDir("shards")
    Sampling.writeShuffleShards(df, "doc_id", 4, dir, salt = "ep0")
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 4)
    shardDirs.foreach { sd =>
      assert(sd.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${sd.getName} must hold exactly one file")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() == 200L)
    assert(back.select("doc_id").as[Long].collect().toSet == (1L to 200L).toSet)
    // within every shard file, rows are already in order_key order
    (0 until 4).foreach { s =>
      val keys = spark.read.parquet(s"$dir/shard=$s").select("order_key").as[Long].collect()
      assert(keys.toSeq == keys.sorted.toSeq, s"shard $s must be stored in epoch order")
    }
  }

  test("dedupLinesIncremental: history drops all occurrences, replay is identical") {
    val dir = tmpDir("graft-lineidx")
    val b1 = Seq((1L, "alpha\nbeta"), (2L, "beta\ngamma")).toDF("doc_id", "text")
    val o1 = Dedup.dedupLinesIncremental(spark, b1, "doc_id", "text", dir, "s1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(o1 == Map(1L -> "alpha\nbeta", 2L -> "gamma"),
      "within-batch first-occurrence rule applies to the first batch")
    def runB2() = Dedup.dedupLinesIncremental(spark,
      Seq((10L, "gamma\ndelta"), (11L, "delta\nepsilon")).toDF("doc_id", "text"),
      "doc_id", "text", dir, "s2")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_lines_removed")))).toMap
    val o2 = runB2()
    // gamma lives in history (every occurrence drops); delta is fresh
    // (doc 10 keeps the first, doc 11 loses it); epsilon is fresh
    assert(o2 == Map(10L -> (("delta", 1L)), 11L -> (("epsilon", 1L))), s"got $o2")
    // replaying the same segment reproduces the identical output — the
    // half-landed registration from the first run is excluded from `seen`
    assert(runB2() == o2, "replayed segment must be byte-identical")
    // a third batch sees batch 2's registrations
    val o3 = Dedup.dedupLinesIncremental(spark,
      Seq((20L, "epsilon\nzeta")).toDF("doc_id", "text"),
      "doc_id", "text", dir, "s3")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(o3 == Map(20L -> "zeta"))
    // compaction folds the per-segment appends to <= nFiles sorted files
    // and changes NOTHING about subsequent dedup decisions
    val before = spark.read.parquet(s"$dir/hashes").collect()
      .map(_.getAs[String]("_h")).sorted.toSeq
    Dedup.compactLineIndex(spark, dir, nFiles = 2)
    val after = spark.read.parquet(s"$dir/hashes")
    assert(after.collect().map(_.getAs[String]("_h")).sorted.toSeq == before,
      "compaction preserves the hash set")
    assert(new java.io.File(s"$dir/hashes").listFiles()
      .count(_.getName.endsWith(".parquet")) <= 2)
    val o4 = Dedup.dedupLinesIncremental(spark,
      Seq((30L, "zeta\ntheta")).toDF("doc_id", "text"),
      "doc_id", "text", dir, "s4")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(o4 == Map(30L -> "theta"), "post-compaction registry still drops history lines")
  }

  test("dedupLinesIncremental fails fast on a torn compaction swap") {
    val dir = tmpDir("graft-lineidx-torn")
    Dedup.dedupLinesIncremental(spark,
      Seq((1L, "alpha\nbeta")).toDF("doc_id", "text"), "doc_id", "text", dir, "s1")
    // simulate a crash mid-swap: live hashes/ renamed aside, tmp not yet in
    // place — exactly the window compactLineIndex's bak-first protocol leaves
    val live = new java.io.File(s"$dir/hashes")
    assert(live.renameTo(new java.io.File(s"$dir/hashes.compact-bak")))
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupLinesIncremental(spark,
        Seq((2L, "alpha\ngamma")).toDF("doc_id", "text"), "doc_id", "text", dir, "s2")
    }
    assert(ex.getMessage.contains("compactLineIndex"),
      s"lost history must fail loudly, not dedup against nothing: $ex")
    // operator recovery (restore the bak) resumes with full history
    assert(new java.io.File(s"$dir/hashes.compact-bak")
      .renameTo(new java.io.File(s"$dir/hashes")))
    val o = Dedup.dedupLinesIncremental(spark,
      Seq((2L, "alpha\ngamma")).toDF("doc_id", "text"), "doc_id", "text", dir, "s2")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(o == Map(2L -> "gamma"), "restored registry still holds batch-1 lines")
  }

  test("dedupLines equals a reference implementation on random colliding corpora") {
    val rng = new scala.util.Random(42)
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val docs = (0 until 60).map { i =>
      val n = 1 + rng.nextInt(6)
      (i.toLong, Seq.fill(n)(pool(rng.nextInt(pool.size))).mkString("\n"))
    }
    // reference: global first-occurrence by (doc, pos) scan order
    val seen = scala.collection.mutable.Set.empty[String]
    val want = docs.map { case (id, text) =>
      val kept = text.split("\n", -1).filter(l => seen.add(l))
      id -> kept.mkString("\n")
    }.toMap
    val got = Dedup.dedupLines(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got == want)
  }

  test("round-10 operators tolerate empty and degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.dedupLines(empty, "doc_id", "text").count() == 0)
    val emptyLen = Seq.empty[(Long, String, Long)].toDF("id", "source", "len")
    assert(Sampling.lengthBatches(emptyLen, "id", "len", 8, "source").count() == 0)
    assert(Sampling.shuffleShards(empty, "doc_id", 4).count() == 0)
    // drift of two empty corpora: every bucket sits at the (equal) floor
    val r = Drift.textDrift(empty, empty, "text", buckets = 32).head()
    assert(r.getAs[Double]("psi") == 0.0 && r.getAs[Long]("n_ref") == 0L)
    // drift empty-vs-nonempty is finite and positive
    val some = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val r2 = Drift.textDrift(empty, some, "text", buckets = 32).head()
    assert(!r2.getAs[Double]("psi").isNaN && r2.getAs[Double]("psi") > 0.0)
  }

  test("lshPlan: exact split, s-curve lands near the target, threshold monotonicity") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val (b, r) = Dedup.lshPlan(128, t)
      assert(b * r == 128, s"split must spend the whole hash budget: ($b, $r)")
      // the curve's inflection (1/b)^(1/r) should land near the target
      val inflection = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(inflection - t) < 0.15,
        s"t=$t chose ($b, $r) with inflection $inflection")
    }
    // steeper thresholds need more rows per band
    val rs = Seq(0.3, 0.5, 0.7, 0.9).map(t => Dedup.lshPlan(128, t)._2)
    assert(rs == rs.sorted, s"rowsPerBand must be monotone in threshold: $rs")
    // recall-leaning asymmetry: weighting false negatives harder never
    // lowers the band count
    val (bBal, _) = Dedup.lshPlan(128, 0.6)
    val (bRec, _) = Dedup.lshPlan(128, 0.6, fpWeight = 0.1, fnWeight = 0.9)
    assert(bRec >= bBal)
  }

  test("GraphAnn.buildPlan: determinism, monotone effort, cost guard, measured pin") {
    import graft.operators.GraphAnn
    def plan(n: Long, t: Double) = GraphAnn.buildPlan(n, 64, t)
    // deterministic
    assert(plan(200000, 0.75) == plan(200000, 0.75))
    // the LSH-regime pin (20k: one probe pass fits a host with ease)
    val p20k = plan(20000, 0.75)
    assert(p20k.strategy == "lsh" && p20k.nPlanes == 9 && p20k.probes == 2 &&
      p20k.degree == 12 && p20k.buildBatches == 1,
      s"planned 20k config drifted: $p20k")
    // the descent-regime pin: at 200k the radius-3 probe expansion models
    // past the 16 GB single-pass budget, so the planner hands the build to
    // NN-Descent — radius-1 init, same occupancy-band planes, same
    // degree/hub tiers, >= 3 refinement rounds
    val p200k = plan(200000, 0.75)
    assert(p200k.strategy == "descent" && p200k.probes == 1 &&
      p200k.refineRounds >= 3 && p200k.buildBatches == 1,
      s"planned 200k config drifted: $p200k")
    assert(p200k.nPlanes == 13 && p200k.degree == 12 && p200k.hubs == 256)
    // the strategy switch tracks the single-pass spill budget (modeled
    // probe volume probedBuckets × n × rowBytes vs 16 GB)
    assert(plan(50000, 0.75).strategy == "lsh" &&
      plan(500000, 0.75).strategy == "descent",
      "50k stays lsh, 500k descends")
    // corpus growth never shrinks the bucket space
    val bs = Seq(2000L, 20000L, 200000L, 2000000L, 20000000L)
      .map(plan(_, 0.8).nPlanes)
    assert(bs == bs.sorted, s"nPlanes must be monotone in corpus size: $bs")
    // higher targets never plan less modeled candidate work (the radius/
    // plane pair can shift, so the law is on the work product, not
    // fields). The law is an LSH-regime law: descent plans do their extra
    // work in refinement rounds, not probe radius, so the comparison only
    // ranges over targets the planner keeps on the lsh path.
    def work(p: GraphAnn.GraphBuildPlan, n: Long): Double = {
      val probed = (0 to p.probes).map { i =>
        var c = 1.0; (0 until i).foreach(j => c = c * (p.nPlanes - j) / (j + 1)); c
      }.sum
      probed * n / math.pow(2.0, p.nPlanes)
    }
    for (n <- Seq(2000L, 20000L)) {
      // high targets at moderate n can legitimately blow the single-pass
      // budget (20k @ 0.9 models 90 GB of probe volume) — the monotone law
      // ranges over the targets that stay on the lsh path
      val ps = Seq(0.55, 0.7, 0.8, 0.9).map(t => plan(n, t))
        .filter(_.strategy == "lsh")
      assert(ps.size >= 2, s"premise: some lsh-regime targets at n=$n")
      val ws = ps.map(work(_, n))
      assert(ws == ws.sorted, s"modeled work must be monotone in target at n=$n: $ws")
    }
    // descent-regime laws: the strategy never narrows the degree/hub
    // bands, and refinement depth is a constant floor, not target-scaled
    for (n <- Seq(200000L, 5000000L); t <- Seq(0.55, 0.75, 0.9)) {
      val p = plan(n, t)
      if (p.strategy == "descent") {
        assert(p.probes == 1 && p.refineRounds >= 3 && p.buildBatches == 1,
          s"descent plan shape at n=$n t=$t: $p")
      }
    }
    // cost guard: modeled candidates stay under max(10% of corpus, 2000)
    // per vector unless the plane budget is exhausted
    for (n <- bs.indices.map(i => Seq(2000L, 20000L, 200000L, 2000000L, 20000000L)(i));
         t <- Seq(0.6, 0.75, 0.9)) {
      val p = plan(n, t)
      assert(work(p, n) <= math.max(0.1 * n, 2000.0) * 1.0001 || p.nPlanes == 16,
        s"cost guard violated at n=$n t=$t: $p work=${work(p, n)}")
    }
    // degree tiers with the target; hubs stay in the clamp
    assert(plan(200000, 0.95).degree == 16 && plan(200000, 0.6).degree == 8)
    for (n <- Seq(100L, 2000L, 200000L, 20000000L)) {
      val h = plan(n, 0.8).hubs
      assert(h >= 16 && h <= 256)
    }
    // degenerate inputs refuse
    intercept[IllegalArgumentException](GraphAnn.buildPlan(0, 64, 0.8))
    intercept[IllegalArgumentException](GraphAnn.buildPlan(1000, 64, 1.0))
  }

  /** Deterministic varied lengths over three sources. */
  private def lenRows = (0 until 210).map { i =>
    (i.toLong, s"s${i % 3}", ((i * 37) % 450).toLong)
  }

  private def naiveBatches(rows: Seq[(Long, String, Long)], b: Int): Map[Long, Long] =
    rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.sortBy(r => (-r._3, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i / b).toLong }
    }

  test("lengthBatches bucket decomposition equals the naive whole-source window") {
    val df = lenRows.toDF("id", "source", "len")
    val want = naiveBatches(lenRows, 8)
    for (width <- Seq(1, 64, 100000)) { // per-length buckets … one giant bucket
      val got = Sampling.lengthBatches(df, "id", "len", 8, "source", width)
        .select("id", "batch_id").as[(Long, Long)].collect().toMap
      assert(got == want, s"width=$width must replicate the naive window")
    }
  }

  test("lengthBatches: batches are full except the per-source tail; padding ≤ unsorted") {
    val df = lenRows.toDF("id", "source", "len")
    val batched = Sampling.lengthBatches(df, "id", "len", 8, "source")
    val stats = Sampling.paddingStats(batched, "len", "source")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("batch_id"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("padding")))
    stats.groupBy(_._1).foreach { case (_, bs) =>
      val maxBatch = bs.map(_._2).max
      bs.foreach { case (_, bid, n, pad) =>
        assert(pad >= 0)
        if (bid < maxBatch) assert(n == 8L, "only the tail batch may be partial")
      }
    }
    // the whole point: length-sorted batching pads less than id-order batching
    val sortedPad = stats.map(_._4).sum
    val unsortedPad = lenRows.groupBy(_._2).map { case (_, rs) =>
      rs.sortBy(_._1).grouped(8).map(g => g.map(_._3).max * g.length - g.map(_._3).sum).sum
    }.sum
    assert(sortedPad < unsortedPad,
      s"sorted padding $sortedPad must beat unsorted $unsortedPad")
  }
}
