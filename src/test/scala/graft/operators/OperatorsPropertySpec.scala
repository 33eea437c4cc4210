package graft.operators

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

import graft.SparkSpec

/** Randomized invariants for the round-4 operator families, each checked
  * against a driver-side ground-truth recomputation (no Spark machinery on
  * the oracle side of the property).
  */
class OperatorsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)
  private def holds(p: org.scalacheck.Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
  private val textGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpusGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, textGen))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("polyWindowHashes matches a driver-side Horner recomputation bit-for-bit") {
    val p = Dedup.MersenneP
    val C = 1000003L
    // driver-side model: xxhash64 is not recomputable here, so feed KNOWN
    // token hashes through a literal array column and compare the fold
    holds(forAll(Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(12, Gen.chooseNum(0L, p - 1)).map(hs => (n, hs)))) { case (n, hs) =>
      import org.apache.spark.sql.functions.{array, lit}
      val th = array(hs.map(lit): _*)
      val got = Seq(1).toDF("x")
        .select(Dedup.polyWindowHashes(th, n).as("w"))
        .head().getSeq[Long](0).toSeq
      val expected =
        if (hs.length < n) Seq.empty
        else (0 to hs.length - n).map { i =>
          hs.slice(i, i + n).foldLeft(0L)((acc, h) => (acc * C + h % p) % p)
        }
      got == expected
    })
  }

  test("poly and string-gram contamination flag the same documents") {
    // different hash families, same collision structure: n-gram equality
    holds(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val viaPoly = Dedup.contaminatedIds(df, "doc_id", "text", df, "text", n = 3)
        .as[Long].collect().toSet
      val viaString = Dedup.contaminatedIds(df, "doc_id", "text", df, "text", n = 3,
        hashFn = Dedup.XxStringGram).as[Long].collect().toSet
      viaPoly == viaString
    })
  }

  test("decontaminate with an empty benchmark is the identity") {
    val corpus = (1L to 10L).map(i => (i, s"text number $i here")).toDF("doc_id", "text")
    val bench = Seq.empty[String].toDF("text")
    val kept = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text", n = 3)
    assert(kept.count() == 10)
  }

  test("contamination: self-benchmark flags exactly docs with >= n words; thresholds are monotone") {
    holds(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val self = Dedup.contaminatedIds(df, "doc_id", "text", df, "text", n = 3)
        .as[Long].collect().toSet
      val expected = rows.filter(_._2.split("\\s+").count(_.nonEmpty) >= 3).map(_._1).toSet
      val strict = Dedup.contaminatedIds(df, "doc_id", "text", df, "text", n = 3, minCollisions = 2)
        .as[Long].collect().toSet
      self == expected && strict.subsetOf(self)
    })
  }

  test("packSequences bins equal the driver-computed prefix-sum windows") {
    val rowsGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("s1", "s2"), Gen.chooseNum(1, 900))))
      .map(_.zipWithIndex.map { case ((src, tk), i) => (i.toLong, src, tk) })
    holds(forAll(rowsGen) { rows =>
      val df = rows.toDF("doc_id", "source", "toks")
      val got = Sampling.packSequences(df, "doc_id", "toks", "source", 500)
        .select("doc_id", "bin").as[(Long, Long)].collect().toMap
      val expected = rows.groupBy(_._2).values.flatMap { group =>
        val sorted = group.sortBy(_._1)
        val prefix = sorted.map(_._3.toLong).scanLeft(0L)(_ + _)
        sorted.map(_._1).zip(prefix.map(p => math.floor(p.toDouble / 500).toLong))
      }.toMap
      got == expected
    })
  }

  test("componentsStar labels equal a driver-side union-find on random graphs") {
    val edgesGen = Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L))))
    holds(forAll(edgesGen) { es =>
      val pairs = es.toDF("id_a", "id_b")
      // force the distributed star rounds — the driver-finish path IS a
      // union-find, so testing it against one would be circular
      val got = Dedup.componentsStar(pairs, finishThreshold = -1L)
        .as[(Long, Long)].collect().toMap
      // union-find ground truth: comp = min reachable id
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = es.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
      got == expected
    })
  }

  test("nnJoin results carry true cosines, valid neighbors, and at most k rows per query") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-5, 5)).map(_.map(_.toFloat / 5f).toArray)
    val setGen = Gen.zip(
      Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, vecGen)),
      Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, vecGen)))
    holds(forAll(setGen) { case (cvecs, qvecs) =>
      val corpus = cvecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val queries = qvecs.zipWithIndex.map { case (v, i) => (100L + i, v) }.toDF("vec_id", "embedding")
      val got = Similarity.nnJoin(corpus, "vec_id", queries, "vec_id", "embedding",
        dim = 4, k = 2, nPlanes = 3, probes = 3).collect()
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
        if (na * nb > 0) d / (na * nb) else 0.0
      }
      got.forall { r =>
        val qid = r.getLong(0); val cid = r.getLong(1); val sim = r.getDouble(2)
        cid >= 0 && cid < cvecs.length && qid >= 100 &&
          math.abs(sim - cos(qvecs((qid - 100).toInt), cvecs(cid.toInt))) < 1e-6
      } && got.groupBy(_.getLong(0)).values.forall(_.length <= 2)
    })
  }

  test("takeTokenBudget equals the naive global running-sum window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val budgetGen = Gen.chooseNum(0L, 400L)
    val rowsGen = Gen.chooseNum(1, 60).flatMap { n =>
      Gen.listOfN(n, for {
        src <- Gen.oneOf("a", "b", "c")
        toks <- Gen.chooseNum(1L, 50L)
      } yield (src, toks))
    }
    holds(forAll(rowsGen, budgetGen) { (rows, budget) =>
      val df = rows.zipWithIndex
        .map { case ((src, t), i) => (i.toLong, src, t) }
        .toDF("doc_id", "source", "toks")
      val got = Sampling.takeTokenBudget(df, "doc_id", "toks", "source", budget)
        .select("doc_id").as[Long].collect().toSet
      // naive form: one global running-sum window per source, same hash
      val h = Dedup.xxBaseHash(concat(col("doc_id").cast("string"), lit(":")))
      val naive = df
        .withColumn("_cum", sum(col("toks")).over(
          Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
            .rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("_cum") <= budget)
        .select("doc_id").as[Long].collect().toSet
      got == naive
    })
  }

  test("takeTokenBudget degenerate budgets: zero keeps nothing, huge keeps all") {
    val df = (1L to 30L).map(i => (i, if (i % 2 == 0) "x" else "y", 10L))
      .toDF("doc_id", "source", "toks")
    assert(Sampling.takeTokenBudget(df, "doc_id", "toks", "source", 0L).count() == 0)
    assert(Sampling.takeTokenBudget(df, "doc_id", "toks", "source", 1000000L).count() == 30)
    // exact boundary: budget of 50 per source keeps exactly 5 docs of 10
    val cut = Sampling.takeTokenBudget(df, "doc_id", "toks", "source", 50L)
    assert(cut.groupBy("source").count().as[(String, Long)].collect().toMap
      == Map("x" -> 5L, "y" -> 5L))
  }

  test("takeTokenBudgets (per-source map) equals the naive per-source window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val budgetsGen = for {
      ba <- Gen.chooseNum(0L, 400L)
      bb <- Gen.chooseNum(0L, 400L)
      dflt <- Gen.oneOf(0L, 150L)
    } yield (Map("a" -> ba, "b" -> bb), dflt) // "c" always falls to the default
    val rowsGen = Gen.chooseNum(1, 60).flatMap { n =>
      Gen.listOfN(n, for {
        src <- Gen.oneOf("a", "b", "c")
        toks <- Gen.chooseNum(1L, 50L)
      } yield (src, toks))
    }
    holds(forAll(rowsGen, budgetsGen) { case (rows, (budgets, dflt)) =>
      val df = rows.zipWithIndex
        .map { case ((src, t), i) => (i.toLong, src, t) }
        .toDF("doc_id", "source", "toks")
      val got = Sampling.takeTokenBudgets(df, "doc_id", "toks", "source", budgets, dflt)
        .select("doc_id").as[Long].collect().toSet
      val h = Dedup.xxBaseHash(concat(col("doc_id").cast("string"), lit(":")))
      val budgetExpr = coalesce(element_at(typedLit(budgets), col("source")), lit(dflt))
      val naive = df
        .withColumn("_cum", sum(col("toks")).over(
          Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
            .rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("_cum") <= budgetExpr)
        .select("doc_id").as[Long].collect().toSet
      got == naive
    })
  }

  test("takeMixture derives min(available, round(share·total)) budgets and never redistributes") {
    import org.apache.spark.sql.functions._
    // a: plenty of supply, cut by its share; c: scarce, capped at its
    // supply (NO redistribution of the shortfall to a/b); d: unweighted,
    // dropped entirely
    val rows =
      (1L to 50L).map(i => (i, "a", 10L)) ++
        (101L to 150L).map(i => (i, "b", 10L)) ++
        (201L to 203L).map(i => (i, "c", 10L)) ++
        (301L to 310L).map(i => (i, "d", 10L))
    val df = rows.toDF("doc_id", "source", "toks")
    val weights = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    val got = Sampling.takeMixture(df, "doc_id", "toks", "source", weights, totalTokens = 800L)
    val bySource = got.groupBy("source").agg(sum(col("toks")).as("t"))
      .as[(String, Long)].collect().toMap
    assert(!bySource.contains("d"), "unweighted sources must be dropped")
    assert(bySource("a") == 400L, s"a gets round(0.5*800) = 400: $bySource")
    assert(bySource("b") == 200L, s"b gets round(0.25*800) = 200: $bySource")
    assert(bySource("c") == 30L, s"c caps at its 30 available tokens: $bySource")
    // equivalence with the explicit budget map (the one-call form is sugar)
    val manual = Sampling.takeTokenBudgets(df, "doc_id", "toks", "source",
      Map("a" -> 400L, "b" -> 200L, "c" -> 30L))
      .select("doc_id").as[Long].collect().toSet
    assert(got.select("doc_id").as[Long].collect().toSet == manual)
  }

  test("takeTokenBudgets with a uniform map equals single-budget takeTokenBudget") {
    val df = (1L to 40L).map(i => (i, s"s${i % 4}", (i % 7) + 1L))
      .toDF("doc_id", "source", "toks")
    val uniform = (0 to 3).map(i => s"s$i" -> 30L).toMap
    val got = Sampling.takeTokenBudgets(df, "doc_id", "toks", "source", uniform)
      .select("doc_id").as[Long].collect().toSet
    val want = Sampling.takeTokenBudget(df, "doc_id", "toks", "source", 30L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
  }
}
