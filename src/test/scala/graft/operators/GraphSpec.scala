package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank laws: hand-computed integer micro-unit iterations, partition
  * invariance (the determinism contract), dangling-node semantics, and
  * degenerate inputs.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A→B, A→C, B→C, C→A: N=3, r0 = 1e6/3 = 333333, base = (15·333333)/100 = 49999
  private def triangle = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")).toDF("src", "dst")

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select("node", "rank").as[(String, Long)].collect().toMap

  test("one iteration matches the hand-computed integer arithmetic") {
    val r = ranksOf(Graph.pageRank(triangle, "src", "dst", iters = 1))
    // contribs: B ← A/2 = 166666; C ← A/2 + B/1 = 499999; A ← C/1 = 333333
    // rank = 49999 + (85·in)/100
    assert(r == Map("A" -> 333332L, "B" -> 191665L, "C" -> 474998L))
    // floor-division loss only — never rank creation
    assert(r.values.sum <= Graph.RankScale)
  }

  test("zero iterations return the uniform base rank for every node") {
    val r = ranksOf(Graph.pageRank(triangle, "src", "dst", iters = 0))
    assert(r.values.toSet == Set(333333L))
    assert(r.keySet == Set("A", "B", "C"))
  }

  test("results are bit-identical under repartitioning") {
    val a = ranksOf(Graph.pageRank(triangle.repartition(7), "src", "dst", iters = 3))
    val b = ranksOf(Graph.pageRank(triangle.coalesce(1), "src", "dst", iters = 3))
    assert(a == b)
  }

  test("a dangling node keeps its rank out of circulation (documented leakage)") {
    val chain = Seq(("A", "B")).toDF("src", "dst")
    // N=2, r0=500000, base=75000. Iter1: B ← 500000 → 500000; A → 75000.
    val r1 = ranksOf(Graph.pageRank(chain, "src", "dst", iters = 1))
    assert(r1 == Map("A" -> 75000L, "B" -> 500000L))
    // Iter2: B ← A/1 = 75000 → 75000 + 63750 = 138750; B's mass vanished
    val r2 = ranksOf(Graph.pageRank(chain, "src", "dst", iters = 2))
    assert(r2 == Map("A" -> 75000L, "B" -> 138750L))
  }

  test("authority accumulates: the most-cited node ranks first") {
    // star: many docs cite one hub, plus a spread of minor targets
    val edges = ((1 to 20).map(i => (s"d$i", "hub.example")) ++
      (1 to 5).map(i => (s"d$i", s"minor$i.example"))).toDF("src", "dst")
    val top = Graph.pageRank(edges, "src", "dst", iters = 2)
      .orderBy(col("rank").desc, col("node"))
      .select("node").as[String].head()
    assert(top == "hub.example")
  }

  test("empty edge set yields an empty ranking, not an error") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.pageRank(empty, "src", "dst").count() == 0)
  }
}
