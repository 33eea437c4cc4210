package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over edge DataFrames. First member: PageRank — the
  * web-corpus importance weight LLM data pipelines use to prioritize
  * crawl data (domain/URL authority), computed Spark-first: each power
  * iteration is one equi-join (ranks onto edge sources) plus one keyed
  * aggregation (contributions by destination), so an iteration's cost is
  * two shuffles on the edge table regardless of iteration count, and the
  * edge table itself is never collected or mutated.
  *
  * Determinism contract (same discipline as [[Similarity.kmeans]]):
  * ranks are integer micro-units (scale [[Graph.RankScale]]) and every
  * update is integer arithmetic — division before summation, damping as
  * the exact rational `dampNum/100`. Integer addition is associative, so
  * results are bit-identical under any partitioning, and a SQL oracle
  * replays the iterations verbatim (`g_pagerank`).
  *
  * Semantics notes, pinned by GraphSpec:
  *  - nodes = union of sources and destinations (isolated rank mass from
  *    integer floor division stays un-redistributed);
  *  - dangling nodes (no out-edges) keep their rank out of circulation —
  *    the conventional simplification; re-inject externally if the
  *    textbook constant-sum variant is needed;
  *  - multi-edges count once: callers pass the edge set they mean
  *    (the battery's URL graph distincts (src, dst)).
  */
object Graph {

  /** Micro-unit scale: 1e6 keeps three extra decimal digits over the
    * common 1e-3 rank tolerances while `N × RankScale` stays far inside
    * Long for any realistic node count.
    */
  val RankScale: Long = 1000000L

  /** PageRank over `edges` (`srcCol`, `dstCol` — any equality-comparable
    * type). Returns one row per node: (`node`, `rank`) with `rank` in
    * micro-units; Σ rank ≤ RankScale (floor-division loss + dangling
    * leakage, both deterministic).
    *
    * @param dampNum damping factor numerator over 100 (85 → d = 0.85)
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, dampNum: Long = 85L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampNum >= 0 && dampNum <= 100, "dampNum must be 0..100")
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .localCheckpoint(false) // reused every iteration: compute the edge set once
    val nodes = e.select(col("_src").as("node"))
      .unionByName(e.select(col("_dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0L))
    val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_deg"))
    // base = ((100 - d)·(S/N))/100 and r₀ = S/N: spelled in this exact
    // association so the SQL oracle can reproduce every intermediate
    val r0 = RankScale / n
    val base = ((100L - dampNum) * r0) / 100L
    // per-iteration lineage cut with an explicit handle (the BpeTrainer
    // pattern): k iterations hold ONE materialized rank table, not k
    var held: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    def rotate(df: DataFrame): DataFrame = {
      val rdd = df.rdd
      rdd.localCheckpoint()
      rdd.count()
      if (held != null) held.unpersist(blocking = false)
      held = rdd
      df.sparkSession.createDataFrame(rdd, df.schema)
    }
    var ranks = nodes.withColumn("rank", lit(r0))
    for (_ <- 0 until iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "_src"), Seq("_src"))
        .join(outdeg, Seq("_src"))
        // `div`, not `/`: Spark's / on longs is a DOUBLE divide — the
        // integral form keeps every intermediate an exact long
        .select(col("_dst").as("node"), expr("rank div _deg").as("_c"))
        .groupBy(col("node")).agg(sum(col("_c")).as("_in"))
      ranks = rotate(nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"$base + ($dampNum * coalesce(_in, 0L)) div 100").as("rank")))
    }
    ranks // backed by the final checkpoint; blocks release on GC
  }
}
