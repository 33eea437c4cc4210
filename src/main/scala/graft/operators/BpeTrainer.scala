package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", arXiv:1508.07909) — the
  * training side of the byte-pair tokenizer the engine already evaluates
  * ([[graft.functions.Bpe]] implements the published cl100k ALGORITHM for
  * counting; this learns a merge table from a corpus).
  *
  * The standard trainer shortcut keeps it Spark-shaped: merges are learned
  * over the DISTINCT-word frequency table, so each iteration's pair count
  * aggregates `O(vocabulary)` rows weighted by word frequency — never the
  * corpus. One iteration = one map-side-combined aggregate + a 1-row argmax
  * collect + an embarrassingly-parallel array fold; `k` merges = `k` such
  * passes over a table that SHRINKS as merges apply (lineage is cut per
  * iteration, so plans stay constant-size).
  *
  * Deterministic by construction: the argmax tie-breaks on
  * (count desc, a asc, b asc), and greedy left-to-right application is a
  * per-word fold — the same corpus yields the same merge table on any
  * cluster layout.
  */
object BpeTrainer {

  final case class Merge(a: String, b: String)

  /** Whitespace words with counts — the trainer's working set. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    // spreadSmall: per-token explode on a one-split scan (guide §2.5)
    Par.spreadSmall(docs).select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Weighted adjacent-pair counts over the current symbol arrays. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(
          element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Greedy left-to-right application of one merge to a symbol array: when
    * the accumulator's last element is `a` and the next symbol is `b`, the
    * two fuse and scanning continues AFTER the fused token (so "aaa" under
    * merge (a,a) becomes ["aa", "a"], the BPE contract).
    */
  private[operators] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Learn up to `k` merges from the corpus. Stops early when no pair
    * occurs twice (merging hapax pairs memorizes the corpus).
    */
  def train(docs: DataFrame, textCol: String, k: Int, minCount: Long = 2L): Seq[Merge] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // Lineage is cut each round (the fold otherwise nests k plans deep) by
    // re-rooting the vocabulary table on a locally-checkpointed RDD we hold
    // a handle to. The checkpoint truncates the RDD dependency chain (a
    // plain persist would not: round k's tasks serialize the whole k-deep
    // DAG — StackOverflowError near 256 merges), and the handle lets each
    // round release its predecessor's blocks deterministically instead of
    // waiting for a driver GC — k merges hold ONE copy of the table, not k.
    var held: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    def cutLineage(df: DataFrame): DataFrame = {
      val rdd = df.rdd
      rdd.localCheckpoint()
      rdd.count() // materialize + truncate BEFORE dropping the previous blocks
      if (held != null) held.unpersist(blocking = false)
      held = rdd
      df.sparkSession.createDataFrame(rdd, df.schema)
    }
    var words = cutLineage(
      wordCounts(docs, textCol).select(split(col("w"), "").as("syms"), col("n")))
    var i = 0
    var exhausted = false
    while (i < k && !exhausted) {
      val top = pairCounts(words)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(a, b)
        words = cutLineage(words.withColumn("syms", applyMerge(col("syms"), a, b)))
      }
      i += 1
    }
    if (held != null) held.unpersist(blocking = false)
    merges.toSeq
  }

  /** Segment words with a learned merge table (apply merges in order) —
    * the inference twin of [[train]], for inspecting what the vocabulary
    * does to a corpus. Returns `df` with `pieces: array<string>`.
    */
  def segment(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val start = docs.withColumn("pieces", split(col(textCol), ""))
    merges.foldLeft(start) { (df, m) =>
      df.withColumn("pieces", applyMerge(col("pieces"), m.a, m.b))
    }
  }
}
