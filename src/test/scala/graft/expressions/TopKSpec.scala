package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native top_k aggregate: equivalence with the window form, bounded-buffer
  * behavior across partitions, and map-side partial aggregation in the plan.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("top_k(struct, k) equals row_number-over-window top-k, merged across partitions") {
    val df = (1 to 1000).map(i => (s"g${i % 7}", i * 37 % 501, i.toLong))
      .toDF("g", "score", "id")
      .repartition(8) // force non-trivial partial/merge path
    val viaAgg = df.groupBy("g")
      .agg(expr("top_k(struct(score, id), 5)").as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("score").desc, col("id").desc)))
      .filter(col("rn") <= 5)
      .select("g", "score", "id")
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
    assert(viaAgg.count() == 35)
  }

  test("top_k participates in partial (map-side) aggregation") {
    val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
    val plan = df.groupBy("g").agg(expr("top_k(v, 2)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k"), s"expected a partial aggregate phase:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), "typed imperative aggregate path")
  }

  test("top_k skips nulls, handles ties and fewer-than-k groups") {
    val df = Seq(
      ("a", Some(3)), ("a", None), ("a", Some(9)), ("b", Some(1))
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(expr("top_k(v, 3)").as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[Int])].collect().toMap
    assert(out("a") == Seq(9, 3), "nulls skipped, descending order")
    assert(out("b") == Seq(1), "groups smaller than k return what exists")
  }

  test("top_k rejects non-literal or non-positive k") {
    val df = Seq((1, 2)).toDF("g", "v")
    val e = intercept[Exception](df.groupBy("g").agg(expr("top_k(v, 0)")).collect())
    assert(e.getMessage.toLowerCase.contains("top_k") || e.getMessage.contains("positive"))
  }
}
