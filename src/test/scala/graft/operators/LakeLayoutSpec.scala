package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-layout claims from SURVEY: partitioning the lake by dataset
  * makes F8 dataset filters partition-pruning (not data-filtering), and the
  * profiler really is a single scan.
  */
class LakeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("F8 on a dataset-partitioned lake prunes partitions at plan time") {
    val dir = tmpDir("lake")
    (1 to 300).map(i => (i.toLong, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
      .write.partitionBy("source").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("source") === "src1")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("src1"),
      s"dataset filter must be a partition filter:\n$scan")
    assert(q.count() == 100)
    // and it is NOT a post-scan data filter: no Filter node over the scan
    // on the partition column
    assert(!scan.contains("PushedFilters: [IsNotNull(source)"),
      "partition column must not appear as a pushed data filter")
  }

  test("profiler computes all column stats in one scan") {
    val df = (1 to 100).map(i => (i.toLong, s"v${i % 5}")).toDF("id", "tag")
    val profiled = Profiler.profile(df, Seq("id", "tag"))
    assert(profiled.count() == 2)
    val byCol = profiled.collect().map(r => r.getString(0) -> r).toMap
    assert(byCol("id").getLong(3) == 100) // n_distinct
    assert(byCol("tag").getLong(3) == 5)
    assert(byCol("tag").getString(4) == "v0" && byCol("tag").getString(5) == "v4")
  }
}
