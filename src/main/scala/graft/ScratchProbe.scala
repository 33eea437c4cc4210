package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Throwaway bisection probe for round-14 optimization (not a contract main). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docsCk = Tables.documents(spark, sfDir).localCheckpoint(false)
    println(s"[probe] ck sizeInBytes=${docsCk.queryExecution.optimizedPlan.stats.sizeInBytes} " +
      s"fits=${graft.operators.Par.fitsOneSplit(docsCk)} " +
      s"scanFits=${graft.operators.Par.fitsOneSplit(Tables.documents(spark, sfDir))}")
    val vecs = Tables.embeddings(spark, sfDir)
    val corpus = vecs.filter(col("vec_id") % 20 =!= 0)
    // warmup
    corpus.count()

    (1 to 2).foreach { r =>
      println(s"=== round $r ===")
      time("corpus scan only")(noop(corpus))
      time("corpus + norm")(noop(corpus.withColumn("_n", norm(col("embedding")))))
      time("corpus + lshBucket(6)")(noop(
        corpus.withColumn("_b", lshBucket(col("embedding"), 64, 6))))
      time("corpus + norm + bucket")(noop(
        corpus.withColumn("_n", norm(col("embedding")))
          .withColumn("_b", lshBucket(col("embedding"), 64, 6))))
      val masks = (0 to 3).flatMap(rr => (0 until 64).combinations(rr).map(_.foldLeft(0)((a, b) => a | (1 << b)))).distinct // placeholder, not used
      val plan = graft.operators.GraphAnn.buildPlan(corpus.count(), 64, targetRecall = 0.9)
      println(s"  plan: nPlanes=${plan.nPlanes} probes=${plan.probes} degree=${plan.degree} hubs=${plan.hubs} strategy=${plan.strategy}")
      val knn = time("nnJoin full") {
        val k = graft.operators.Similarity.nnJoin(corpus, "vec_id", corpus, "vec_id",
          "embedding", 64, k = plan.degree + 1, nPlanes = plan.nPlanes, probes = plan.probes)
        k.collect(); k
      }
      if (r == 2) println(knn.queryExecution.executedPlan.toString)
      time("buildGraph full") {
        graft.operators.GraphAnn.buildGraph(corpus, "vec_id", "embedding", 64,
          degree = plan.degree, nPlanes = plan.nPlanes, probes = plan.probes,
          hubs = plan.hubs)
      }
    }
    spark.stop()
  }
}
