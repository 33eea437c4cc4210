package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions, VectorFunctions}

/** The extension-injected SQL function surface: every registered function is
  * callable from spark.sql text and agrees with its DataFrame-API twin.
  */
class SqlRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def oneSql[T](expr: String): T =
    spark.sql(s"SELECT $expr AS v").head().getAs[T]("v")

  test("all registered functions resolve from SQL text") {
    Seq("token_count", "nfc_normalize", "top_k", "normalize_text",
      "quality_score", "lang_id", "cosine_sim", "quantize_int8",
      "random_project").foreach { f =>
      assert(spark.catalog.functionExists(f), s"$f must be registered")
    }
  }

  test("registered random_project agrees with the DataFrame API and the local twin") {
    val v = Array(1.0f, -2.0f, 0.5f, 3.0f)
    val viaSql = spark.sql(
      "SELECT random_project(array(1.0F, -2.0F, 0.5F, 3.0F), 4, 4) AS p")
      .head().getAs[scala.collection.Seq[Float]]("p").toSeq
    val viaDf = spark.range(1)
      .select(VectorFunctions.randomProject(
        lit(v).cast("array<float>"), 4, 4).as("p"))
      .head().getAs[scala.collection.Seq[Float]]("p").toSeq
    assert(viaSql == viaDf)
    assert(viaSql == VectorFunctions.randomProjectLocal(v, 4).toSeq)
    // a non-literal dim is rejected, not silently mis-planned
    val e = intercept[Exception] {
      spark.sql("SELECT random_project(array(1.0F), CAST(rand()*2 AS INT), 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("SQL bindings agree with the DataFrame-API definitions") {
    assert(oneSql[Long]("token_count('ab cd, ef')") == 4L)
    assert(oneSql[String]("normalize_text(' ab   c ')") == "ab c")
    val viaSql = oneSql[Double]("quality_score('the quick brown fox jumps over the lazy dog')")
    val viaDf = spark.range(1)
      .select(TextFunctions.qualityScore(lit("the quick brown fox jumps over the lazy dog")).as("v"))
      .head().getDouble(0)
    assert(viaSql == viaDf)
    assert(oneSql[String]("lang_id('the cat and the dog is in the house')") == "en")
    assert(oneSql[Double]("cosine_sim(array(3.0F, 4.0F), array(3.0F, 4.0F))") == 1.0)
    // quantize_int8 returns struct(scale, q); codes agree with the local twin
    val q = spark.sql("SELECT quantize_int8(array(0.5F, -1.0F, 0.25F)).q AS q")
      .head().getAs[scala.collection.Seq[Long]]("q").toSeq
    assert(q == VectorFunctions.quantizeInt8Local(Array(0.5f, -1.0f, 0.25f)).toSeq)
  }

  test("registered top_k works per-group from SQL") {
    Seq((1, 5), (1, 9), (1, 2), (2, 7), (2, 1)).toDF("g", "x")
      .createOrReplaceTempView("topk_in")
    val out = spark.sql("SELECT g, top_k(x, 2) AS t FROM topk_in GROUP BY g ORDER BY g")
      .as[(Int, Seq[Int])].collect().toSeq
    assert(out == Seq((1, Seq(9, 5)), (2, Seq(7, 1))))
  }
}
