package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.operators.SkewJoin

/** Native codegen token_count: exact equivalence with the regex composition
  * and with the Scala tokenizer; plus the salted-join helper.
  */
class TokenCountSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "hello world", "hello, world!", "", "   ", "a1b2 c3", "x;y;z",
    "multi  spaces\tand\nnewlines", "trailing space ", "(parens) [brackets]",
    "numbers 123 456", "semi;colon,comma.dot", "ae oe aa æøå",
    "§ 5 og § 10"
  )

  test("native expression equals regex composition and Scala tokenizer") {
    val df = samples.toDF("t")
    val out = df.select(
      call_function("token_count", col("t")).as("native"),
      size(regexp_extract_all(col("t"), lit("[A-Za-z0-9]+|[^\\sA-Za-z0-9]"), lit(0))).cast("long").as("regex")
    ).collect()
    out.zip(samples).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch on '$s'")
      assert(r.getLong(0) == graft.functions.WordSymbolTokenizer.countTokens(s).toLong, s"tokenizer mismatch on '$s'")
    }
  }

  test("interpreted eval matches codegen path") {
    for (s <- samples) {
      val viaEval = TokenCount.count(UTF8String.fromString(s))
      assert(viaEval == graft.functions.WordSymbolTokenizer.countTokens(s).toLong, s"on '$s'")
    }
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.range(100).select(concat(lit("word "), col("id")).as("t"))
      .select(call_function("token_count", col("t")).as("n"))
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    assert(df.agg(sum("n")).head().getLong(0) == 200L)
  }

  test("bucketed tables join without any exchange (co-located join)") {
    import graft.operators.Bucketing
    def dropAll(): Unit = Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) { loc.listFiles().foreach(_.delete()); loc.delete() }
    }
    dropAll()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the non-broadcast path
    try {
      val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      Bucketing.writeBucketed(a, "bkt_a", "k", 8)
      Bucketing.writeBucketed(b, "bkt_b", "k", 8)
      val joined = Bucketing.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must be shuffle-free:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      dropAll()
    }
  }

  test("salted join equals plain join, spreads the hot key, stays deterministic") {
    val big = (Seq.fill(1000)(("hot", 1)) ++ (1 to 50).map(i => (s"k$i", i))).toDF("k", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8).groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == 1000L)
    // deterministic across reruns (no rand() in the salt)
    val again = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8).groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(again == salted)
  }
}
