package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Pins the E1 oracle contract: the ReplayableProvider's JVM arithmetic must
  * equal the Spark-side md5Lower60 column expression (which in turn is
  * oracle-equal to DuckDB's `md5_number_lower(x) >> 4` — proven by the
  * hash-matched dedup oracles that share it).
  */
class ReplayableProviderSpec extends SparkSpec {
  import spark.implicits._

  test("provider vectors equal the md5Lower60 column-expression construction") {
    val texts = Seq("hello world", "Lov om burettslag § 5-11", "", "æøå unicode ✓")
    val dims = 16
    val p = new ReplayableProvider(dims)
    val fromProvider = p.embedBatch(texts)

    val df = texts.toDF("text")
    val cols = (0 until dims).map { i =>
      (((Dedup.md5Lower60(concat(md5(col("text")), lit(s":$i"))) % 2048) - 1024) / 1024.0)
        .cast("float").as(s"v$i")
    }
    val fromExpr = df.select(cols: _*).collect()
    texts.indices.foreach { r =>
      val expect = (0 until dims).map(fromExpr(r).getFloat)
      assert(fromProvider(r).toSeq == expect, s"row $r diverges")
    }
  }

  test("components are multiples of 2^-10 in [-1, 1): exact in float32 and double") {
    val p = new ReplayableProvider(32)
    p.embedBatch(Seq("a", "b", "some longer text")).foreach { v =>
      v.foreach { x =>
        assert(x >= -1f && x < 1f)
        assert(x * 1024f == math.round(x * 1024f).toFloat, s"$x not a multiple of 2^-10")
      }
    }
  }

  test("same text, same vector; model name encodes dimensions") {
    val p = new ReplayableProvider(16)
    assert(p.embedBatch(Seq("x")).head.toSeq == p.embedBatch(Seq("x")).head.toSeq)
    assert(p.modelName == "md5-replayable-16")
    assert(p.dimensions == 16)
  }
}
