package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files => JFiles, Paths => JPaths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the WARC container source ([[Warc]]): framing round-trip,
  * HTTP-header stripping on `response` records, torn-tail tolerance, and
  * the no-shuffle per-file parse shape.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = spark.range(n).select(
    concat(lit("https://example.test/doc/"), col("id")).as("url"),
    lit("2024-01-01T00:00:00Z").as("date"),
    concat(lit("body text æøå "), col("id"), lit("\nline two ")).as("text"))

  test("warc.gz round-trip preserves every record's url and body exactly") {
    val dir = tmpDir("warc-rt")
    val written = Warc.write(corpus(500).repartition(4), dir)
    assert(written == 500)
    val back = Warc.responses(Warc.read(spark, s"$dir/*.warc.gz"))
    assert(back.count() == 500)
    val want = corpus(500).select(col("url"), col("text"))
    assert(back.select(col("url"), col("text")).exceptAll(want).count() == 0)
    assert(want.exceptAll(back.select(col("url"), col("text"))).count() == 0)
    // doc ids are stable across re-reads
    val ids1 = Warc.responses(Warc.read(spark, s"$dir/*.warc.gz"))
      .select("doc_id").as[String].collect().sorted
    val ids2 = Warc.responses(Warc.read(spark, s"$dir/*.warc.gz"))
      .select("doc_id").as[String].collect().sorted
    assert(ids1.sameElements(ids2) && ids1.distinct.length == 500)
  }

  test("response records strip the HTTP header block; other types are filtered") {
    val dir = tmpDir("warc-http")
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>payload</html>"
    val body = http.getBytes(StandardCharsets.UTF_8)
    val rec =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x.test/\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Type: application/http\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
    val meta =
      "WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 2\r\n\r\nxx\r\n\r\n"
    JFiles.write(JPaths.get(s"$dir/a.warc"),
      (rec + http + "\r\n\r\n" + meta).getBytes(StandardCharsets.UTF_8))
    val rows = Warc.responses(Warc.read(spark, s"$dir/*.warc")).collect()
    assert(rows.length == 1, "request records are not documents")
    assert(rows.head.getAs[String]("text") == "<html>payload</html>",
      "the HTTP envelope strips; only the payload remains")
  }

  test("a torn trailing record ends the file cleanly; complete records survive") {
    val dir = tmpDir("warc-torn")
    Warc.write(corpus(50).coalesce(1), dir)
    // decompress, cut mid-final-record, store as a plain .warc
    val gz = JFiles.list(JPaths.get(dir)).filter(_.toString.endsWith(".warc.gz"))
      .findFirst().get()
    val in = new java.util.zip.GZIPInputStream(JFiles.newInputStream(gz))
    val all = in.readAllBytes(); in.close()
    JFiles.write(JPaths.get(s"$dir/torn.warc"), all.dropRight(20))
    JFiles.delete(gz)
    val n = Warc.read(spark, s"$dir/*.warc").count()
    assert(n == 49, s"the torn last record drops, the other 49 parse: $n")
  }

  test("the parse is per-file with no shuffle") {
    val dir = tmpDir("warc-plan")
    Warc.write(corpus(100).repartition(3), dir)
    val df = Warc.responses(Warc.read(spark, s"$dir/*.warc.gz"))
      .agg(count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("SinglePartition"),
      s"per-file parse + partial agg must not shuffle rows:\n$plan")
    assert(df.head().getLong(0) == 100)
  }
}
