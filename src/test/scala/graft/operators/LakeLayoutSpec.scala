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

  test("IVF probe on a cid-partitioned index prunes partitions at plan time") {
    val dir = tmpDir("ivflake") + "/index"
    val vecs = (0 until 60).map { i =>
      val angle = i / 60.0 * 2 * math.Pi
      (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val built = Similarity.buildIvf(vecs, "embedding", "vec_id", k = 6)
    Similarity.writeIvf(spark, built, dir)
    val loaded = Similarity.readIvf(spark, dir)
    assert(loaded.centroids.map(_._1) == built.centroids.map(_._1).sorted)

    val q = Array(1f, 0.05f, 0f, 0f)
    val res = Similarity.topKIvf(loaded, "embedding", "vec_id", q, 3, nProbes = 2)
    val scan = res.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cid"),
      s"probe filter must prune cid partitions at the scan:\n$scan")
    // pruned search returns the same neighbors as the in-memory index
    val mem = Similarity.topKIvf(built, "embedding", "vec_id", q, 3, nProbes = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(res.select("vec_id").as[Long].collect().toSeq == mem)
  }

  test("lake compaction folds small files, preserves rows, keeps pruning alive") {
    val dir = java.nio.file.Files.createTempDirectory("lake_compact").toString + "/t"
    val df = spark.range(2000).select(
      col("id"), (col("id") % 4).cast("string").as("src"),
      concat(lit("row"), col("id")).as("payload"))
    df.repartition(25).write.partitionBy("src").parquet(dir)
    val before = Lake.dataFileCount(spark, dir)
    assert(before >= 40, s"fixture should be fragmented, got $before files")
    val stats = Lake.compact(spark, dir, Seq("src"))
    assert(stats.rows == 2000 && stats.filesBefore == before)
    assert(stats.filesAfter == 4, s"one file per partition, got ${stats.filesAfter}")
    // row-identical content after the swap
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    val sums = back.groupBy("src").agg(sum("id").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    (0 to 3).foreach { m =>
      val ids = (0L until 2000L).filter(_ % 4 == m)
      assert(sums(m.toString) == ((ids.sum, ids.size.toLong)))
    }
    // partition pruning survives compaction
    val scan = back.filter(col("src") === "1")
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("src"))

    // non-partitioned table: file count follows the record target, and
    // maxRecordsPerFile re-splits anything oversized
    val dir2 = java.nio.file.Files.createTempDirectory("lake_compact2").toString + "/t2"
    spark.range(2000).toDF("id").repartition(30).write.parquet(dir2)
    val st2 = Lake.compact(spark, dir2, targetRecordsPerFile = 500)
    assert(st2.rows == 2000 && st2.filesAfter >= 4 && st2.filesAfter <= 8,
      s"~2000/500 files expected, got ${st2.filesAfter}")
    assert(spark.read.parquet(dir2).agg(sum("id")).head().getLong(0) == (0L until 2000L).sum)
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

  test("zkey column matches the driver twin and maps aligned tiles to contiguous ranges") {
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val got = pts.withColumn("zk", Lake.zkey(col("x"), col("y"), 8))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, zk) =>
      assert(zk == Lake.zkeyLocal(x, y, 8), s"zkey twin mismatch at ($x,$y)")
    }
    // an aligned 16x16 tile occupies one contiguous z-range of exactly 256
    // keys — the locality property file pruning relies on
    val tile = got.filter { case (x, y, _) => x >= 16 && x < 32 && y >= 16 && y < 32 }
      .map(_._3).sorted
    assert(tile.length == 256 && tile.last - tile.head == 255,
      s"tile z-range [${tile.head}, ${tile.last}] must be contiguous")
  }

  test("writeClustered lays files out along the key with tight per-file ranges") {
    val dir = tmpDir("zlake") + "/events"
    val df = (0 until 4096).map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 101 % 256).toLong)
    }.toDF("id", "xb", "yb")
    Lake.writeClustered(df, Lake.zkey(col("xb"), col("yb"), 8), nFiles = 16, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4096, "clustering must preserve every row")
    assert(!back.columns.contains("_zk"), "the layout key must not leak into the schema")
    // per physical file: recompute the key range; ranges must not overlap
    // across files (each file covers a contiguous slice of the z-space)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.length >= 8, s"expected ~16 data files, got ${files.length}")
    val ranges = files.toSeq.flatMap { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select(Lake.zkey(col("xb"), col("yb"), 8).as("zk"))
        .agg(min(col("zk")), max(col("zk")), count(lit(1))).head()
      if (rows.getLong(2) == 0) None else Some((rows.getLong(0), rows.getLong(1)))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file z-ranges overlap: $ranges")
      case _ =>
    }
  }

  test("clusterInPlace swaps in the z-ordered layout losslessly") {
    val dir = tmpDir("zswap") + "/table"
    val df = (0 until 2048).map { i =>
      (i.toLong, (i * 7 % 64).toLong, (i * 13 % 64).toLong)
    }.toDF("id", "xb", "yb")
    df.repartition(32).write.parquet(dir) // fragmented, unclustered
    val st = Lake.clusterInPlace(spark, dir, "xb", "yb", bits = 6, nFiles = 8)
    assert(st.rows == 2048 && st.filesAfter <= 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2048)
    assert(back.select(sum(col("id"))).head().getLong(0) == (0 until 2048).map(_.toLong).sum,
      "every row must survive the swap")
    assert(!new java.io.File(dir + ".zorder-tmp").exists(), "staging dir must be renamed away")
  }
}
