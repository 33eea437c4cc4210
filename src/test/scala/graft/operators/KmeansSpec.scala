package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the deterministic fixed-point k-means and the IVF build on top
  * of it.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated direction clusters on the unit circle (cosine
  // k-means separates by angle)
  private def clustered = (0 until 90).map { i =>
    val base = (i % 3) * 2.0 * math.Pi / 3.0
    val angle = base + (i / 3 % 10 - 5) * 0.01
    (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat, 0f, 0f))
  }.toDF("vec_id", "embedding")

  test("centroids are bit-identical under repartitioning") {
    val a = Similarity.kmeans(clustered.repartition(7), "embedding", "vec_id", k = 3, iters = 3)
    val b = Similarity.kmeans(clustered.coalesce(1), "embedding", "vec_id", k = 3, iters = 3)
    assert(a.size == 3 && b.size == 3)
    a.zip(b).foreach { case ((cid1, v1), (cid2, v2)) =>
      assert(cid1 == cid2)
      assert(v1.toSeq == v2.toSeq) // exact float equality, not approx
    }
  }

  test("iterations pull centroids onto the angular clusters") {
    val cents = Similarity.kmeans(clustered, "embedding", "vec_id", k = 3, iters = 3)
    // every final centroid direction is within 0.1 rad of one of the three
    // cluster axes, and all three axes are claimed
    val axes = Seq(0.0, 2.0 * math.Pi / 3.0, 4.0 * math.Pi / 3.0)
    val claimed = cents.map { case (_, v) =>
      val ang = math.atan2(v(1), v(0))
      axes.indexWhere(a => math.abs(math.atan2(math.sin(ang - a), math.cos(ang - a))) < 0.1)
    }
    assert(claimed.forall(_ >= 0), s"centroids off-axis: ${cents.map(_._2.toSeq)}")
    assert(claimed.toSet.size == 3)
  }

  test("a starved cell keeps its previous centroid") {
    // two identical seed vectors: ties assign to the larger cid, so cid 0
    // never receives members and must carry its seed unchanged
    val dup = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(dup, "embedding", "vec_id", k = 2, iters = 1).toMap
    assert(cents(0).toSeq == Seq(1f, 0f, 0f, 0f))
    // ...while cid 1 moved to the mean of all four members
    assert(math.abs(cents(1)(0) - 0.725f) < 1e-6 && math.abs(cents(1)(1) - 0.275f) < 1e-6)
  }

  test("full-probe k-means IVF equals brute-force search") {
    val index = Similarity.buildIvfKmeans(clustered, "embedding", "vec_id", k = 3, iters = 2)
    val q = Array(0.9f, 0.1f, 0f, 0f)
    val viaIvf = Similarity.topKIvf(index, "embedding", "vec_id", q, k = 5, nProbes = 3)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.topK(clustered, "embedding", "vec_id", q, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(viaIvf == brute)
  }

  test("appendToIvf equals a full re-assignment under the same centroids") {
    val dir = tmpDir("ivfapp") + "/index"
    val old = clustered.filter(col("vec_id") < 60)
    val fresh = clustered.filter(col("vec_id") >= 60)
    val subsetIdx = Similarity.buildIvf(old, "embedding", "vec_id", k = 3)
    Similarity.writeIvf(spark, subsetIdx, dir)
    Similarity.appendToIvf(spark, fresh, "embedding", "vec_id", dir)
    val appended = Similarity.readIvf(spark, dir)
    // same centroid table as the subset build (readIvf sorts by cid)
    assert(appended.centroids.map { case (c, v) => (c, v.toSeq) }.sortBy(_._1) ==
      subsetIdx.centroids.map { case (c, v) => (c, v.toSeq) }.sortBy(_._1))
    // assignment of the whole corpus under those centroids, row for row
    val expected = Similarity.assignCells(clustered, "embedding", subsetIdx.centroids)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    val got = appended.assigned
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    assert(got == expected)
    // and a search through the appended index sees the appended vectors
    val q = Array(0.9f, 0.1f, 0f, 0f)
    val hits = Similarity.topKIvf(appended, "embedding", "vec_id", q, k = 5, nProbes = 3)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.topK(clustered, "embedding", "vec_id", q, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits == brute, "full probe over the appended index must equal brute force")
  }

  test("retrainIvf preserves the row set and retrains from stored vectors only") {
    val dir = tmpDir("ivfret") + "/index"
    Similarity.writeIvf(spark,
      Similarity.buildIvf(clustered.filter(col("vec_id") < 30), "embedding", "vec_id", k = 3), dir)
    Similarity.appendToIvf(spark,
      clustered.filter(col("vec_id") >= 30), "embedding", "vec_id", dir)
    Similarity.retrainIvf(spark, dir, "embedding", "vec_id", k = 3, iters = 2)
    val retrained = Similarity.readIvf(spark, dir)
    // no rows lost or duplicated across append + retrain
    assert(retrained.assigned.select("vec_id").as[Long].collect().sorted.toSeq ==
      (0L until 90L))
    // retraining from the full stored set equals building from the corpus
    val direct = Similarity.buildIvfKmeans(clustered, "embedding", "vec_id", k = 3, iters = 2)
    assert(retrained.centroids.map { case (c, v) => (c, v.toSeq) }.sortBy(_._1) ==
      direct.centroids.map { case (c, v) => (c, v.toSeq) }.sortBy(_._1))
  }

  test("snapshot-driven IVF refresh: rebuild/append/noop, replay once, retire fallback") {
    val t = tmpDir("ivfsnap-t") + "/t"
    val idx = tmpDir("ivfsnap-i") + "/index"
    val cur = tmpDir("ivfsnap-c") + "/c"
    Snapshots.create(spark, t)
    Snapshots.append(spark, t, clustered.filter(col("vec_id") < 60))
    def refresh() = Similarity.refreshIvfFromSnapshot(
      spark, t, idx, "embedding", "vec_id", cur, k = 3, iters = 2)
    def rows() = Similarity.readIvf(spark, idx).assigned
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(refresh() == "rebuild")
    assert(rows() == (0L until 60L))
    // two appended commits register as one marker-gated segment
    Snapshots.append(spark, t, clustered.filter(col("vec_id") >= 60 && col("vec_id") < 75))
    Snapshots.append(spark, t, clustered.filter(col("vec_id") >= 75))
    assert(refresh() == "append")
    assert(rows() == (0L until 90L))
    assert(refresh() == "noop")
    // crash between index write and cursor commit: the segment high-water
    // says the range is already folded in → noop, counted once
    Snapshots.commitCursor(cur, 1L)
    assert(refresh() == "noop")
    assert(rows() == (0L until 90L), "the marker-gated segment must not double-append")
    // search through the maintained index equals brute over the table
    val q = Array(0.9f, 0.1f, 0f, 0f)
    val hits = Similarity.topKIvf(Similarity.readIvf(spark, idx),
      "embedding", "vec_id", q, k = 5, nProbes = 3).select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.topK(clustered, "embedding", "vec_id", q, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits == brute)
    // crash replay AFTER the table advanced (round-13 advisory): replay
    // range (1,4] ≠ crashed round's (1,3] — a range-named segment id alone
    // would re-append (1,3]'s 30 vectors; the high-water clamp appends
    // exactly the new commit
    Snapshots.commitCursor(cur, 1L)
    Snapshots.append(spark, t,
      clustered.withColumn("vec_id", col("vec_id") + 100).filter(col("vec_id") < 110))
    assert(refresh() == "append")
    assert(rows() == ((0L until 90L) ++ (100L until 110L)),
      "advanced replay must fold (1,3] exactly once")
    // a retire cannot be expressed append-only: rebuild excludes it
    Snapshots.deleteWhereMor(spark, t, col("vec_id") < 10)
    assert(refresh() == "rebuild")
    assert(rows() == ((10L until 90L) ++ (100L until 110L)))
    assert(refresh() == "noop")
  }
}
