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
}
