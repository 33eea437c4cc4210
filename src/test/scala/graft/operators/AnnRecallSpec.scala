package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recall@k of the ANN paths against exact brute force on the sf0.1
  * embedding table — the harness that makes index-tuning regressions
  * surface as test failures instead of silent quality drift.
  *
  * Ground truth is [[Similarity.nnJoin]] at full Hamming radius (probes =
  * nPlanes scans every bucket, so the candidate set is the whole corpus);
  * every approximate sweep shares its per-query top-k tie rule, so recall
  * deficits measure pruning, not tie noise. Floors are set ~0.05 under the
  * measured values on the driver-generated testdata (exact numbers in
  * BENCHNOTES.md §ANN recall) — regenerated data may need re-calibration,
  * same convention as the perplexity threshold.
  */
class AnnRecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"
  private val dim = 64
  private val k = 10
  private val nPlanes = 8

  private def available = new java.io.File(s"$sfDir/embeddings.parquet").exists()

  private lazy val corpus: DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)

  // every 20th vector queries the full corpus (100 queries over 2000 vecs)
  private lazy val queries: DataFrame =
    corpus.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
      .localCheckpoint(true)

  private lazy val exact: DataFrame =
    Similarity.nnJoin(corpus, "vec_id", queries, "qid", "embedding",
      dim, k, nPlanes, probes = nPlanes).localCheckpoint(true)

  private def lshRecall(probes: Int): Double =
    Similarity.recallAtK(
      Similarity.nnJoin(corpus, "vec_id", queries, "qid", "embedding",
        dim, k, nPlanes, probes),
      exact, "qid")

  test("IVF recall@10 rises with nProbes and is exact at full probe") {
    assume(available, s"$sfDir not present")
    val index = Similarity.buildIvf(corpus, "embedding", "vec_id", 16)
    val recalls = Seq(1, 2, 4, 8, 16).map { p =>
      p -> Similarity.recallAtK(
        Similarity.nnJoinIvf(index, "vec_id", queries, "qid", "embedding", k, p),
        exact, "qid")
    }
    info(recalls.map { case (p, r) => f"nProbes=$p%2d recall@10=$r%.4f" }.mkString("  "))
    recalls.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra - 1e-9, s"recall fell from $ra (nProbes=$pa) to $rb (nProbes=$pb)")
    }
    val byProbe = recalls.toMap
    assert(byProbe(16) == 1.0, "probing every cell must equal brute force")
    // measured 0.801 / 0.303 on the driver-generated vectors (BENCHNOTES):
    // near-uniform synthetic data, so absolute recall is data-limited —
    // floors sit ~0.05 under measurement to catch regressions, not to
    // grade the data
    assert(byProbe(8) >= 0.75, f"recall@10 at nProbes=8/16 was ${byProbe(8)}%.4f, floor 0.75")
    assert(byProbe(1) >= 0.25, f"recall@10 at nProbes=1/16 was ${byProbe(1)}%.4f, floor 0.25")
  }

  test("k-means-trained IVF beats seed-refined IVF at equal probe width") {
    assume(available, s"$sfDir not present")
    val seedIdx = Similarity.buildIvf(corpus, "embedding", "vec_id", 16)
    val kmIdx = Similarity.buildIvfKmeans(corpus, "embedding", "vec_id", 16, iters = 5)
    val pairs = Seq(2, 4, 8).map { p =>
      val seed = Similarity.recallAtK(
        Similarity.nnJoinIvf(seedIdx, "vec_id", queries, "qid", "embedding", k, p), exact, "qid")
      val km = Similarity.recallAtK(
        Similarity.nnJoinIvf(kmIdx, "vec_id", queries, "qid", "embedding", k, p), exact, "qid")
      info(f"nProbes=$p%2d  seed-refined=$seed%.4f  kmeans-trained=$km%.4f")
      (p, seed, km)
    }
    pairs.foreach { case (p, seed, km) =>
      assert(km >= seed - 0.02, f"k-means training lost recall at nProbes=$p: $km%.4f < $seed%.4f")
    }
  }

  test("multi-probe LSH recall@10 rises with Hamming radius") {
    assume(available, s"$sfDir not present")
    val recalls = Seq(0, 1, 2, 3).map(p => p -> lshRecall(p))
    info(recalls.map { case (p, r) => f"radius=$p recall@10=$r%.4f" }.mkString("  "))
    recalls.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra - 1e-9, s"recall fell from $ra (radius=$pa) to $rb (radius=$pb)")
    }
    val byRadius = recalls.toMap
    // measured 0.426 at radius 2 (BENCHNOTES) — floor with the same margin
    assert(byRadius(2) >= 0.37, f"recall@10 at radius 2 was ${byRadius(2)}%.4f, floor 0.37")
    // full radius IS the ground truth definition — a self-check that the
    // sweep is wired to the same operator family
    assert(lshRecall(nPlanes) == 1.0)
  }
}
