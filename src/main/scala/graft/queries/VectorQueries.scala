package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorFunctions._
import graft.operators.{Dedup, Similarity}

/** Embedding-column battery: cosine top-k similarity search (E2) and the
  * vector-side dedup/ANN extensions over `embeddings.parquet`.
  */
object VectorQueries {

  /** The fixed probe: the stored vector of vec_id = 0 (driver-side single-row
    * lookup — the query vector, not the corpus).
    */
  private def queryVec(s: org.apache.spark.sql.SparkSession, d: String): Array[Float] =
    embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  val all: Map[String, Q] = Map(

    // E2: brute-force cosine top-k — scan → project → TakeOrdered, no shuffle.
    "e2_cosine_topk" -> Q(
      (s, d) => Similarity.topK(
        embeddings(s, d).filter(col("vec_id") =!= 0),
        "embedding", "vec_id", queryVec(s, d), 10
      ),
      Some("""WITH q AS (SELECT generate_subscripts(embedding,1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
             |           FROM embeddings WHERE vec_id = 0),
             |v AS (SELECT vec_id, generate_subscripts(embedding,1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
             |      FROM embeddings WHERE vec_id <> 0),
             |sims AS (SELECT v.vec_id, sum(v.x*q.x) AS dot, sqrt(sum(v.x*v.x)) AS na
             |         FROM v JOIN q ON v.i = q.i GROUP BY v.vec_id),
             |nb AS (SELECT sqrt(sum(x*x)) AS nb FROM q)
             |SELECT vec_id, round(dot/(na*(SELECT nb FROM nb)), 6) AS sim FROM sims
             |ORDER BY dot/(na*(SELECT nb FROM nb)) DESC, vec_id
             |LIMIT 10""".stripMargin),
      Seq("E2")
    ),

    // E2 with a metadata predicate — the reference's documented search
    // semantics (`lg search --filter`): top-k within label=1 only.
    "e2_filtered_topk" -> Q(
      (s, d) => Similarity.topK(
        embeddings(s, d).filter(col("vec_id") =!= 0 && col("label") === 1),
        "embedding", "vec_id", queryVec(s, d), 5
      ),
      Some("""WITH q AS (SELECT generate_subscripts(embedding,1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
             |           FROM embeddings WHERE vec_id = 0),
             |v AS (SELECT vec_id, generate_subscripts(embedding,1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
             |      FROM embeddings WHERE vec_id <> 0 AND label = 1),
             |sims AS (SELECT v.vec_id, sum(v.x*q.x) AS dot, sqrt(sum(v.x*v.x)) AS na
             |         FROM v JOIN q ON v.i = q.i GROUP BY v.vec_id),
             |nb AS (SELECT sqrt(sum(x*x)) AS nb FROM q)
             |SELECT vec_id, round(dot/(na*(SELECT nb FROM nb)), 6) AS sim FROM sims
             |ORDER BY dot/(na*(SELECT nb FROM nb)) DESC, vec_id
             |LIMIT 5""".stripMargin),
      Seq("E2", "F6")
    ),

    // Vector norms: aggregate/zip_with arithmetic parity check.
    "vec_norm_stats" -> Q(
      (s, d) =>
        embeddings(s, d)
          .withColumn("nrm", round(norm(col("embedding")), 4))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), round(sum(col("nrm")), 2).as("sum_norm")),
      Some("""WITH n AS (SELECT label, vec_id, round(sqrt(sum(x*x)), 4) AS nrm FROM
             |  (SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
             |  GROUP BY label, vec_id)
             |SELECT label, count(*) AS n, round(sum(nrm), 2) AS sum_norm FROM n GROUP BY label""".stripMargin),
      Seq("E2")
    ),

    // Label centroid distance: per label, how close each member is to the
    // label's mean vector — an IVF-style partition statistic.
    "vec_centroid_sim" -> Q(
      (s, d) => {
        val dim = 64
        val byLabel = embeddings(s, d)
          .select(col("label"), col("vec_id"), col("embedding"))
        val centroids = byLabel
          .groupBy(col("label"))
          .agg(
            array((0 until dim).map(i => avg(element_at(col("embedding"), i + 1).cast("double"))): _*)
              .as("centroid")
          )
        byLabel.join(broadcast(centroids), Seq("label"))
          .withColumn("sim", cosine(col("embedding"), col("centroid")))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), round(sum(col("sim")), 4).as("sum_sim"))
      },
      Some("""WITH unnested AS (
             |  SELECT label, vec_id, generate_subscripts(embedding, 1) AS i,
             |         CAST(unnest(embedding) AS DOUBLE) AS x
             |  FROM embeddings),
             |centroids AS (
             |  SELECT label, i, avg(x) AS c FROM unnested GROUP BY label, i),
             |dots AS (
             |  SELECT u.label, u.vec_id,
             |         sum(u.x * c.c) AS dot,
             |         sqrt(sum(u.x * u.x)) AS na,
             |         sqrt(sum(c.c * c.c)) AS nb
             |  FROM unnested u JOIN centroids c ON u.label = c.label AND u.i = c.i
             |  GROUP BY u.label, u.vec_id)
             |SELECT label, count(*) AS n,
             |       round(sum(CASE WHEN na*nb > 0 THEN dot/(na*nb) ELSE 0 END), 4) AS sum_sim
             |FROM dots GROUP BY label""".stripMargin),
      Seq("E2")
    ),

    // ANN via an IVF index: nearest-centroid cells, probe the best 2 cells
    // (rows-only; recall pinned by OperatorsSpec).
    "e2_ann_ivf_topk" -> Q(
      (s, d) => {
        val index = Similarity.buildIvf(
          embeddings(s, d).filter(col("vec_id") =!= 0), "embedding", "vec_id", k = 16)
        Similarity.topKIvf(index, "embedding", "vec_id", queryVec(s, d), k = 10, nProbes = 2)
      },
      None,
      Seq("E2")
    ),

    // ANN via random-hyperplane LSH buckets (approximate — no SQL oracle;
    // the driver records a rows-only check).
    "e2_ann_lsh_topk" -> Q(
      (s, d) => Similarity.topKLsh(
        embeddings(s, d).filter(col("vec_id") =!= 0),
        "embedding", "vec_id", queryVec(s, d), 10, dim = 64, nPlanes = 8, probes = 1
      ),
      None,
      Seq("E2")
    ),

    // MinHash-LSH near-dup candidates over documents (banded; no
    // CartesianProduct). Oracle-matched: both the 16 seeded token hashes and
    // the band-bucket hash use the DuckDB-recomputable md5Lower60, so the
    // full signature → band → candidate-pair pipeline is value-checked.
    "dd_minhash_lsh" -> Q(
      (s, d) =>
        Dedup.minhashCandidates(documents(s, d), "doc_id", "text", numHashes = 16, bands = 4,
          seededHash = Dedup.md5SeededHash, bucketHash = Dedup.md5BucketHash)
          .agg(count(lit(1)).as("n_candidate_pairs")),
      Some("""WITH docs AS (
             |  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS t FROM docs WHERE len(toks) > 0),
             |hashed AS (
             |  SELECT doc_id, s.seed,
             |         min(CAST((md5_number_lower(CAST(s.seed AS VARCHAR) || '|' || t) >> 4) AS BIGINT)) AS mh
             |  FROM tok CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s
             |  GROUP BY doc_id, s.seed),
             |sigs AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM hashed GROUP BY doc_id),
             |bands AS (
             |  SELECT doc_id, b.band,
             |         CAST((md5_number_lower(array_to_string(list_slice(sig, b.band * 4 + 1, b.band * 4 + 4), ',')) >> 4) AS BIGINT) AS bucket
             |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b),
             |capped AS (
             |  SELECT doc_id, band, bucket FROM (
             |    SELECT doc_id, band, bucket, count(*) OVER (PARTITION BY band, bucket) AS bn
             |    FROM bands) WHERE bn <= 10000),
             |pairs AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
             |  FROM capped a JOIN capped b2 USING (band, bucket)
             |  WHERE a.doc_id < b2.doc_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_candidate_pairs FROM pairs""".stripMargin),
      Seq("A6")
    ),

    // SimHash signatures + near-dup bucketing by the top signature bits.
    // Oracle-matched: the 60-bit md5-derived token hash is recomputable in
    // DuckDB (`md5_number_lower >> 4`), so the whole signature is checked
    // value-for-value, not rows-only.
    "dd_simhash" -> Q(
      (s, d) => {
        val docs = documents(s, d)
          .select(col("doc_id"), Dedup.wordSet(col("text")).as("toks"))
          .withColumn("sig", Dedup.simhashWith(col("toks"), Dedup.md5Lower60, 60))
        docs.groupBy(shiftright(col("sig"), 48).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_docs"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS t
             |  FROM documents),
             |hashed AS (
             |  SELECT doc_id, CAST((md5_number_lower(t) >> 4) AS BIGINT) AS h FROM toks),
             |bitsums AS (
             |  SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
             |  FROM hashed CROSS JOIN (SELECT unnest(range(0, 60)) AS i) bits
             |  GROUP BY doc_id, i),
             |sigs AS (
             |  SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sig
             |  FROM bitsums GROUP BY doc_id),
             |buckets AS (SELECT sig >> 48 AS bucket, count(*) AS n FROM sigs GROUP BY bucket)
             |SELECT CAST(count(*) AS BIGINT) AS n_buckets, CAST(sum(n) AS BIGINT) AS n_docs
             |FROM buckets""".stripMargin),
      Seq("A6")
    ),

    // Embedding-cosine near-dup, hyperplane-bucketed.
    "dd_cosine_lsh" -> Q(
      (s, d) =>
        Dedup.cosineCandidates(embeddings(s, d), "vec_id", "embedding", dim = 64, nPlanes = 6, threshold = 0.5)
          .agg(count(lit(1)).as("n_pairs")),
      None,
      Seq("E2")
    )
  )
}
