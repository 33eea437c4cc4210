package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._
import graft.operators.{BpeTrainer, Dedup, Drift, Graph, ImportanceSampling, LanguageModel, NaiveBayes, QualityFilters, Sampling, Similarity, TextSearch}

/** Scalar-function battery (SURVEY §2.9 C-series), document filters
  * (F-series), and the text-analysis / dedup training-data operators — all
  * over the `documents` table.
  */
object TextQueries {

  val all: Map[String, Q] = Map(

    // F6: doc_id predicate on the store.
    "f6_docid_filter" -> Q(
      (s, d) =>
        documents(s, d).filter(col("doc_id") % 100 === 7)
          .select(col("doc_id"), col("lang"), col("n_chars")),
      Some("SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 100 = 7"),
      Seq("F6")
    ),

    // F8: dataset pattern filter.
    "f8_dataset_pattern" -> Q(
      (s, d) =>
        documents(s, d).filter(col("source").like("src1%"))
          .groupBy(col("source")).agg(count(lit(1)).as("n")),
      Some("SELECT source, count(*) AS n FROM documents WHERE source LIKE 'src1%' GROUP BY source"),
      Seq("F8")
    ),

    // F9: non-empty text filter.
    "f9_nonempty_text" -> Q(
      (s, d) =>
        documents(s, d)
          .filter(length(trim(col("text"))) > 0 && col("n_chars") >= 200)
          .groupBy(col("lang")).agg(count(lit(1)).as("n")),
      Some("""SELECT lang, count(*) AS n FROM documents
             |WHERE length(trim(text)) > 0 AND n_chars >= 200 GROUP BY lang""".stripMargin),
      Seq("F9")
    ),

    // F7: token-limit routing predicates.
    "f7_token_routing" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("toks", tokenCount(col("text")))
          .withColumn(
            "route",
            when(col("toks") > 60, lit("split"))
              .when(col("toks") < 20, lit("merge"))
              .otherwise(lit("keep"))
          )
          .groupBy(col("route")).agg(count(lit(1)).as("n"), sum(col("toks")).as("sum_toks")),
      Some("""SELECT route, count(*) AS n, CAST(sum(toks) AS BIGINT) AS sum_toks FROM (
             |  SELECT CASE WHEN toks > 60 THEN 'split' WHEN toks < 20 THEN 'merge' ELSE 'keep' END AS route, toks
             |  FROM (SELECT CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS toks
             |        FROM documents)) GROUP BY route""".stripMargin),
      Seq("F7", "C1")
    ),

    // A1: group-by "hash" (source plays the source_hash role).
    "a1_group_by_source" -> Q(
      (s, d) =>
        documents(s, d).groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars")),
      Some("""SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY source""".stripMargin),
      Seq("A1")
    ),

    // A6: array_distinct dedup of extracted tokens.
    "a6_distinct_words" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("nd", size(array_distinct(split(trim(col("text")), " "))).cast("long"))
          .groupBy(col("lang"))
          .agg(sum(col("nd")).as("sum_distinct_words"), count(lit(1)).as("n")),
      Some("""SELECT lang, CAST(sum(len(list_distinct(string_split(trim(text), ' ')))) AS BIGINT)
             |  AS sum_distinct_words, count(*) AS n
             |FROM documents GROUP BY lang""".stripMargin),
      Seq("A6")
    ),

    // C3: sentence split (Java lookbehind on the Spark side; the oracle uses
    // a punctuation-marker rewrite since RE2 lacks lookbehind).
    "c3_sentence_split" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn(
            "sent_text",
            concat(
              substring(col("text"), 1, 50), lit(". "),
              substring(col("text"), 51, 40), lit("! "),
              substring(col("text"), 91, 30), lit("?")
            )
          )
          .withColumn("sentences", sentenceSplit(col("sent_text")))
          .select(
            col("doc_id"),
            size(col("sentences")).cast("long").as("n_sentences"),
            length(element_at(col("sentences"), 1)).cast("long").as("first_len")
          ),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(replace(replace(replace(sent_text,'. ','.|'),'! ','!|'),'? ','?|'),'|')) AS BIGINT) AS n_sentences,
             |  CAST(length(string_split(replace(replace(replace(sent_text,'. ','.|'),'! ','!|'),'? ','?|'),'|')[1]) AS BIGINT) AS first_len
             |FROM (SELECT doc_id,
             |  substr(text,1,50) || '. ' || substr(text,51,40) || '! ' || substr(text,91,30) || '?' AS sent_text
             |  FROM documents)""".stripMargin),
      Seq("C3")
    ),

    // C4: date extraction from a dokid.
    "c4_date_extract" -> Q(
      (s, d) =>
        orders(s, d)
          .withColumn("dokid", concat(lit("dok-"), date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("-"), col("o_orderkey")))
          .withColumn("doc_date", extractDate(col("dokid")))
          .groupBy(col("doc_date")).agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(regexp_extract(dokid, '(\d{4}-\d{2}-\d{2})', 1) AS DATE) AS doc_date, count(*) AS n
             |FROM (SELECT 'dok-' || strftime(o_orderdate, '%Y-%m-%d') || '-' || o_orderkey AS dokid FROM orders)
             |GROUP BY doc_date""".stripMargin),
      Seq("C4")
    ),

    // C5: paragraph-ref extraction → `§ n`.
    "c5_paragraph_ref" -> Q(
      (s, d) =>
        part(s, d)
          .withColumn("raw", concat(lit("paragraf-"), (col("p_partkey") % 30).cast("string")))
          .withColumn("ref", paragraphRef(col("raw")))
          .groupBy(col("ref")).agg(count(lit(1)).as("n")),
      Some("""SELECT '§ ' || regexp_extract('paragraf-' || CAST(p_partkey % 30 AS VARCHAR), 'paragraf-(\d+)', 1) AS ref,
             |count(*) AS n FROM part GROUP BY ref""".stripMargin),
      Seq("C5")
    ),

    // C6: lovdata-ref regexp_extract_all + distinct count.
    "c6_crossref_extract" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn(
            "t2",
            concat(
              lit("se lov/1814-05-17-"), (col("doc_id") % 7).cast("string"),
              lit(" og lov/2005-06-17-"), (col("doc_id") % 13).cast("string"),
              lit(" jf lov/1814-05-17-"), (col("doc_id") % 7).cast("string"),
              lit(" "), col("text")
            )
          )
          .withColumn("refs", lovdataRefs(col("t2")))
          .select(
            col("doc_id"),
            size(col("refs")).cast("long").as("n_refs"),
            size(array_distinct(col("refs"))).cast("long").as("n_distinct_refs"),
            concat_ws(",", col("refs")).as("refs_csv")
          ),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(t2, 'lov/\d{4}-\d{2}-\d{2}-\d+')) AS BIGINT) AS n_refs,
             |  CAST(len(list_distinct(regexp_extract_all(t2, 'lov/\d{4}-\d{2}-\d{2}-\d+'))) AS BIGINT) AS n_distinct_refs,
             |  array_to_string(regexp_extract_all(t2, 'lov/\d{4}-\d{2}-\d{2}-\d+'), ',') AS refs_csv
             |FROM (SELECT doc_id,
             |  'se lov/1814-05-17-' || CAST(doc_id % 7 AS VARCHAR) ||
             |  ' og lov/2005-06-17-' || CAST(doc_id % 13 AS VARCHAR) ||
             |  ' jf lov/1814-05-17-' || CAST(doc_id % 7 AS VARCHAR) || ' ' || text AS t2
             |  FROM documents)""".stripMargin),
      Seq("C6")
    ),

    // C7: href-prefix array filter.
    "c7_href_filter" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn(
            "hrefs",
            array(
              concat(lit("lov/"), col("source")),
              concat(lit("doc/"), col("doc_id").cast("string")),
              concat(lit("lov/x-"), col("lang"))
            )
          )
          .select(col("doc_id"), size(lovHrefs(col("hrefs"))).cast("long").as("n_lov")),
      Some("""SELECT doc_id,
             |CAST(len(list_filter(['lov/' || source, 'doc/' || CAST(doc_id AS VARCHAR), 'lov/x-' || lang],
             |     x -> starts_with(x, 'lov/'))) AS BIGINT) AS n_lov
             |FROM documents""".stripMargin),
      Seq("C7")
    ),

    // C8: cross_refs list ⇄ CSV round-trip.
    "c8_crossrefs_csv" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("csv", crossRefsToCsv(slice(split(trim(col("text")), " "), 1, 5)))
          .select(
            col("doc_id"),
            col("csv"),
            size(csvToCrossRefs(col("csv"))).cast("long").as("n_back")
          ),
      Some("""SELECT doc_id, csv,
             |CAST(len(list_filter(string_split(csv, ','), x -> length(x) > 0)) AS BIGINT) AS n_back
             |FROM (SELECT doc_id, array_to_string(string_split(trim(text), ' ')[1:5], ',') AS csv
             |      FROM documents)""".stripMargin),
      Seq("C8", "K5")
    ),

    // C9: depth = count of '-' in a chunk id.
    "c9_chunk_depth" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("chunk_id", concat(lit("doc"), col("doc_id"), lit("-"), expr("repeat('s-', CAST(doc_id % 4 AS INT))")))
          .withColumn("depth", chunkDepth(col("chunk_id")))
          .groupBy(col("depth")).agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(len(string_split(chunk_id, '-')) - 1 AS BIGINT) AS depth, count(*) AS n
             |FROM (SELECT 'doc' || CAST(doc_id AS VARCHAR) || '-' || repeat('s-', CAST(doc_id % 4 AS INT)) AS chunk_id
             |      FROM documents) GROUP BY depth""".stripMargin),
      Seq("C9")
    ),

    // C10: text joins via concat_ws.
    "c10_concat_ws" -> Q(
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"), concat_ws(" | ", col("lang"), col("source"), col("n_chars").cast("string")).as("title")),
      Some("""SELECT doc_id, lang || ' | ' || source || ' | ' || CAST(n_chars AS VARCHAR) AS title
             |FROM documents""".stripMargin),
      Seq("C10")
    ),

    // C11: positional id synthesis (doc_id + position after a stable sort).
    "c11_positional_ids" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        documents(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("chunk_id", concat(lit("doc"), col("doc_id"), lit("_chunk_"), col("rn")))
          .groupBy(col("source"))
          .agg(countDistinct(col("chunk_id")).as("n_ids"), count(lit(1)).as("n_rows"))
      },
      Some("""SELECT source, count(DISTINCT chunk_id) AS n_ids, count(*) AS n_rows FROM (
             |  SELECT source, 'doc' || CAST(doc_id AS VARCHAR) || '_chunk_' ||
             |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS VARCHAR) AS chunk_id
             |  FROM documents) GROUP BY source""".stripMargin),
      Seq("C11")
    ),

    // C12: path stem → doc_id, dataset-dir strip.
    "c12_path_stem" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("path", concat(lit("data/"), col("source"), lit(".tar.bz2/doc_"), col("doc_id"), lit(".xml")))
          .select(
            col("doc_id"),
            pathStem(col("path")).as("stem"),
            datasetDir(concat(col("source"), lit(".tar.bz2"))).as("dataset_dir")
          ),
      Some("""SELECT doc_id,
             |  regexp_replace(regexp_extract(path, '[^/]+$'), '\.[A-Za-z0-9.]+$', '') AS stem,
             |  regexp_replace(source || '.tar.bz2', '\.tar\.bz2$', '') AS dataset_dir
             |FROM (SELECT doc_id, source, 'data/' || source || '.tar.bz2/doc_' || CAST(doc_id AS VARCHAR) || '.xml' AS path
             |      FROM documents)""".stripMargin),
      Seq("C12")
    ),

    // C13: sha2-256 content hashing.
    "c13_sha256" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("h", sha2(col("text"), 256))
          .groupBy(substring(col("h"), 1, 1).as("bucket"))
          .agg(count(lit(1)).as("n")),
      Some("SELECT substr(sha256(text),1,1) AS bucket, count(*) AS n FROM documents GROUP BY bucket"),
      Seq("C13")
    ),

    // C16: coalescing fallback chain.
    "c16_coalesce_fallback" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("maybe_heading", when(col("lang") === "en", lit("")).otherwise(col("lang")))
          .withColumn("heading", coalesceNonEmpty(col("maybe_heading"), col("source")))
          .groupBy(col("heading")).agg(count(lit(1)).as("n")),
      Some("""SELECT coalesce(nullif(CASE WHEN lang='en' THEN '' ELSE lang END, ''), source) AS heading,
             |count(*) AS n FROM documents GROUP BY heading""".stripMargin),
      Seq("C16")
    ),

    // The registered-SQL surface: the same engine operators reached through
    // spark.sql() text — token_count (native codegen expression) and
    // normalize_text (composition binding) resolved from the extension-
    // injected FunctionRegistry, proving a SQL-only user gets the identical
    // semantics the DataFrame API battery verifies. chr(769)/chr(7) build
    // the same NFD + control salt as ta_normalize on both engines.
    "sql_function_registry" -> Q(
      (s, d) => {
        documents(s, d).createOrReplaceTempView("documents_sqlreg")
        s.sql("""SELECT lang, count(*) AS n,
                |       sum(token_count(text)) AS sum_toks,
                |       CAST(sum(length(normalize_text(
                |         text || ' Ame\u0301lie\u0007  x'))) AS BIGINT) AS sum_norm_len
                |FROM documents_sqlreg GROUP BY lang""".stripMargin)
      },
      Some("""SELECT lang, count(*) AS n,
             |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))) AS BIGINT) AS sum_toks,
             |       CAST(sum(length(trim(regexp_replace(
             |         regexp_replace(nfc_normalize(text || ' Ame' || chr(769) || 'lie' || chr(7) || '  x'),
             |           '[\x00-\x08\x0B-\x1F\x7F\x{80}-\x{9F}]', '', 'g'),
             |         '\s+', ' ', 'g')))) AS BIGINT) AS sum_norm_len
             |FROM documents GROUP BY lang""".stripMargin),
      Seq("C1")
    ),

    // C1/C2: deterministic token count + hard-split part count.
    "c1_c2_token_stats" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("toks", tokenCount(col("text")))
          .withColumn("n_parts", ceil(col("toks").cast("double") / 8.0).cast("long"))
          .groupBy(col("lang"))
          .agg(sum(col("toks")).as("sum_toks"), sum(col("n_parts")).as("sum_parts")),
      Some("""SELECT lang, CAST(sum(toks) AS BIGINT) AS sum_toks,
             |CAST(sum(CAST(ceil(toks / 8.0) AS BIGINT)) AS BIGINT) AS sum_parts
             |FROM (SELECT lang, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS toks
             |      FROM documents) GROUP BY lang""".stripMargin),
      Seq("C1", "C2")
    ),

    // Canonical text normalization (NFC → control strip → whitespace
    // collapse). The input is salted with an NFD sequence (e + combining
    // acute), a control byte, and ragged spaces so every stage does real
    // work; the oracle replays it via DuckDB's nfc_normalize + the same
    // explicit-range control class, and the 60-bit md5 fingerprint of every
    // normalized string is folded with bit_xor (order-free, overflow-free)
    // so the contents are value-checked, not just measured.
    "ta_normalize" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("norm",
            normalizeText(concat(col("text"), lit(" Ame\u0301lie\u0007  x"))))
          .withColumn("fp", Dedup.md5Lower60(col("norm")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(length(col("norm"))).as("sum_len"),
            expr("bit_xor(fp)").as("xor_fp")
          ),
      Some("""WITH salted AS (
             |  SELECT lang, text || ' Ame' || chr(769) || 'lie' || chr(7) || '  x' AS t
             |  FROM documents),
             |normed AS (
             |  SELECT lang, trim(regexp_replace(
             |           regexp_replace(nfc_normalize(t),
             |             '[\x00-\x08\x0B-\x1F\x7F\x{80}-\x{9F}]', '', 'g'),
             |           '\s+', ' ', 'g')) AS nt
             |  FROM salted)
             |SELECT lang, count(*) AS n,
             |       CAST(sum(length(nt)) AS BIGINT) AS sum_len,
             |       bit_xor(CAST((md5_number_lower(nt) >> 4) AS BIGINT)) AS xor_fp
             |FROM normed GROUP BY lang""".stripMargin),
      Seq("C1")
    ),

    // Text analysis: quality signals per language.
    "ta_quality_signals" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("dwr", round(distinctWordRatio(col("text")), 6))
          .groupBy(col("lang"))
          .agg(
            round(sum(col("dwr")), 4).as("sum_dwr"),
            round(sum(length(col("text")).cast("double")), 2).as("sum_len"),
            count(lit(1)).as("n")
          ),
      Some("""SELECT lang, round(sum(dwr),4) AS sum_dwr, round(sum(CAST(length(text) AS DOUBLE)),2) AS sum_len, count(*) AS n
             |FROM (SELECT lang, text,
             |  round(CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE) /
             |        CAST(greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS DOUBLE), 6) AS dwr
             |  FROM documents) GROUP BY lang""".stripMargin),
      Seq("C1")
    ),

    // Document fingerprint (normalized-hash prefix).
    "ta_fingerprint" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("fp", fingerprint(col("text")))
          .groupBy(col("source"))
          .agg(countDistinct(col("fp")).as("n_fp"), count(lit(1)).as("n")),
      Some("""SELECT source, count(DISTINCT substr(sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),1,16)) AS n_fp,
             |count(*) AS n FROM documents GROUP BY source""".stripMargin),
      Seq("C13")
    ),

    // Exact dedup via content hash.
    "dd_exact" -> Q(
      (s, d) =>
        documents(s, d)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(sha2(col("text"), 256)).as("n_unique"),
            (count(lit(1)) - countDistinct(sha2(col("text"), 256))).as("n_dups")
          ),
      Some("""SELECT lang, count(*) AS n_docs, count(DISTINCT sha256(text)) AS n_unique,
             |count(*) - count(DISTINCT sha256(text)) AS n_dups
             |FROM documents GROUP BY lang""".stripMargin),
      Seq("C13")
    ),

    // Global exact line dedup (RefinedWeb first-occurrence rule): documents
    // are line-ified into 10-word lines (the corpus has no raw newlines),
    // then every distinct line keeps only its first (doc, pos) occurrence
    // corpus-wide and docs are reassembled. Exact-duplicate documents lose
    // ALL their lines (t_sha = sha256('')); partial overlaps lose only the
    // shared lines. The oracle replays line-ification, the first-occurrence
    // window, and the reassembly; per-doc sha256 pins byte identity.
    "dd_line_dedup" -> Q(
      (s, d) => {
        val ws = split(trim(col("text")), "\\s+")
        val nl = ((size(ws) + lit(9)) / lit(10)).cast("int")
        val text2 = array_join(
          transform(sequence(lit(0), nl - lit(1)),
            i => array_join(slice(ws, i * lit(10) + lit(1), lit(10)), " ")),
          "\n")
        val lined = documents(s, d).select(col("doc_id"), text2.as("text2"))
        Dedup.dedupLines(lined, "doc_id", "text2")
          .select(col("doc_id"), col("n_lines_removed"),
            length(col("text2")).cast("long").as("n_chars2"),
            sha2(col("text2"), 256).as("t_sha"))
      },
      Some("""WITH ws AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
             |d2 AS (
             |  SELECT doc_id,
             |         array_to_string(list_transform(range((len(w) + 9) // 10),
             |           i -> array_to_string(w[i*10+1 : i*10+10], ' ')), chr(10)) AS t
             |  FROM ws),
             |lines AS (
             |  SELECT doc_id, generate_subscripts(string_split(t, chr(10)), 1) AS pos,
             |         unnest(string_split(t, chr(10))) AS line
             |  FROM d2),
             |ranked AS (
             |  SELECT doc_id, pos, line,
             |         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
             |  FROM lines),
             |docs3 AS (
             |  SELECT doc_id, array_to_string(list(line ORDER BY pos), chr(10)) AS t2,
             |         count(*) AS n_keep
             |  FROM ranked WHERE rn = 1 GROUP BY doc_id),
             |base AS (SELECT doc_id, len(string_split(t, chr(10))) AS n_lines FROM d2)
             |SELECT b.doc_id,
             |       CAST(b.n_lines - coalesce(d.n_keep, 0) AS BIGINT) AS n_lines_removed,
             |       CAST(len(coalesce(d.t2, '')) AS BIGINT) AS n_chars2,
             |       sha256(coalesce(d.t2, '')) AS t_sha
             |FROM base b LEFT JOIN docs3 d USING (doc_id)""".stripMargin),
      Seq("A6", "C13")
    ),

    // Deterministic epoch shuffle into training shards: order_key =
    // hash(id:salt), shard = top-bits range — (shard, order_key) IS the
    // global permutation, reproducible across topology. Per-shard count /
    // char mass / key range pins both the assignment and the ordering.
    "ta_epoch_shuffle" -> Q(
      (s, d) =>
        Sampling.shuffleShards(documents(s, d), "doc_id", 8, salt = "ep1",
          hashFn = c => Dedup.md5Lower60(c), hashBits = 60)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
            min(col("order_key")).as("min_key"), max(col("order_key")).as("max_key")),
      Some("""SELECT shard, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |       min(k) AS min_key, max(k) AS max_key
             |FROM (SELECT n_chars, k, CAST(k // 144115188075855872 AS INT) AS shard
             |      FROM (SELECT n_chars,
             |                   CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':ep1') >> 4) AS BIGINT) AS k
             |            FROM documents))
             |GROUP BY shard""".stripMargin),
      Seq("F8", "A1")
    ),

    // Approximate aggregates — the 100 TB default for distincts/quantiles.
    // HLL and quantile-sketch internals differ per engine, so raw sketch
    // values can't hash-match; instead the query emits the error ENVELOPE as
    // booleans which DuckDB verifies exactly as constants. HLL: |approx −
    // exact| within the default 5% rsd (±1 for tiny cardinalities). Quantile:
    // the ε-approximate-quantile rank guarantee — the returned value's rank
    // interval [count(<v), count(≤v)] must straddle 0.5n within ε (robust to
    // ties and discreteness, unlike a value-distance bound; ε = 1/accuracy
    // plus a 1/n discreteness margin).
    "ta_approx_stats" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val sketch = docs.groupBy(col("lang")).agg(
          approx_count_distinct(col("source")).as("ac"),
          countDistinct(col("source")).as("ec"),
          percentile_approx(col("n_chars").cast("double"), lit(0.5), lit(1000)).as("am")
        )
        docs.join(sketch, Seq("lang")).groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          (abs(first(col("ac")) - first(col("ec")))
            <= greatest(lit(1), first(col("ec")) * 0.05)).as("hll_in_bound"),
          ((sum(when(col("n_chars") < col("am"), 1).otherwise(0)) / count(lit(1))
            <= 0.5 + 0.02) &&
            (sum(when(col("n_chars") <= col("am"), 1).otherwise(0)) / count(lit(1))
              >= 0.5 - 0.02)).as("quantile_in_bound")
        )
      },
      Some("""SELECT lang, count(*) AS n, TRUE AS hll_in_bound, TRUE AS quantile_in_bound
             |FROM documents GROUP BY lang""".stripMargin),
      Seq("A2", "A3")
    ),

    // PII scrubbing: deterministic emails/IPs/phones are appended to every
    // document, scrubbed, and the oracle replays the SAME RE2-safe regexes
    // (DuckDB needs the 'g' flag for replace-all parity with Spark).
    "ta_pii_scrub" -> Q(
      (s, d) => {
        val withPii = documents(s, d).withColumn("t",
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
            lit(" or +47 22 "), (col("doc_id") % 100).cast("string"), lit(" 55 666"),
            lit(" at 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 end")))
        withPii.select(col("lang"), scrubPii(col("t")).as("scrubbed"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(length(col("scrubbed"))).as("sum_len"),
            count(when(col("scrubbed").contains("<EMAIL>")
              && col("scrubbed").contains("<IP>")
              && col("scrubbed").contains("<PHONE>"), 1)).as("n_all_redacted"),
            count(when(col("scrubbed").rlike(emailRe)
              || col("scrubbed").rlike(ipv4Re)
              || col("scrubbed").rlike(phoneRe), 1)).as("n_leaking")
          )
      },
      Some(s"""SELECT lang, count(*) AS n,
              |  CAST(sum(length(scrubbed)) AS BIGINT) AS sum_len,
              |  CAST(count(CASE WHEN contains(scrubbed, '<EMAIL>')
              |    AND contains(scrubbed, '<IP>')
              |    AND contains(scrubbed, '<PHONE>') THEN 1 END) AS BIGINT) AS n_all_redacted,
              |  CAST(count(CASE WHEN regexp_matches(scrubbed, '$emailRe')
              |    OR regexp_matches(scrubbed, '$ipv4Re')
              |    OR regexp_matches(scrubbed, '$phoneRe') THEN 1 END) AS BIGINT) AS n_leaking
              |FROM (
              |  SELECT lang, regexp_replace(regexp_replace(regexp_replace(
              |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              |      || ' or +47 22 ' || CAST(doc_id % 100 AS VARCHAR) || ' 55 666'
              |      || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 end',
              |    '$emailRe', '<EMAIL>', 'g'),
              |    '$ipv4Re', '\\1<IP>\\3', 'g'),
              |    '$phoneRe', '<PHONE>', 'g') AS scrubbed
              |  FROM documents)
              |GROUP BY lang""".stripMargin),
      Seq("C3", "C10")
    ),

    // C4 line rules: a 4-line synthetic doc per row (the original text, a
    // short line, a qualifying sentence, an unterminated line); the filter
    // must keep exactly the qualifying lines. Oracle replays the same
    // regex + word-count rule over split lines.
    "ta_c4_lines" -> Q(
      (s, d) => {
        val doc = concat_ws("\n",
          col("text"),
          lit("too short."),
          lit("A good long sentence stays here."),
          lit("this line has no terminal punctuation at all"))
        documents(s, d)
          .select(col("lang"), c4LineFilter(doc, minWords = 3).as("kept"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(length(col("kept"))).as("sum_kept_len"),
            count(when(col("kept").contains("stays here."), 1)).as("n_kept_sentence"),
            count(when(col("kept").contains("no terminal"), 1)).as("n_kept_bad")
          )
      },
      Some("""SELECT lang, count(*) AS n,
             |  CAST(sum(length(kept)) AS BIGINT) AS sum_kept_len,
             |  CAST(count(CASE WHEN contains(kept, 'stays here.') THEN 1 END) AS BIGINT) AS n_kept_sentence,
             |  CAST(count(CASE WHEN contains(kept, 'no terminal') THEN 1 END) AS BIGINT) AS n_kept_bad
             |FROM (
             |  SELECT lang, array_to_string(list_filter(
             |    string_split(concat_ws(chr(10), text, 'too short.',
             |      'A good long sentence stays here.',
             |      'this line has no terminal punctuation at all'), chr(10)),
             |    l -> regexp_matches(l, '[.!?"'']\s*$')
             |         AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
             |         AND length(trim(l)) > 0), chr(10)) AS kept
             |  FROM documents)
             |GROUP BY lang""".stripMargin),
      Seq("C3", "F9")
    ),

    // URL extraction + domain blocklist: per-doc URLs are salted in
    // deterministically; suffix matching is label-suffix explode +
    // equi-join (never an endsWith theta-join). tracker3.net suffix-blocks
    // the ads.tracker3.net citations (doc_id % 5 = 3) and s7.example.com
    // exact-blocks doc_id % 20 = 7.
    // URL canonicalization — the web-corpus dedup key: tracking params,
    // fragments, uppercase scheme/host, and default ports all collapse to
    // one spelling; 210 distinct canonical URLs survive (doc_id mod
    // 7×3×10). The oracle replays the exact regex chain (RE2-safe, 'g'
    // flag where Spark replaces globally).
    "ta_url_canon" -> Q(
      (s, d) => {
        val salted = documents(s, d).withColumn("url",
          concat(lit("HTTP://WWW.Example"), (col("doc_id") % 7).cast("string"),
            lit(".COM:80/Path"), (col("doc_id") % 3).cast("string"),
            lit("/?utm_source=x&utm_medium=y&id="), (col("doc_id") % 10).cast("string"),
            lit("&fbclid=abc#frag")))
        salted.withColumn("canon", canonicalizeUrl(col("url")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("canon")).as("n_canon"),
            sum(length(col("canon"))).as("sum_len"))
      },
      Some("""WITH salted AS (
             |  SELECT lang,
             |         'HTTP://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) ||
             |         '.COM:80/Path' || CAST(doc_id % 3 AS VARCHAR) ||
             |         '/?utm_source=x&utm_medium=y&id=' || CAST(doc_id % 10 AS VARCHAR) ||
             |         '&fbclid=abc#frag' AS url
             |  FROM documents),
             |c1 AS (SELECT lang, regexp_replace(url, '#.*$', '') AS u FROM salted),
             |c2 AS (SELECT lang,
             |         regexp_replace(u, '[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '', 'g') AS u
             |       FROM c1),
             |c3 AS (SELECT lang, regexp_replace(u, '^([^?]*)&', '\1?') AS u FROM c2),
             |c4 AS (SELECT lang, regexp_replace(u, '[?&]$', '') AS u FROM c3),
             |c5 AS (SELECT lang,
             |         lower(regexp_extract(u, '(?i)^(https?://[^/:?#]+)', 1)) ||
             |         regexp_replace(u, '(?i)^https?://[^/:?#]+', '') AS u
             |       FROM c4),
             |c6 AS (SELECT lang,
             |         regexp_replace(u, '^(http://[^/:?#]+):80([/?#].*)?$', '\1\2') AS u
             |       FROM c5),
             |c7 AS (SELECT lang,
             |         regexp_replace(u, '^(https://[^/:?#]+):443([/?#].*)?$', '\1\2') AS u
             |       FROM c6),
             |canon AS (SELECT lang, regexp_replace(u, '/$', '') AS canon FROM c7)
             |SELECT lang, count(*) AS n, count(DISTINCT canon) AS n_canon,
             |       CAST(sum(length(canon)) AS BIGINT) AS sum_len
             |FROM canon GROUP BY lang""".stripMargin),
      Seq("C12", "A6")
    ),

    // Snapshot-over-snapshot corpus diff (the engine-level CDC primitive
    // behind dump-over-dump refreshes): two synthetic corpus versions —
    // old drops doc_id%10==0, new drops doc_id%13==1 and rewrites
    // doc_id%7==0 — classified added/removed/changed/unchanged. Content
    // reduces to sha2 BEFORE the full-outer join, so the exchange carries
    // (id, hash), never text. The oracle classifies on raw text with the
    // same construction; sum_ids pins membership per status.
    "j_corpus_diff" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val oldV = docs.filter(col("doc_id") % 10 =!= 0)
        val newV = docs.filter(col("doc_id") % 13 =!= 1)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, upper(col("text"))).otherwise(col("text")))
        graft.operators.CorpusDiff.diff(oldV, newV, "doc_id", "text")
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
      },
      Some("""WITH old_v AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
             |new_v AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
             |  FROM documents WHERE doc_id % 13 <> 1),
             |d AS (
             |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             |         CASE WHEN o.doc_id IS NULL THEN 'added'
             |              WHEN n.doc_id IS NULL THEN 'removed'
             |              WHEN o.text <> n.text THEN 'changed'
             |              ELSE 'unchanged' END AS status
             |  FROM old_v o FULL OUTER JOIN new_v n ON o.doc_id = n.doc_id)
             |SELECT status, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(doc_id) AS BIGINT) AS sum_ids
             |FROM d GROUP BY status""".stripMargin),
      Seq("S1", "J1")
    ),

    // URL-keyed crawl dedup: canonicalize (fragment/tracking-param/port/case
    // noise stripped), then keep ONE document per canonical URL (min id) —
    // the crawl-frontier primitive that collapses the 7×3×10 salted
    // construction to 210 keepers. sum_keep_ids pins WHICH document
    // survives each URL, not just how many.
    "dd_url_dedup" -> Q(
      (s, d) => {
        val salted = documents(s, d).withColumn("url",
          concat(lit("HTTP://WWW.Example"), (col("doc_id") % 7).cast("string"),
            lit(".COM:80/Path"), (col("doc_id") % 3).cast("string"),
            lit("/?utm_source=x&utm_medium=y&id="), (col("doc_id") % 10).cast("string"),
            lit("&fbclid=abc#frag")))
        salted.withColumn("canon", canonicalizeUrl(col("url")))
          .groupBy(col("canon")).agg(min(col("doc_id")).as("keep_id"))
          .agg(count(lit(1)).as("n_canon"), sum(col("keep_id")).as("sum_keep_ids"))
      },
      Some("""WITH salted AS (
             |  SELECT doc_id,
             |         'HTTP://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) ||
             |         '.COM:80/Path' || CAST(doc_id % 3 AS VARCHAR) ||
             |         '/?utm_source=x&utm_medium=y&id=' || CAST(doc_id % 10 AS VARCHAR) ||
             |         '&fbclid=abc#frag' AS url
             |  FROM documents),
             |c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM salted),
             |c2 AS (SELECT doc_id,
             |         regexp_replace(u, '[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '', 'g') AS u
             |       FROM c1),
             |c3 AS (SELECT doc_id, regexp_replace(u, '^([^?]*)&', '\1?') AS u FROM c2),
             |c4 AS (SELECT doc_id, regexp_replace(u, '[?&]$', '') AS u FROM c3),
             |c5 AS (SELECT doc_id,
             |         lower(regexp_extract(u, '(?i)^(https?://[^/:?#]+)', 1)) ||
             |         regexp_replace(u, '(?i)^https?://[^/:?#]+', '') AS u
             |       FROM c4),
             |c6 AS (SELECT doc_id,
             |         regexp_replace(u, '^(http://[^/:?#]+):80([/?#].*)?$', '\1\2') AS u
             |       FROM c5),
             |c7 AS (SELECT doc_id,
             |         regexp_replace(u, '^(https://[^/:?#]+):443([/?#].*)?$', '\1\2') AS u
             |       FROM c6),
             |canon AS (SELECT doc_id, regexp_replace(u, '/$', '') AS canon FROM c7),
             |kept AS (SELECT canon, min(doc_id) AS keep_id FROM canon GROUP BY canon)
             |SELECT CAST(count(*) AS BIGINT) AS n_canon,
             |       CAST(sum(keep_id) AS BIGINT) AS sum_keep_ids
             |FROM kept""".stripMargin),
      Seq("A6", "C12")
    ),

    "ta_urls" -> Q(
      (s, d) => {
        import s.implicits._
        val salted = documents(s, d).withColumn("text2",
          concat(col("text"),
            lit(" see https://s"), (col("doc_id") % 20).cast("string"),
            lit(".example.com/page?q=1 ref http://ads.tracker"),
            (col("doc_id") % 5).cast("string"), lit(".net/x")))
        val bl = Seq("tracker3.net", "s7.example.com").toDF("domain")
        val blocked = QualityFilters.blockedDomainIds(salted, "doc_id", "text2", bl)
          .withColumn("is_blocked", lit(1L))
        salted
          .withColumn("n_urls", size(extractUrls(col("text2"))).cast("long"))
          .join(blocked, Seq("doc_id"), "left")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_urls")).as("sum_urls"),
            sum(coalesce(col("is_blocked"), lit(0L))).as("n_blocked"))
      },
      Some("""WITH salted AS (
             |  SELECT doc_id, lang,
             |         text || ' see https://s' || CAST(doc_id % 20 AS VARCHAR) ||
             |         '.example.com/page?q=1 ref http://ads.tracker' ||
             |         CAST(doc_id % 5 AS VARCHAR) || '.net/x' AS t
             |  FROM documents),
             |urls AS (
             |  SELECT doc_id, lang, regexp_extract_all(t, 'https?://[^\s]+') AS us FROM salted),
             |doms AS (
             |  SELECT doc_id, lower(regexp_extract(unnest(us), '^https?://([^/:?#]+)', 1)) AS dom
             |  FROM urls),
             |keys AS (
             |  SELECT doc_id,
             |         unnest(list_transform(
             |           range(1, greatest(len(string_split(dom, '.')) - 1, 1) + 1),
             |           i -> array_to_string(list_slice(string_split(dom, '.'), i,
             |                  len(string_split(dom, '.'))), '.'))) AS k
             |  FROM doms WHERE dom <> ''),
             |blocked AS (
             |  SELECT DISTINCT doc_id FROM keys WHERE k IN ('tracker3.net', 's7.example.com'))
             |SELECT lang, count(*) AS n, CAST(sum(len(us)) AS BIGINT) AS sum_urls,
             |       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM blocked) THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
             |FROM urls GROUP BY lang""".stripMargin),
      Seq("C6", "F8")
    ),

    // Domain-authority PageRank over the doc→domain citation graph (the
    // same salted URL corpus as ta_urls, so every doc cites 2 of 25
    // domains plus whatever the raw text carries). The power iteration is
    // pure integer micro-unit arithmetic — division before summation,
    // damping as the exact rational 85/100 — so integer-sum associativity
    // makes the result partition-invariant and the oracle replays both
    // iterations verbatim. The CommonCrawl-style crawl-prioritization
    // weight, as one equi-join + one keyed agg per iteration.
    "g_pagerank" -> Q(
      (s, d) => {
        val salted = documents(s, d).withColumn("text2",
          concat(col("text"),
            lit(" see https://s"), (col("doc_id") % 20).cast("string"),
            lit(".example.com/page?q=1 ref http://ads.tracker"),
            (col("doc_id") % 5).cast("string"), lit(".net/x")))
        val edges = salted
          .select(concat(lit("d"), col("doc_id")).as("src"),
            explode(extractUrls(col("text2"))).as("u"))
          .select(col("src"), urlDomain(col("u")).as("dst"))
          .filter(length(col("dst")) > 0)
          .distinct()
        Graph.pageRank(edges, "src", "dst", iters = 2)
          .orderBy(col("rank").desc, col("node"))
          .limit(15)
      },
      Some("""WITH salted AS (
             |  SELECT doc_id,
             |         text || ' see https://s' || CAST(doc_id % 20 AS VARCHAR) ||
             |         '.example.com/page?q=1 ref http://ads.tracker' ||
             |         CAST(doc_id % 5 AS VARCHAR) || '.net/x' AS t
             |  FROM documents),
             |edges AS (
             |  SELECT DISTINCT 'd' || CAST(doc_id AS VARCHAR) AS src,
             |         lower(regexp_extract(u, '^https?://([^/:?#]+)', 1)) AS dst
             |  FROM (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\s]+')) AS u
             |        FROM salted)
             |  WHERE length(lower(regexp_extract(u, '^https?://([^/:?#]+)', 1))) > 0),
             |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
             |params AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |                  1000000 // CAST(count(*) AS BIGINT) AS r0,
             |                  ((100 - 85) * (1000000 // CAST(count(*) AS BIGINT))) // 100 AS base
             |           FROM nodes),
             |outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
             |rank0 AS (SELECT node, (SELECT r0 FROM params) AS rank FROM nodes),
             |contrib1 AS (
             |  SELECT e.dst AS node, sum(r.rank // o.deg) AS s
             |  FROM edges e JOIN rank0 r ON r.node = e.src JOIN outdeg o ON o.src = e.src
             |  GROUP BY e.dst),
             |rank1 AS (
             |  SELECT n.node,
             |         (SELECT base FROM params) + (85 * coalesce(c.s, 0)) // 100 AS rank
             |  FROM nodes n LEFT JOIN contrib1 c ON c.node = n.node),
             |contrib2 AS (
             |  SELECT e.dst AS node, sum(r.rank // o.deg) AS s
             |  FROM edges e JOIN rank1 r ON r.node = e.src JOIN outdeg o ON o.src = e.src
             |  GROUP BY e.dst),
             |rank2 AS (
             |  SELECT n.node,
             |         (SELECT base FROM params) + (85 * coalesce(c.s, 0)) // 100 AS rank
             |  FROM nodes n LEFT JOIN contrib2 c ON c.node = n.node)
             |SELECT node, CAST(rank AS BIGINT) AS rank FROM rank2
             |ORDER BY rank DESC, node LIMIT 15""".stripMargin),
      Seq("A1", "J1", "L2")
    ),

    // The full Gopher document-level rule set (word count, mean word
    // length, symbol ratio, bullet/ellipsis lines, alphabetic words,
    // stopword types -> gopher_keep). The corpus has no newlines, so every
    // third doc is salted with bullet/ellipsis lines to exercise rules 4-5.
    // Ratio sums use the exact-integer trick (per-doc round(x*1e6) then
    // BIGINT sums) so group aggregation order cannot introduce float noise.
    "ta_gopher" -> Q(
      (s, d) => {
        val salted = documents(s, d).withColumn("text2",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit("\n\u2022 item one\n- item two\ntrailing...")))
            .otherwise(col("text")))
        QualityFilters.gopherSignals(salted, "doc_id", "text2",
          stopwords = gopherBatteryStopwords, carry = Seq("lang"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("gopher_keep"), 1L).otherwise(0L)).as("n_keep"),
            sum(col("n_words")).as("sum_words"),
            sum(round(col("mean_word_len") * 1e6).cast("long")).as("s_mwl"),
            sum(round(col("symbol_ratio") * 1e6).cast("long")).as("s_sym"),
            sum(round(col("bullet_line_frac") * 1e6).cast("long")).as("s_bullet"),
            sum(round(col("ellipsis_line_frac") * 1e6).cast("long")).as("s_ellipsis"),
            sum(round(col("alpha_word_frac") * 1e6).cast("long")).as("s_alpha"),
            sum(col("stopword_types")).as("s_stop"))
      },
      Some(gopherOracleSql),
      Seq("C1", "F9")
    ),

    // Gopher/MassiveText repetition rules: dup-word fraction and the char
    // fraction of the most frequent 2-gram, thresholded per the published
    // cut-offs. Per-doc doubles are bit-equal across engines (same integer
    // ratios), so the threshold counts are exact.
    "ta_repetition" -> Q(
      (s, d) =>
        QualityFilters.repetitionSignals(documents(s, d), "doc_id", "text", n = 2,
          carry = Seq("lang"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(round(col("dup_word_frac") * 1e6, 0)).cast("long").as("sum_dup_word_micro"),
            count(when(col("dup_word_frac") > 0.5, 1)).as("n_dupword_hi"),
            count(when(col("top_ngram_char_frac") > 0.2, 1)).as("n_topgram_hi")
          ),
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, length(text) AS chars,
             |         regexp_split_to_array(trim(text), '\s+') AS ts
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(
             |    CASE WHEN len(ts) - 1 <= 0 THEN CAST([] AS VARCHAR[])
             |    ELSE list_transform(range(1, greatest(len(ts) - 1, 1) + 1),
             |      i -> array_to_string(list_slice(ts, i, i + 1), ' ')) END) AS gram
             |  FROM toks),
             |counted AS (
             |  SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
             |top AS (
             |  SELECT doc_id, gram, cnt FROM (
             |    SELECT doc_id, gram, cnt,
             |           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
             |    FROM counted) WHERE rn = 1),
             |sig AS (
             |  SELECT t.doc_id, t.lang,
             |         round(1.0 - CAST(len(list_distinct(t.ts)) AS DOUBLE)
             |           / greatest(len(t.ts), 1), 6) AS dup_word_frac,
             |         round(COALESCE(CAST(tp.cnt AS DOUBLE) * length(tp.gram)
             |           / greatest(t.chars, 1), 0.0), 6) AS top_ngram_char_frac
             |  FROM toks t LEFT JOIN top tp USING (doc_id))
             |SELECT lang, count(*) AS n,
             |  CAST(sum(round(dup_word_frac * 1000000)) AS BIGINT) AS sum_dup_word_micro,
             |  CAST(count(CASE WHEN dup_word_frac > 0.5 THEN 1 END) AS BIGINT) AS n_dupword_hi,
             |  CAST(count(CASE WHEN top_ngram_char_frac > 0.2 THEN 1 END) AS BIGINT) AS n_topgram_hi
             |FROM sig GROUP BY lang""".stripMargin),
      Seq("A1", "A6")
    ),

    // Sequence packing: concat-and-split training bins (4096-char budget,
    // FIFO by doc_id within each source stream), summarized per source.
    "ta_packing" -> Q(
      (s, d) =>
        Sampling.packSequences(documents(s, d), "doc_id", "n_chars", "source", 4096)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("bin")).as("n_bins"),
            max(col("bin")).as("max_bin")
          ),
      Some("""SELECT source, count(*) AS n, count(DISTINCT bin) AS n_bins, max(bin) AS max_bin
             |FROM (
             |  SELECT source, CAST(floor(COALESCE(sum(n_chars) OVER (
             |    PARTITION BY source ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096.0) AS BIGINT) AS bin
             |  FROM documents)
             |GROUP BY source""".stripMargin),
      Seq("A1", "W2")
    ),

    // Corpus vocabulary: top-20 words by frequency (explode → count → top-k).
    "ta_vocab_top20" -> Q(
      (s, d) =>
        documents(s, d)
          .select(explode(split(trim(col("text")), " ")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(20),
      Some("""SELECT word, count(*) AS n FROM
             |(SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
             |WHERE length(word) > 0
             |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin),
      Seq("A2", "C10")
    ),

    // Mergeable frequent-items sketches: approx_top_k built PER SHARD
    // (accumulate), combined, and estimated — the distributed-top-k
    // discipline when the vocabulary is too large for an exact groupBy to
    // be worth a full shuffle at report time: fixed-size sketches travel,
    // not term counts. The envelope oracle (ta_approx_stats convention):
    // the estimated items carry their EXACT corpus counts (capacity ≥
    // vocabulary here, so the sketch is in its exact regime), the true
    // most-frequent word is present, and exactly k rows come back. Item
    // ORDER among count ties is sketch-internal, which is why the pin is
    // set+count equality, not positional.
    "ta_approx_topk_shards" -> Q(
      (s, d) => {
        val words = documents(s, d)
          .select(pmod(col("doc_id"), lit(8)).as("shard"),
            explode(split(trim(col("text")), " ")).as("word"))
          .filter(length(col("word")) > 0)
        val exact = words.groupBy(col("word")).agg(count(lit(1)).as("n_exact"))
        val top1 = exact.orderBy(col("n_exact").desc, col("word")).limit(1)
          .select(col("word").as("w1"))
        val sketches = words.groupBy(col("shard"))
          .agg(expr("approx_top_k_accumulate(word, 100000)").as("sk"))
        val est = sketches
          .agg(expr("approx_top_k_estimate(approx_top_k_combine(sk), 10)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("word"), col("e.count").as("n_est"))
        est.join(exact, Seq("word"), "left").crossJoin(top1).agg(
          count(lit(1)).as("n_returned"),
          (sum(when(col("n_est") === col("n_exact"), 1).otherwise(0))
            === count(lit(1))).as("counts_exact"),
          (sum(when(col("word") === col("w1"), 1).otherwise(0)) === 1).as("top1_present"))
      },
      Some("""SELECT CAST(10 AS BIGINT) AS n_returned,
             |       TRUE AS counts_exact, TRUE AS top1_present""".stripMargin),
      Seq("A2", "L2")
    ),

    // Bigram frequencies: adjacent-word pairs via sequence+transform.
    "ta_bigrams_top10" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("toks", split(trim(col("text")), " "))
          .filter(size(col("toks")) >= 2)
          .select(explode(
            transform(
              sequence(lit(1), size(col("toks")) - 1),
              i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))
            )
          ).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(10),
      Some("""WITH flat AS (
             |  SELECT doc_id,
             |         generate_subscripts(string_split(trim(text), ' '), 1) AS i,
             |         unnest(string_split(trim(text), ' ')) AS w
             |  FROM documents)
             |SELECT a.w || ' ' || b.w AS bigram, count(*) AS n
             |FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 10""".stripMargin),
      Seq("A2", "C10")
    ),

    // Data-quality profile: single-pass per-column stats (training-data
    // ingestion sweep).
    "ta_profile" -> Q(
      (s, d) =>
        graft.operators.Profiler.profile(documents(s, d), Seq("doc_id", "lang", "source", "n_chars")),
      Some(Seq("doc_id", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n,
           |count(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
           |count(DISTINCT $c) AS n_distinct,
           |CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n")),
      Seq("A2", "A3")
    ),

    // Language-ID heuristic distribution (stopword-hit + trigram argmax).
    // Oracle-matched: both scores are exact integer ratios divided once in
    // double, and DuckDB's list_max on structs has the same lexicographic
    // (score, lang) tie-break as Spark's array_max; the SQL is generated
    // from the same stopword/trigram tables the Spark expressions use.
    "ta_langid" -> Q(
      (s, d) =>
        documents(s, d)
          .withColumn("pred_stopword", langId(col("text")))
          .withColumn("pred_ngram", langIdNgram(col("text")))
          .groupBy(col("pred_stopword"), col("pred_ngram")).agg(count(lit(1)).as("n")),
      Some(langIdOracleSql),
      Seq("C1")
    ),

    // Cross-document boilerplate stripping (CCNet line rule): every doc is
    // salted with two site-chrome lines (hit all docs → stripped) plus a
    // per-doc unique line (survives); originals rejoin byte-identically.
    // Exact string/count algebra end to end — the oracle replays the
    // distinct-doc line counts and the order-preserving reassembly.
    "ta_boilerplate_strip" -> Q(
      (s, d) => {
        val salted = documents(s, d).withColumn("text2",
          concat(col("text"),
            lit("\nCopyright Lovdata AS\nAll rights reserved"),
            lit("\nref note "), col("doc_id").cast("string")))
        QualityFilters.stripBoilerplateLines(
            salted.select(col("doc_id"), col("lang"), col("text2")),
            "doc_id", "text2", maxDocs = 100)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(length(col("text2"))).as("sum_chars"),
            sum(size(split(col("text2"), "\n"))).as("sum_lines"))
      },
      Some("""WITH salted AS (
             |  SELECT doc_id, lang,
             |         text || chr(10) || 'Copyright Lovdata AS' ||
             |         chr(10) || 'All rights reserved' ||
             |         chr(10) || 'ref note ' || CAST(doc_id AS VARCHAR) AS t
             |  FROM documents),
             |lines AS (
             |  SELECT doc_id, lang,
             |         generate_subscripts(string_split(t, chr(10)), 1) AS pos,
             |         unnest(string_split(t, chr(10))) AS line
             |  FROM salted),
             |boiler AS (
             |  SELECT trim(line) AS k FROM lines WHERE len(trim(line)) > 0
             |  GROUP BY trim(line) HAVING count(DISTINCT doc_id) > 100),
             |kept AS (
             |  SELECT doc_id, lang, pos, line FROM lines
             |  WHERE trim(line) NOT IN (SELECT k FROM boiler)),
             |docs2 AS (
             |  SELECT doc_id, lang,
             |         array_to_string(list(line ORDER BY pos), chr(10)) AS t2,
             |         count(*) AS n_lines
             |  FROM kept GROUP BY doc_id, lang)
             |SELECT lang, count(*) AS n,
             |       CAST(sum(len(t2)) AS BIGINT) AS sum_chars,
             |       CAST(sum(n_lines) AS BIGINT) AS sum_lines
             |FROM docs2 GROUP BY lang""".stripMargin),
      Seq("A6", "C3", "F9")
    ),

    // Token-budget corpus cut: 20k tokens per source along the salted-hash
    // order — the mixture-construction primitive ("N tokens of source X").
    // The engine runs the scalable bucket-decomposed form (row window only
    // inside the one boundary bucket); the oracle replays the naive global
    // running-sum window it must equal row-for-row, through the shared
    // md5Lower60 ordering hash.
    "ta_token_budget_take" -> Q(
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("toks", tokenCount(col("text")))
        Sampling.takeTokenBudget(docs, "doc_id", "toks", "source",
            budgetTokens = 20000L, salt = "mix1",
            hashFn = c => Dedup.md5Lower60(c))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("toks")).as("sum_toks"),
            sum(col("doc_id")).as("sum_ids"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source,
             |         len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS toks,
             |         CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':mix1') >> 4) AS BIGINT) AS h
             |  FROM documents),
             |run AS (
             |  SELECT doc_id, source, toks,
             |         sum(toks) OVER (PARTITION BY source ORDER BY h, doc_id
             |                         ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM docs)
             |SELECT source, count(*) AS n_docs,
             |       CAST(sum(toks) AS BIGINT) AS sum_toks,
             |       CAST(sum(doc_id) AS BIGINT) AS sum_ids
             |FROM run WHERE cum <= 20000 GROUP BY source""".stripMargin),
      Seq("L1", "A4", "F8")
    ),

    // Per-source budget MAP — the real mixture primitive ("N_s tokens of
    // source s" with differing N_s): src0..src17 get 500·(s mod 7 + 1)
    // tokens, src18/src19 are absent from the map and drop under the
    // default budget of 0. Same bucket-decomposed engine path as
    // ta_token_budget_take; the oracle replays the naive per-source window
    // with a CASE budget.
    "ta_token_budget_map" -> Q(
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("toks", tokenCount(col("text")))
        val budgets = (0 to 17).map(i => s"src$i" -> (500L * (i % 7 + 1))).toMap
        Sampling.takeTokenBudgets(docs, "doc_id", "toks", "source",
            budgets, defaultBudget = 0L, salt = "mixmap",
            hashFn = c => Dedup.md5Lower60(c))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("toks")).as("sum_toks"),
            sum(col("doc_id")).as("sum_ids"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source,
             |         len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS toks,
             |         CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':mixmap') >> 4) AS BIGINT) AS h,
             |         CASE WHEN CAST(substr(source, 4, 10) AS INT) <= 17
             |              THEN 500 * (CAST(substr(source, 4, 10) AS INT) % 7 + 1)
             |              ELSE 0 END AS budget
             |  FROM documents),
             |run AS (
             |  SELECT doc_id, source, toks, budget,
             |         sum(toks) OVER (PARTITION BY source ORDER BY h, doc_id
             |                         ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM docs)
             |SELECT source, count(*) AS n_docs,
             |       CAST(sum(toks) AS BIGINT) AS sum_toks,
             |       CAST(sum(doc_id) AS BIGINT) AS sum_ids
             |FROM run WHERE cum <= budget GROUP BY source""".stripMargin),
      Seq("L1", "A4", "F8")
    ),

    // One-call mixture construction: weights + a total budget ("half src0,
    // a quarter src1, an eighth each src2/src3 into 6000 tokens") derive
    // per-source budgets min(available, round(w·total)) and cut along the
    // salted-hash order. src0's share (3000) exceeds its supply, so the
    // cap keeps the whole source — the under-fill-don't-redistribute
    // contract. Weights are exact binary fractions (0.5/0.25/0.125) so
    // normalization and round() replay bit-identically in the oracle.
    "ta_mixture_take" -> Q(
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("toks", tokenCount(col("text")))
        Sampling.takeMixture(docs, "doc_id", "toks", "source",
            Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125),
            totalTokens = 6000L, salt = "mix2",
            hashFn = c => Dedup.md5Lower60(c))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("toks")).as("sum_toks"),
            sum(col("doc_id")).as("sum_ids"))
      },
      Some("""WITH w(source, wt) AS (
             |  VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 0.125), ('src3', 0.125)),
             |docs AS (
             |  SELECT doc_id, source,
             |         len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS toks,
             |         CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':mix2') >> 4) AS BIGINT) AS h
             |  FROM documents),
             |avail AS (
             |  SELECT source, CAST(sum(toks) AS BIGINT) AS at
             |  FROM docs GROUP BY source),
             |budgets AS (
             |  SELECT w.source, least(a.at, CAST(round(w.wt * 6000) AS BIGINT)) AS budget
             |  FROM w JOIN avail a USING (source)),
             |run AS (
             |  SELECT d.doc_id, d.source, d.toks, b.budget,
             |         sum(d.toks) OVER (PARTITION BY d.source ORDER BY d.h, d.doc_id
             |                           ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM docs d JOIN budgets b USING (source))
             |SELECT source, count(*) AS n_docs,
             |       CAST(sum(toks) AS BIGINT) AS sum_toks,
             |       CAST(sum(doc_id) AS BIGINT) AS sum_ids
             |FROM run WHERE cum <= budget GROUP BY source""".stripMargin),
      Seq("L1", "A4", "F8")
    ),

    // Trained text classifier (multinomial NB, add-one smoothing): the
    // relational stand-in for the fasttext quality/language models the
    // published pipelines gate on. Train on even doc_ids (label = lang),
    // predict the odd half, output the confusion matrix. The oracle
    // replays training counts, smoothed log-posteriors, and the
    // struct-max argmax; scores round to 6dp before the argmax on both
    // sides so summation order cannot flip a prediction.
    "ta_nb_langid" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val model = NaiveBayes.train(
          docs.filter(col("doc_id") % 2 === 0), "text", "lang")
        val test = docs.filter(col("doc_id") % 2 === 1)
        NaiveBayes.predict(model, test, "text", "doc_id")
          .join(test.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"), col("label").as("pred"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH train AS (
             |  SELECT lang AS label, doc_id,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS tk
             |  FROM documents WHERE doc_id % 2 = 0),
             |tc AS (
             |  SELECT label, term, CAST(count(*) AS BIGINT) AS cnt
             |  FROM (SELECT label, unnest(tk) AS term FROM train) GROUP BY label, term),
             |totals AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS total FROM tc GROUP BY label),
             |priors AS (SELECT label, CAST(count(*) AS BIGINT) AS nd FROM train GROUP BY label),
             |vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tc),
             |ndocs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
             |test AS (
             |  SELECT doc_id, lang,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS tk
             |  FROM documents WHERE doc_id % 2 = 1),
             |dtf AS (
             |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM (SELECT doc_id, unnest(tk) AS term FROM test) GROUP BY doc_id, term),
             |classes AS (SELECT p.label, p.nd, t.total FROM priors p JOIN totals t USING (label)),
             |perterm AS (
             |  SELECT d.doc_id, c.label, c.nd,
             |         d.tf * ln((coalesce(tc.cnt, 0) + 1.0) /
             |                   (c.total + (SELECT v FROM vocab))) AS w
             |  FROM dtf d CROSS JOIN classes c
             |  LEFT JOIN tc ON tc.label = c.label AND tc.term = d.term),
             |scores AS (
             |  SELECT doc_id, label,
             |         ln(CAST(nd AS DOUBLE) / (SELECT n FROM ndocs)) + sum(w) AS s
             |  FROM perterm GROUP BY doc_id, label, nd),
             |pred AS (
             |  SELECT doc_id, (max({'s': round(s, 6), 'l': label})).l AS pred
             |  FROM scores GROUP BY doc_id)
             |SELECT t.lang, p.pred, count(*) AS n
             |FROM pred p JOIN test t USING (doc_id)
             |GROUP BY t.lang, p.pred""".stripMargin),
      Seq("A1", "C1", "J1")
    ),

    // DSIR importance scores (Xie et al., "Data Selection via Importance
    // Resampling", arXiv:2302.03169): hashed-bigram bucket distributions of
    // a 5% target slice vs the raw rest, add-one smoothed per-bucket
    // log-ratios, per-document importance log-weight. The model is two
    // 1024-row bucket tables (broadcastable by construction — DSIR's
    // published config is 10^4 buckets); the oracle replays hashing,
    // smoothing, and the weighted sum through the shared md5 hash.
    "ta_dsir_scores" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val target = docs.filter(col("doc_id") % 20 === 0)
        val raw = docs.filter(col("doc_id") % 20 =!= 0)
        val tc = ImportanceSampling.bucketCounts(target, "text", buckets = 1024,
          n = 2, gramHash = Dedup.Md5Gram)
        val rc = ImportanceSampling.bucketCounts(raw, "text", buckets = 1024,
          n = 2, gramHash = Dedup.Md5Gram)
        ImportanceSampling.logWeights(raw, "doc_id", "text", tc, rc,
          buckets = 1024, n = 2, gramHash = Dedup.Md5Gram)
          .select(col("doc_id"), round(col("logw"), 6).as("logw"))
      },
      Some(s"""WITH ${dsirCtes(buckets = 1024)}
              |SELECT doc_id, round(logw, 6) AS logw FROM weights""".stripMargin),
      Seq("A1", "C1", "A2")
    ),

    // DSIR Gumbel top-k resampling: the 200 raw documents with the largest
    // logw + gumbel(id) — a without-replacement sample proportional to
    // exp(logw), deterministic because the Gumbel noise derives from the
    // shared md5 id hash, not an RNG stream.
    "ta_dsir_resample" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val target = docs.filter(col("doc_id") % 20 === 0)
        val raw = docs.filter(col("doc_id") % 20 =!= 0)
        val tc = ImportanceSampling.bucketCounts(target, "text", buckets = 1024,
          n = 2, gramHash = Dedup.Md5Gram)
        val rc = ImportanceSampling.bucketCounts(raw, "text", buckets = 1024,
          n = 2, gramHash = Dedup.Md5Gram)
        ImportanceSampling.resample(raw, "doc_id", "text", tc, rc, nKeep = 200,
          buckets = 1024, n = 2, gramHash = Dedup.Md5Gram,
          idHashFn = Dedup.md5Lower60)
          .select(col("doc_id"), round(col("logw"), 6).as("logw"),
            round(col("key"), 6).as("key"))
      },
      Some(s"""WITH ${dsirCtes(buckets = 1024)},
              |sel AS (
              |  SELECT doc_id, logw,
              |         logw + (-ln(-ln(
              |           (CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || 'dsir') >> 4) AS BIGINT)
              |              % 1048576 + 0.5) / 1048576.0))) AS key
              |  FROM weights)
              |SELECT doc_id, round(logw, 6) AS logw, round(key, 6) AS key
              |FROM sel ORDER BY key DESC, doc_id LIMIT 200""".stripMargin),
      Seq("A1", "C1", "L1")
    ),

    // Weighted sampling without replacement (Gumbel top-k, corpus-generic):
    // 100 documents selected with probability ∝ n_chars — the deterministic
    // weighted-sample primitive DSIR's resample specializes with learned
    // weights. Plans as TakeOrdered; the oracle replays ln(weight) + the
    // hash-derived Gumbel key.
    "ta_weighted_take" -> Q(
      (s, d) =>
        Sampling.takeWeighted(
          documents(s, d).select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", n = 100, idHashFn = Dedup.md5Lower60)
          .select(col("doc_id"), col("n_chars")),
      Some("""WITH sel AS (
             |  SELECT doc_id, n_chars,
             |         ln(CAST(n_chars AS DOUBLE)) +
             |         (-ln(-ln((CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || 'wtake') >> 4) AS BIGINT)
             |            % 1048576 + 0.5) / 1048576.0))) AS key
             |  FROM documents WHERE n_chars > 0)
             |SELECT doc_id, n_chars FROM sel ORDER BY key DESC, doc_id LIMIT 100""".stripMargin),
      Seq("A2", "L1")
    ),

    // Deterministic hash-bucket train/val/test split: membership from the id
    // hash alone (reproducible across runs/engines/topology), oracle-checked
    // with the shared md5-derived hash.
    "ta_split_counts" -> Q(
      (s, d) =>
        Sampling.assignSplits(documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          hashFn = c => Dedup.md5Lower60(c.cast("string")))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars")),
      Some(s"""SELECT split, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM (
              |  SELECT n_chars,
              |         CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
              |  FROM (SELECT n_chars,
              |               (CAST((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 4) AS BIGINT) % 10000) AS b
              |        FROM documents))
              |GROUP BY split""".stripMargin),
      Seq("F8", "A1")
    ),

    // Deterministic per-source rebalancing toward target mixture ratios.
    "ta_rebalance" -> Q(
      (s, d) =>
        Sampling.rebalance(documents(s, d), "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 0.25),
          hashFn = c => Dedup.md5Lower60(c.cast("string")))
          .groupBy(col("source")).agg(count(lit(1)).as("n")),
      Some("""SELECT source, count(*) AS n FROM (
             |  SELECT source,
             |         (CAST((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 4) AS BIGINT) % 10000) AS b
             |  FROM documents)
             |WHERE b < (CASE source WHEN 'src0' THEN 5000 WHEN 'src1' THEN 2500 ELSE 10000 END)
             |GROUP BY source""".stripMargin),
      Seq("F8", "A1")
    ),

    // Temperature-based mixture resampling (alpha = 0.5): per-source keep
    // fractions derived from corpus counts so the kept mixture follows
    // share^alpha. alpha=0.5 makes the power an IEEE-exact sqrt and the
    // fraction formula avoids any cross-source float sum, so DuckDB replays
    // the fractions bit-for-bit; membership is the shared md5-derived hash.
    "ta_temperature_mix" -> Q(
      (s, d) =>
        Sampling.temperatureMix(documents(s, d), "doc_id", "source", alpha = 0.5,
          hashFn = c => Dedup.md5Lower60(c.cast("string")))
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept")),
      Some("""WITH counts AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY source),
             |w AS (
             |  SELECT source, ns,
             |         sqrt(CAST(ns AS DOUBLE) / (SELECT CAST(sum(ns) AS DOUBLE) FROM counts)) AS ws
             |  FROM counts),
             |f AS (
             |  SELECT source,
             |         CAST(round((SELECT min(CAST(ns AS DOUBLE) / ws) FROM w) * ws / CAST(ns AS DOUBLE) * 10000) AS BIGINT) AS thr
             |  FROM w),
             |b AS (
             |  SELECT source,
             |         (CAST((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 4) AS BIGINT) % 10000) AS b
             |  FROM documents)
             |SELECT b.source, count(*) AS n_kept
             |FROM b JOIN f USING (source) WHERE b.b < f.thr GROUP BY b.source""".stripMargin),
      Seq("F8", "A1")
    ),

    // Per-group top-k via the native top_k aggregate (bounded k-buffer with
    // map-side partial aggregation — ships k rows per group per partition to
    // the exchange instead of sorting every row like the window form).
    "ta_topk_per_source" -> Q(
      (s, d) =>
        documents(s, d).groupBy(col("source"))
          .agg(expr("top_k(struct(n_chars, doc_id), 3)").as("top"))
          .select(col("source"), explode(col("top")).as("t"))
          .select(col("source"), col("t.n_chars").as("n_chars"), col("t.doc_id").as("doc_id")),
      Some("""SELECT source, n_chars, doc_id FROM (
             |  SELECT source, n_chars, doc_id,
             |         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id DESC) AS rn
             |  FROM documents) WHERE rn <= 3""".stripMargin),
      Seq("L2", "A1")
    ),

    // Winnowing rolling-hash fingerprints: shared-hash near-dup candidates
    // (langIdOracleSql helper lives at the bottom of this object)
    // would join on exploded fingerprint hashes. Oracle-matched via the
    // 60-bit md5-derived k-gram hash (DuckDB `md5_number_lower >> 4`).
    "dd_winnowing" -> Q(
      (s, d) =>
        Dedup.withWinnowingFingerprint(documents(s, d), "doc_id", "text", "fp", 3, 4, Dedup.md5Lower60)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(size(col("fp"))).as("sum_fp_hashes")),
      Some("""WITH docs AS (
             |  SELECT lang, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
             |grams AS (
             |  SELECT lang, len(toks) - 2 AS ngrams,
             |    list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
             |      i -> CAST((md5_number_lower(array_to_string(list_slice(toks, i, i + 2), ' ')) >> 4) AS BIGINT)) AS hashes
             |  FROM docs),
             |fps AS (
             |  SELECT lang,
             |    CASE WHEN ngrams <= 0 THEN CAST([] AS BIGINT[])
             |         ELSE list_distinct(list_transform(range(1, greatest(len(hashes) - 3, 1) + 1),
             |                j -> list_min(list_slice(hashes, j, j + 3))))
             |    END AS fp
             |  FROM grams)
             |SELECT lang, count(*) AS n, CAST(sum(len(fp)) AS BIGINT) AS sum_fp_hashes
             |FROM fps GROUP BY lang""".stripMargin),
      Seq("C13")
    ),

    // Benchmark decontamination: corpus docs sharing any 5-gram with the
    // benchmark subset (doc_id % 37 = 0 plays the eval set). Oracle replays
    // the full hash-join pipeline via md5Lower60 n-gram hashes, and
    // n_clean is computed by the independent decontaminate() anti-join so
    // the apply side is verified too.
    "dd_contamination" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val bench = docs.filter(col("doc_id") % 37 === 0).select(col("text"))
        val contaminated = Dedup.contaminatedIds(
          docs, "doc_id", "text", bench, "text", n = 5, hashFn = Dedup.Md5Gram)
        val clean = Dedup.decontaminate(
          docs, "doc_id", "text", bench, "text", n = 5, hashFn = Dedup.Md5Gram)
        docs.agg(count(lit(1)).as("n_total"))
          .crossJoin(contaminated.agg(count(lit(1)).as("n_contaminated")))
          .crossJoin(clean.agg(count(lit(1)).as("n_clean")))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    CASE WHEN len(toks) - 4 <= 0 THEN CAST([] AS BIGINT[])
             |    ELSE list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
             |      i -> CAST((md5_number_lower(array_to_string(list_slice(toks, i, i + 4), ' ')) >> 4) AS BIGINT))
             |    END)) AS h
             |  FROM corpus),
             |bench AS (SELECT DISTINCT h FROM grams WHERE doc_id % 37 = 0),
             |contaminated AS (
             |  SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (h))
             |SELECT (SELECT count(*) FROM documents) AS n_total,
             |       (SELECT count(*) FROM contaminated) AS n_contaminated,
             |       (SELECT count(*) FROM documents) -
             |         (SELECT count(*) FROM contaminated) AS n_clean""".stripMargin),
      Seq("A6", "C13")
    ),

    // Per-eval-item contamination report — the flip side of
    // dd_contamination: rank WHICH benchmark items leaked and how badly
    // (leak_frac 1.0 = fully reconstructible from corpus text — the "drop
    // the eval item" signal). Same 37-split and n=5 as dd_contamination,
    // but corpus EXCLUDES the bench docs so the fractions are non-trivial.
    "dd_contamination_report" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        Dedup.contaminationReport(
          docs.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 37 === 0)
            .select(col("doc_id").as("bench_id"), col("text")),
          "bench_id", "text", n = 5, hashFn = Dedup.Md5Gram)
          .select(col("bench_id"), col("n_grams"), col("n_leaked"),
            col("n_corpus_docs"), round(col("leak_frac"), 6).as("leak_frac"))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    CASE WHEN len(toks) - 4 <= 0 THEN CAST([] AS BIGINT[])
             |    ELSE list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
             |      i -> CAST((md5_number_lower(array_to_string(list_slice(toks, i, i + 4), ' ')) >> 4) AS BIGINT))
             |    END)) AS h
             |  FROM corpus),
             |benchg AS (SELECT doc_id AS bench_id, h FROM grams WHERE doc_id % 37 = 0),
             |corpg AS (SELECT doc_id, h FROM grams WHERE doc_id % 37 <> 0),
             |totals AS (SELECT bench_id, count(*) AS n_grams FROM benchg GROUP BY bench_id),
             |leaked AS (
             |  SELECT bench_id, count(*) AS n_leaked FROM benchg
             |  WHERE h IN (SELECT DISTINCT h FROM corpg) GROUP BY bench_id),
             |hits AS (
             |  SELECT bench_id, count(*) AS n_corpus_docs FROM (
             |    SELECT DISTINCT b.bench_id, c.doc_id FROM benchg b JOIN corpg c USING (h))
             |  GROUP BY bench_id)
             |SELECT t.bench_id, t.n_grams,
             |       CAST(COALESCE(l.n_leaked, 0) AS BIGINT) AS n_leaked,
             |       CAST(COALESCE(ht.n_corpus_docs, 0) AS BIGINT) AS n_corpus_docs,
             |       round(CAST(COALESCE(l.n_leaked, 0) AS DOUBLE) / t.n_grams, 6) AS leak_frac
             |FROM totals t
             |LEFT JOIN leaked l USING (bench_id)
             |LEFT JOIN hits ht USING (bench_id)""".stripMargin),
      Seq("A6", "C13", "A2")
    ),

    // Blocked n-gram-Jaccard near-dup: candidates share (source, n_chars).
    "dd_jaccard_blocked" -> Q(
      (s, d) =>
        Dedup.jaccardPairs(documents(s, d), "doc_id", "text", Seq("source", "n_chars"), 0.3)
          .agg(
            count(lit(1)).as("n_pairs"),
            round(sum(col("jaccard")), 4).as("sum_jaccard")
          ),
      Some("""WITH docs AS (SELECT doc_id, source, n_chars,
             |         list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks FROM documents),
             |pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |         round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
             |               CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6) AS jaccard
             |  FROM docs a JOIN docs b ON a.source = b.source AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id)
             |SELECT count(*) AS n_pairs, round(sum(jaccard),4) AS sum_jaccard
             |FROM pairs WHERE jaccard >= 0.3""".stripMargin),
      Seq("A6")
    ),

    // Exact-substring duplicate spans (Lee et al. ExactSubstr): every 7th
    // doc gets a shared 10-token tail, so the tail's three fully-internal
    // 8-grams repeat corpus-wide (plus whatever the synthetic text repeats
    // naturally). The oracle replays the whole pipeline — positional md5
    // n-gram hashes, keep-first rule, interval merge — in SQL windows.
    "dd_dup_spans" -> Q(
      (s, d) => {
        val salted = documents(s, d).select(
          col("doc_id"), col("lang"),
          when(col("doc_id") % 7 === 0,
            concat(col("text"),
              lit(" alpha beta gamma delta epsilon zeta eta theta iota kappa")))
            .otherwise(col("text")).as("t"))
        Dedup.duplicateSpans(salted.select(col("doc_id"), col("t")), "doc_id", "t",
            n = 8, hashFn = Dedup.Md5Gram)
          .join(salted.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy(col("lang"))
          .agg(
            countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_spans"),
            sum(col("span_tokens")).as("sum_span_tokens"),
            max(col("span_tokens")).as("max_span_tokens"))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang,
             |         regexp_split_to_array(trim(CASE WHEN doc_id % 7 = 0
             |           THEN text || ' alpha beta gamma delta epsilon zeta eta theta iota kappa'
             |           ELSE text END), '\s+') AS toks
             |  FROM documents),
             |occ AS (
             |  SELECT doc_id, i AS pos,
             |         CAST((md5_number_lower(array_to_string(list_slice(toks, i, i + 7), ' ')) >> 4) AS BIGINT) AS g
             |  FROM corpus, UNNEST(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)),
             |marked AS (
             |  SELECT doc_id, pos, pos + 7 AS e,
             |         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rk,
             |         count(*) OVER (PARTITION BY g) AS cnt
             |  FROM occ),
             |m AS (
             |  SELECT doc_id, pos AS s, e,
             |         max(e) OVER (PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM marked WHERE cnt > 1 AND rk > 1),
             |g2 AS (
             |  SELECT doc_id, s, e,
             |         sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM m),
             |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM g2 GROUP BY doc_id, sid)
             |SELECT d.lang, count(DISTINCT s.doc_id) AS n_docs, count(*) AS n_spans,
             |       CAST(sum(se - ss + 1) AS BIGINT) AS sum_span_tokens,
             |       CAST(max(se - ss + 1) AS BIGINT) AS max_span_tokens
             |FROM spans s JOIN documents d ON s.doc_id = d.doc_id
             |GROUP BY d.lang""".stripMargin),
      Seq("A6", "C13")
    ),

    // Deterministic exactly-k-per-group sampling: 3 docs per (lang, source)
    // cell, ranked by the salted md5 hash; the rank<=k filter compiles to
    // WindowGroupLimit (map-side truncation). Oracle replays the identical
    // rank rule.
    "ta_sample_k" -> Q(
      (s, d) =>
        Sampling.sampleKPerGroup(documents(s, d), "doc_id", Seq("lang", "source"), k = 3,
            salt = "s5", hashFn = Dedup.md5Lower60)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("sum_ids")),
      Some("""SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM (
             |  SELECT lang, doc_id,
             |         row_number() OVER (PARTITION BY lang, source
             |           ORDER BY CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':s5') >> 4) AS BIGINT), doc_id) AS rn
             |  FROM documents) WHERE rn <= 3 GROUP BY lang""".stripMargin),
      Seq("L2", "A1")
    ),

    // Okapi BM25 keyword search (brute): query-term filter runs BEFORE the
    // only corpus-wide shuffle; document frequency is a |query|-row broadcast.
    // Oracle replays the identical formula (same association order; the
    // trailing round(,6) absorbs sum-reassociation noise as elsewhere).
    "ts_bm25" -> Q(
      (s, d) =>
        TextSearch.bm25Scores(documents(s, d), "text", "doc_id", bm25Terms)
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(15),
      Some(bm25OracleSql),
      Seq("A1", "L2", "C1")
    ),

    // Retrieval-quality eval: nDCG@10 / MRR@10 / recall@10 of three
    // single-term BM25 rankings against a relevance table derived from the
    // corpus itself (rel=1 ⟺ the term appears ≥2× — so relevance is a
    // strict subset of the retrieved-candidate set and the metrics are
    // non-trivial). The oracle replays the BM25 scoring CTE per query term,
    // the rank windows with the shared smallest-doc tie-break, and the
    // metric arithmetic.
    "ts_eval_metrics" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        // one corpus pass for all three single-term rankings — value-
        // identical to the per-term bm25Scores calls this replaced (the
        // per-(term, doc) sum is a singleton; see bm25ScoresPerTerm)
        val results = TextSearch.bm25ScoresPerTerm(docs, "text", "doc_id", bm25Terms)
          .select(col("term").as("query"), col("doc_id"), col("score"))
        val rel = bm25Terms.map { t =>
          docs.select(lit(t).as("query"), col("doc_id"),
            when(size(filter(split(trim(col("text")), " "), x => x === lit(t))) >= 2, 1)
              .otherwise(0).as("rel"))
        }.reduce(_.unionByName(_))
        TextSearch.evalRanking(results, rel, "query", "doc_id", "score", "rel", k = 10)
          .select(col("query"), round(col("ndcg"), 6).as("ndcg"),
            round(col("mrr"), 6).as("mrr"), round(col("recall"), 6).as("recall"))
      },
      Some(evalMetricsOracleSql),
      Seq("A1", "L2", "W2")
    ),

    // The same search through the persisted inverted index: postings are
    // partitioned by xxhash64(term) bucket, so the query's scan prunes to
    // its terms' buckets (PLANS.md pins the PartitionFilters invariant).
    // Same oracle as ts_bm25 — the index must change the plan, not the math.
    "ts_bm25_indexed" -> Q(
      (s, d) => {
        val path = bm25IndexDir(d)
        TextSearch.writeIndex(s, documents(s, d), "text", "doc_id", path, nBuckets = 16)
        TextSearch.searchIndex(s, path, bm25Terms, k = Int.MaxValue)
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(15)
      },
      Some(bm25OracleSql),
      Seq("A1", "L2", "F6")
    ),

    // Incremental index maintenance: build on two thirds of the corpus,
    // APPEND the remaining third (tokenizing only the batch; _stats merged
    // by exact integer sums), search through the merge-on-read df path —
    // then compact (segments → one file per bucket, df re-denormalized,
    // never re-tokenizing) and search again through the fast appends=0
    // path. Both searches run against the SAME full-corpus oracle, and the
    // intersect squeezes them to one result: either path drifting from a
    // from-scratch build fails the hash.
    "ts_bm25_incremental" -> Q(
      (s, d) => {
        val path = bm25IndexDir(d, "_inc")
        val docs = documents(s, d)
        TextSearch.writeIndex(s, docs.filter(col("doc_id") % 3 =!= 0),
          "text", "doc_id", path, nBuckets = 16)
        TextSearch.appendToIndex(s, docs.filter(col("doc_id") % 3 === 0),
          "text", "doc_id", path)
        // eager checkpoint: the compaction below swaps the segment files out
        // from under a lazy plan's captured file listing
        val appended = TextSearch.searchIndex(s, path, bm25Terms, k = Int.MaxValue)
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .localCheckpoint()
        TextSearch.compactIndex(s, path)
        val compacted = TextSearch.searchIndex(s, path, bm25Terms, k = Int.MaxValue)
          .select(col("doc_id"), round(col("score"), 6).as("score"))
        appended.intersect(compacted)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(15)
      },
      Some(bm25OracleSql),
      Seq("A1", "L2", "F6")
    ),

    // Snapshot-cursor-driven index maintenance: the BM25 index FOLLOWS a
    // snapshot table (TextSearch.refreshIndexFromSnapshot) — round 1
    // rebuilds, round 2 registers the two appended commits as ONE
    // version-range segment (a manifest query reads only the delta's
    // files). Crash replay is RANGE-PROOF via the index's own segment
    // high-water: a replay whose range exactly matches the crashed round's
    // short-circuits to noop, and — the round-13 advisory case — a replay
    // issued AFTER the table advanced (cursor rolled back, then a 4th
    // commit lands, so the replay range (1,4] ≠ the crashed (1,3])
    // appends exactly the (3,4] tail. Were (1,3] re-appended under the
    // wider segment id, tf/df would double and the scores would diverge
    // from the from-scratch oracle — the hash is the proof. Pinned modes
    // prove each round took rebuild/append/noop/append, never a silent
    // rebuild.
    "ts_bm25_snapshot" -> Q(
      (s, d) => {
        val tbl = bm25IndexDir(d, "_snap_tbl")
        val idx = bm25IndexDir(d, "_snap_idx")
        val cur = bm25IndexDir(d, "_snap_cur") + "/c"
        graft.operators.Snapshots.create(s, tbl)
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        graft.operators.Snapshots.append(s, tbl, docs.filter(col("doc_id") % 3 === 1))
        def refresh() = TextSearch.refreshIndexFromSnapshot(
          s, tbl, idx, "text", "doc_id", cur, nBuckets = 16)
        val m1 = refresh()
        graft.operators.Snapshots.append(s, tbl, docs.filter(col("doc_id") % 3 === 2))
        graft.operators.Snapshots.append(s, tbl,
          docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0))
        val m2 = refresh()
        // crash between index write and cursor commit, table unchanged:
        // the segment high-water says (1,3] is folded in — noop
        graft.operators.Snapshots.commitCursor(cur, 1L)
        val m3 = refresh()
        // crash replay after the table ADVANCED: only (3,4] may append
        graft.operators.Snapshots.commitCursor(cur, 1L)
        graft.operators.Snapshots.append(s, tbl,
          docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0))
        val m4 = refresh()
        TextSearch.searchIndex(s, idx, bm25Terms, k = Int.MaxValue)
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(15)
          .withColumn("modes", lit(s"$m1,$m2,$m3,$m4"))
      },
      Some(s"SELECT x.*, 'rebuild,append,noop,append' AS modes FROM ($bm25OracleSql) x"),
      Seq("S1", "K1", "L2")
    ),

    // CCNet-style perplexity filter: bigram LM (add-0.5 smoothing) trained
    // on the even-doc_id slice, every document scored under it. Per-doc
    // log-ppl is rounded to 6dp on both sides, then aggregated in exact
    // integer micro-units (the gopher s_* pattern); the keep threshold 3.45
    // sits 2.7e-5 from the nearest document — far beyond float noise.
    "ta_perplexity" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val lm = LanguageModel.trainBigram(docs.filter(col("doc_id") % 2 === 0), "text")
        LanguageModel.scoreDocs(lm, docs, "text", "doc_id")
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_toks")).as("sum_toks"),
            sum(round(round(col("log_ppl"), 6) * 1e6).cast("long")).as("s_logppl"),
            sum(when(round(col("log_ppl"), 6) <= 3.45, 1L).otherwise(0L)).as("n_keep"))
      },
      Some(perplexityOracleSql),
      Seq("A1", "C1", "F9")
    ),

    // The PRODUCTION gram-hash path, oracle-checked: polynomial-of-token-
    // hashes (Horner mod 2^31-1) with the md5-derived token hash DuckDB can
    // recompute. The oracle evaluates the same polynomial as a modular SUM
    // of per-offset terms (Horner == Σ h_j·C^(n-1-j) mod p).
    "dd_contamination_poly" -> Q(
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("_th", Dedup.tokenHashes(col("text"), Dedup.md5Lower60))
        def grams = explode(array_distinct(Dedup.polyWindowHashes(col("_th"), 13))).as("_gram")
        val corpusGrams = docs.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), grams)
        val benchGrams = docs.filter(col("doc_id") % 50 === 0)
          .select(grams).distinct()
        corpusGrams.join(benchGrams, Seq("_gram"), "left_semi")
          .select(col("doc_id")).distinct()
          .agg(
            count(lit(1)).as("n_contaminated"),
            coalesce(sum(col("doc_id")), lit(0L)).as("sum_ids"))
      },
      Some(polyContaminationOracleSql(n = 13)),
      Seq("A6", "C13")
    ),

    // BPE trainer statistics: the weighted adjacent-pair counts of the
    // first training iteration (the argmax of this table IS merge #1), over
    // the corpus word-frequency table. Exact integers; the multi-merge
    // loop is pinned by BpeTrainerSpec against the published example.
    "ta_bpe_pairs" -> Q(
      (s, d) =>
        BpeTrainer.pairCounts(
          BpeTrainer.wordCounts(documents(s, d), "text")
            .select(split(col("w"), "").as("syms"), col("n")))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(10),
      Some("""WITH words AS (
             |  SELECT w, count(*) AS n FROM (
             |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
             |  WHERE length(w) > 0 GROUP BY w),
             |chars AS (SELECT n, string_split(w, '') AS cs FROM words),
             |pairs AS (
             |  SELECT n, unnest(list_zip(list_slice(cs, 1, len(cs) - 1), list_slice(cs, 2, len(cs)))) AS p
             |  FROM chars WHERE len(cs) >= 2)
             |SELECT p[1] AS a, p[2] AS b, CAST(sum(n) AS BIGINT) AS cnt
             |FROM pairs GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 10""".stripMargin),
      Seq("A1", "C1")
    ),

    // Relative quality gate: keep each language's top 75% by n_chars (the
    // per-group exact-quantile threshold filter). Integer outputs; the
    // threshold doubles are bit-equal across engines (a_median_exact pins
    // percentile == quantile_cont).
    "ta_quantile_filter" -> Q(
      (s, d) =>
        QualityFilters.quantileFilter(
          documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          "n_chars", "lang", p = 0.25)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_keep"), sum(col("n_chars")).as("sum_chars")),
      Some("""WITH thr AS (SELECT lang, quantile_cont(n_chars, 0.25) AS t FROM documents GROUP BY lang)
             |SELECT d.lang, count(*) AS n_keep, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
             |FROM documents d JOIN thr ON d.lang = thr.lang
             |WHERE d.n_chars >= thr.t GROUP BY d.lang""".stripMargin),
      Seq("A1", "F9")
    ),

    // C-series breadth: the string-function family Spark and DuckDB define
    // identically — levenshtein (unit-cost edit distance), reverse, lpad,
    // translate — over each document's first token. Exact strings/ints.
    "c_string_funcs" -> Q(
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"), element_at(split(trim(col("text")), " "), 1).as("w1"))
          .select(
            col("doc_id"),
            levenshtein(col("w1"), lit("spark")).as("lev"),
            reverse(col("w1")).as("rev"),
            lpad(col("w1"), 12, "_").as("pad"),
            translate(col("w1"), "aeiou", "AEIOU").as("tr"))
          .orderBy(col("doc_id")).limit(50),
      Some("""SELECT doc_id,
             |  levenshtein(w1, 'spark') AS lev,
             |  reverse(w1) AS rev,
             |  lpad(w1, 12, '_') AS pad,
             |  translate(w1, 'aeiou', 'AEIOU') AS tr
             |FROM (SELECT doc_id, string_split(trim(text), ' ')[1] AS w1 FROM documents)
             |ORDER BY doc_id LIMIT 50""".stripMargin),
      Seq("C10", "C3")
    ),

    // HTML → text extraction (the WET primitive): each doc's first words
    // wrapped in markup with script/style/comment blocks, attributes, and
    // the predefined entities, then stripped. The whole chain is
    // RE2-compatible regex (inline (?is) flags, no \Q quoting), so the
    // oracle replays it verbatim; the extracted STRING itself is compared,
    // not just a length. Double-encoded &amp;lt; must come out as &lt;
    // (amp decodes last — the order that never double-decodes).
    "ta_html_strip" -> Q(
      (s, d) => {
        val w8 = array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ")
        val html = concat(
          lit("<html><body class=\"x\"><h1>T&amp;C &amp;lt;</h1><p>"), w8,
          lit(" &quot;q&#39;s&quot; &lt;tag&gt;&nbsp;end</p>" +
            "<script type=\"text/javascript\">var a = 1 < 2;</script>" +
            "<!-- hidden --><style>p { color: red; }</style></body></html>"))
        documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), stripHtml(html).as("extracted"))
          .withColumn("n_chars2", length(col("extracted")).cast("long"))
      },
      Some("""WITH built AS (
             |  SELECT doc_id,
             |    '<html><body class="x"><h1>T&amp;C &amp;lt;</h1><p>' ||
             |    array_to_string(regexp_split_to_array(trim(text), '\s+')[1:8], ' ') ||
             |    ' &quot;q&#39;s&quot; &lt;tag&gt;&nbsp;end</p>' ||
             |    '<script type="text/javascript">var a = 1 < 2;</script>' ||
             |    '<!-- hidden --><style>p { color: red; }</style></body></html>' AS h
             |  FROM documents WHERE doc_id < 100),
             |stripped AS (
             |  SELECT doc_id,
             |    trim(regexp_replace(
             |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |      regexp_replace(regexp_replace(
             |        h,
             |        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
             |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
             |        '(?s)<!--.*?-->', ' ', 'g'),
             |        '<[^>]+>', ' ', 'g'),
             |        '&lt;', '<', 'g'),
             |        '&gt;', '>', 'g'),
             |        '&quot;', '"', 'g'),
             |        '&#39;', CAST('''' AS VARCHAR), 'g'),
             |        '&nbsp;', ' ', 'g'),
             |        '&amp;', '&', 'g'),
             |      '\s+', ' ', 'g')) AS extracted
             |  FROM built)
             |SELECT doc_id, extracted, CAST(len(extracted) AS BIGINT) AS n_chars2
             |FROM stripped""".stripMargin),
      Seq("C17", "C10")
    ),

    // Corpus distribution drift (PSI + KL) between the even- and odd-id
    // halves over the md5 hashed-bigram bucket family — the "is this
    // month's crawl distributed like the corpus my thresholds were tuned
    // on" monitor. Everything after the two count scans is a ≤buckets-row
    // full-outer join; per-bucket contributions round to exact nano-unit
    // longs BEFORE summation (integer associativity ⇒ partition-invariant
    // and SQL-replayable); absent-bucket floor terms fold in analytically.
    "ta_dist_drift" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        Drift.textDrift(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "text", buckets = 512, n = 2, gramHash = Dedup.Md5Gram)
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(
             |    CASE WHEN len(toks) - 1 <= 0 THEN CAST([] AS VARCHAR[])
             |    ELSE list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
             |      i -> array_to_string(list_slice(toks, i, i + 1), ' ')) END) AS g
             |  FROM corpus),
             |gb AS (
             |  SELECT doc_id,
             |         (CAST((md5_number_lower(g) >> 4) AS BIGINT) % 512) AS bucket
             |  FROM grams),
             |rcnt AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 2 = 0 GROUP BY bucket),
             |ccnt AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 2 = 1 GROUP BY bucket),
             |tot AS (SELECT
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM rcnt) + 512 AS DOUBLE) AS dr,
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM ccnt) + 512 AS DOUBLE) AS dc,
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM rcnt) AS BIGINT) AS nr,
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM ccnt) AS BIGINT) AS nc),
             |j AS (
             |  SELECT ((coalesce(r.cnt, 0) + 1.0) / (SELECT dr FROM tot)) AS p,
             |         ((coalesce(c.cnt, 0) + 1.0) / (SELECT dc FROM tot)) AS q
             |  FROM rcnt r FULL OUTER JOIN ccnt c ON r.bucket = c.bucket),
             |terms AS (
             |  SELECT CAST(round((p - q) * ln(p / q) * 1e9) AS BIGINT) AS psin,
             |         CAST(round(p * ln(p / q) * 1e9) AS BIGINT) AS kln
             |  FROM j),
             |pres AS (
             |  SELECT count(*) AS np, coalesce(sum(psin), 0) AS sp,
             |         coalesce(sum(kln), 0) AS sk FROM terms),
             |fl AS (
             |  SELECT CAST(round((1.0 / dr - 1.0 / dc) * ln((1.0 / dr) / (1.0 / dc)) * 1e9) AS BIGINT) AS psi0,
             |         CAST(round((1.0 / dr) * ln((1.0 / dr) / (1.0 / dc)) * 1e9) AS BIGINT) AS kl0
             |  FROM tot)
             |SELECT round((sp + (512 - np) * (SELECT psi0 FROM fl)) / 1e9, 6) AS psi,
             |       round((sk + (512 - np) * (SELECT kl0 FROM fl)) / 1e9, 6) AS kl_ref_cur,
             |       CAST(np AS BIGINT) AS n_buckets_present,
             |       (SELECT nr FROM tot) AS n_ref, (SELECT nc FROM tot) AS n_cur
             |FROM pres""".stripMargin),
      Seq("A1", "A2", "C1")
    ),

    // §2.11: STREAMING drift monitor, oracle-pinned — the nano-unit integer
    // discipline makes the per-microbatch PSI/KL exactly SQL-replayable,
    // so the stateful monitor gets a hash oracle, not just a spec: a 10%
    // ingest slice (doc_id % 10 = 1) streams through driftMonitorWriter
    // (one JSON file → one AvailableNow microbatch) against a 10% reference
    // sample's precomputed md5 bucket table, and the emitted metrics row
    // must equal the SQL replay to the last rounded digit. The gate's cost
    // is the streaming face itself, not corpus volume — ta_dist_drift
    // already pins the full-corpus batch computation.
    "s11_streaming_drift" -> Q(
      (s, d) => graft.streaming.StreamingPipeline.withStatePartitions(s) {
        val srcDir = QueryScratch.dir(d, "sdrift_src")
        val outDir = QueryScratch.dir(d, "sdrift_out")
        val ckpt = QueryScratch.dir(d, "sdrift_ckpt")
        Seq(srcDir, outDir, ckpt).foreach(QueryScratch.clean)
        val docs = documents(s, d)
        val ref = ImportanceSampling.bucketCounts(
          docs.filter(col("doc_id") % 10 === 0), "text",
          buckets = 512, n = 2, gramHash = Dedup.Md5Gram)
        docs.filter(col("doc_id") % 10 === 1)
          .select(col("doc_id"), col("text"))
          .coalesce(1).write.mode("overwrite").json(srcDir)
        val stream = s.readStream.schema("doc_id BIGINT, text STRING").json(srcDir)
        val q = graft.streaming.StreamingPipeline.driftMonitorWriter(
          stream, "text", ref, buckets = 512, checkpointDir = ckpt,
          n = 2, gramHash = Dedup.Md5Gram
        ) { metrics =>
          metrics.coalesce(1).write.mode("append").parquet(outDir)
        }.start()
        q.awaitTermination()
        s.read.parquet(outDir)
          .select(col("batch_id"), col("psi"), col("kl_ref_cur"),
            col("n_buckets_present"), col("n_ref"), col("n_cur"))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(
             |    CASE WHEN len(toks) - 1 <= 0 THEN CAST([] AS VARCHAR[])
             |    ELSE list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
             |      i -> array_to_string(list_slice(toks, i, i + 1), ' ')) END) AS g
             |  FROM corpus),
             |gb AS (
             |  SELECT doc_id,
             |         (CAST((md5_number_lower(g) >> 4) AS BIGINT) % 512) AS bucket
             |  FROM grams),
             |rcnt AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 10 = 0 GROUP BY bucket),
             |ccnt AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 10 = 1 GROUP BY bucket),
             |tot AS (SELECT
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM rcnt) + 512 AS DOUBLE) AS dr,
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM ccnt) + 512 AS DOUBLE) AS dc,
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM rcnt) AS BIGINT) AS nr,
             |  CAST((SELECT coalesce(sum(cnt), 0) FROM ccnt) AS BIGINT) AS nc),
             |j AS (
             |  SELECT ((coalesce(r.cnt, 0) + 1.0) / (SELECT dr FROM tot)) AS p,
             |         ((coalesce(c.cnt, 0) + 1.0) / (SELECT dc FROM tot)) AS q
             |  FROM rcnt r FULL OUTER JOIN ccnt c ON r.bucket = c.bucket),
             |terms AS (
             |  SELECT CAST(round((p - q) * ln(p / q) * 1e9) AS BIGINT) AS psin,
             |         CAST(round(p * ln(p / q) * 1e9) AS BIGINT) AS kln
             |  FROM j),
             |pres AS (
             |  SELECT count(*) AS np, coalesce(sum(psin), 0) AS sp,
             |         coalesce(sum(kln), 0) AS sk FROM terms),
             |fl AS (
             |  SELECT CAST(round((1.0 / dr - 1.0 / dc) * ln((1.0 / dr) / (1.0 / dc)) * 1e9) AS BIGINT) AS psi0,
             |         CAST(round((1.0 / dr) * ln((1.0 / dr) / (1.0 / dc)) * 1e9) AS BIGINT) AS kl0
             |  FROM tot)
             |SELECT CAST(0 AS BIGINT) AS batch_id,
             |       round((sp + (512 - np) * (SELECT psi0 FROM fl)) / 1e9, 6) AS psi,
             |       round((sk + (512 - np) * (SELECT kl0 FROM fl)) / 1e9, 6) AS kl_ref_cur,
             |       CAST(np AS BIGINT) AS n_buckets_present,
             |       (SELECT nr FROM tot) AS n_ref, (SELECT nc FROM tot) AS n_cur
             |FROM pres""".stripMargin),
      Seq("S6", "A1", "A2")
    ),

    // Length-bucketed batching — the dynamic-batching layout that collapses
    // padding waste: per source, rows sort (n_chars desc, doc_id) and chop
    // into batches of 8. The operator assembles the global rank from
    // length-range buckets (offset table + bucket-scoped window — never a
    // whole-source window); the oracle replays the NAIVE whole-source
    // window, so the decomposition must be row-identical to it.
    "ta_length_batching" -> Q(
      (s, d) => {
        val batched = Sampling.lengthBatches(documents(s, d), "doc_id",
          "n_chars", batchSize = 8, sourceCol = "source", lenBucketWidth = 64)
        Sampling.paddingStats(batched, "n_chars", "source")
      },
      Some("""WITH ranked AS (
             |  SELECT source, n_chars,
             |         row_number() OVER (PARTITION BY source
             |                            ORDER BY n_chars DESC, doc_id) AS rn
             |  FROM documents),
             |b AS (SELECT source, n_chars, (rn - 1) // 8 AS batch_id FROM ranked)
             |SELECT source, batch_id, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(max(n_chars) AS BIGINT) AS max_len,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_len,
             |       CAST(max(n_chars) * count(*) - sum(n_chars) AS BIGINT) AS padding
             |FROM b GROUP BY source, batch_id""".stripMargin),
      Seq("W2", "A1")
    ),

    // Top-20 bigram collocations by pointwise mutual information:
    // PMI = ln(c₁₂) + 2·ln(T) − ln(T₂) − ln(c₁) − ln(c₂), min count 5 —
    // the collocation-mining classic. Plan shape: the bigram table joins
    // the unigram table twice EQUI-KEY and the three totals ride along as
    // broadcast scalars; ranking is by the ROUNDED pmi (shared tie-break)
    // so cross-engine ulp noise in ln cannot reorder the cut.
    "ta_pmi_top20" -> Q(
      (s, d) => {
        val docs = documents(s, d)
        val toks = split(trim(col("text")), " ")
        val flat = docs.select(posexplode(toks).as(Seq("i", "w")), col("doc_id"))
        val uni = flat.groupBy(col("w")).agg(count(lit(1)).as("cu"))
        val bg = docs
          .withColumn("toks", toks)
          .filter(size(col("toks")) >= 2)
          .select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2")))).as("b"))
          .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .agg(count(lit(1)).as("cb"))
        val totals = flat.agg(count(lit(1)).cast("double").as("t"))
          .crossJoin(bg.agg(sum(col("cb")).cast("double").as("t2")))
        bg.filter(col("cb") >= 5)
          .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cu", "c1"), Seq("w1"))
          .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cu", "c2"), Seq("w2"))
          .crossJoin(broadcast(totals))
          .select(col("w1"), col("w2"), col("cb").as("n"),
            round(log(col("cb").cast("double")) + lit(2.0) * log(col("t"))
              - log(col("t2")) - log(col("c1").cast("double"))
              - log(col("c2").cast("double")), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH flat AS (
             |  SELECT doc_id,
             |         generate_subscripts(string_split(trim(text), ' '), 1) AS i,
             |         unnest(string_split(trim(text), ' ')) AS w
             |  FROM documents),
             |uni AS (SELECT w, count(*) AS cu FROM flat GROUP BY w),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM flat),
             |bg AS (
             |  SELECT a.w AS w1, b.w AS w2, count(*) AS cb
             |  FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             |  GROUP BY 1, 2),
             |tot2 AS (SELECT CAST(sum(cb) AS DOUBLE) AS t2 FROM bg)
             |SELECT w1, w2, CAST(cb AS BIGINT) AS n,
             |       round(ln(CAST(cb AS DOUBLE)) + 2.0 * ln((SELECT t FROM tot))
             |             - ln((SELECT t2 FROM tot2)) - ln(CAST(u1.cu AS DOUBLE))
             |             - ln(CAST(u2.cu AS DOUBLE)), 6) AS pmi
             |FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w
             |WHERE cb >= 5
             |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin),
      Seq("A2", "C10", "L2")
    ),

    // Higher-order array lambdas — aggregate (fold), zip_with, exists,
    // forall, filter — the codegen'd in-row loop surface that replaces
    // per-element UDFs. DuckDB replays each value through its list_*
    // equivalents (list_sum, list_dot_product over the reversed list,
    // list_filter emptiness for exists/forall).
    "c_lambda_funcs" -> Q(
      (s, d) => {
        val ws = split(trim(col("text")), "\\s+")
        val ls = transform(ws, w => length(w).cast("long"))
        documents(s, d)
          .select(col("doc_id"), ls.as("ls"))
          .select(
            col("doc_id"),
            aggregate(col("ls"), lit(0L), (acc, x) => acc + x).as("sum_len"),
            aggregate(zip_with(col("ls"), reverse(col("ls")), (a, b) => a * b),
              lit(0L), (acc, x) => acc + x).as("dot_rev"),
            exists(col("ls"), x => x > 10).as("has_long"),
            forall(col("ls"), x => x > 0).as("all_nonempty"),
            size(filter(col("ls"), x => x % 2 === 0)).as("n_even"))
          .orderBy(col("doc_id")).limit(100)
      },
      Some("""SELECT doc_id,
             |  CAST(list_sum(ls) AS BIGINT) AS sum_len,
             |  CAST(list_dot_product(ls, list_reverse(ls)) AS BIGINT) AS dot_rev,
             |  len(list_filter(ls, x -> x > 10)) > 0 AS has_long,
             |  len(list_filter(ls, x -> NOT (x > 0))) = 0 AS all_nonempty,
             |  CAST(len(list_filter(ls, x -> x % 2 = 0)) AS INT) AS n_even
             |FROM (SELECT doc_id,
             |        list_transform(regexp_split_to_array(trim(text), '\s+'),
             |          w -> CAST(len(w) AS BIGINT)) AS ls
             |      FROM documents)
             |ORDER BY doc_id LIMIT 100""".stripMargin),
      Seq("C10", "C1")
    ),

    // Generator breadth: posexplode_outer (the null-preserving explode —
    // a doc whose word array is emptied still emits one row, the LEFT JOIN
    // semantics `explode` silently drops) composed with a per-word
    // sequence() generator. Every 5th doc's array is emptied to exercise
    // the outer path. DuckDB replays the inner generator with unnest +
    // generate_series and re-adds the empty docs via anti-join UNION.
    "c_generator_funcs" -> Q(
      (s, d) => {
        val ws5 = slice(split(trim(col("text")), "\\s+"), 1, 5)
        val arr = when(col("doc_id") % 5 === 0, array().cast("array<string>"))
          .otherwise(ws5)
        documents(s, d)
          // all-whitespace text splits to [""], whose zero-length word would
          // hit Spark's DESCENDING sequence(1,0) — exclude it on both sides
          .filter(col("doc_id") < 50 && trim(col("text")) =!= "")
          .select(col("doc_id"), posexplode_outer(arr).as(Seq("pos", "w")))
          .select(col("doc_id"), col("pos"), col("w"),
            when(col("w").isNull, lit(0L))
              .otherwise(aggregate(sequence(lit(1L), length(col("w")).cast("long")),
                lit(0L), (acc, x) => acc + x)).as("tri"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_rows"), sum(col("pos")).as("sum_pos"),
            sum(col("tri")).as("sum_tri"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+')[1:5] AS ws
             |  FROM documents WHERE doc_id < 50 AND trim(text) <> ''),
             |inner_rows AS (
             |  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS w
             |  FROM base WHERE doc_id % 5 <> 0),
             |with_tri AS (
             |  SELECT doc_id, pos, len(w) * (len(w) + 1) // 2 AS tri FROM inner_rows),
             |outer_rows AS (
             |  SELECT doc_id, CAST(NULL AS INT) AS pos, CAST(0 AS BIGINT) AS tri
             |  FROM base WHERE doc_id % 5 = 0)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(sum(pos) AS BIGINT) AS sum_pos,
             |       CAST(sum(tri) AS BIGINT) AS sum_tri
             |FROM (SELECT * FROM with_tri UNION ALL SELECT * FROM outer_rows)
             |GROUP BY doc_id""".stripMargin),
      Seq("C10", "W2")
    ),

    // Map-typed column surface: map_from_arrays over the doc's first three
    // words, map_concat overlay (right side wins on key collision),
    // transform_values, map_keys/map_values — reduced to deterministic
    // scalars (sorted key join + value sum) so the oracle replays the
    // VALUES from plain arrays without needing a cross-engine map encoding.
    "c_map_funcs" -> Q(
      (s, d) => {
        val w3 = slice(split(trim(col("text")), "\\s+"), 1, 3)
        val m = map_from_arrays(col("w3"), array(lit(1L), lit(2L), lit(3L)))
        val m2 = map_concat(map(lit("extra"), lit(10L)), transform_values(m, (_, v) => v * 2))
        documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), w3.as("w3"))
          // first 3 words of a doc can repeat; map keys must be unique
          .filter(size(array_distinct(col("w3"))) === 3 &&
            !array_contains(col("w3"), "extra"))
          .select(col("doc_id"), m2.as("m2"))
          .select(col("doc_id"),
            size(col("m2")).as("n_keys"),
            array_join(array_sort(map_keys(col("m2"))), ",").as("keys_sorted"),
            aggregate(map_values(col("m2")), lit(0L), (acc, x) => acc + x).as("sum_vals"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+')[1:3] AS w3
             |  FROM documents WHERE doc_id < 100),
             |uniq AS (
             |  SELECT * FROM base
             |  WHERE len(list_distinct(w3)) = 3 AND NOT list_contains(w3, 'extra'))
             |SELECT doc_id,
             |       CAST(4 AS INT) AS n_keys,
             |       array_to_string(list_sort(list_append(w3, 'extra')), ',') AS keys_sorted,
             |       CAST(22 AS BIGINT) AS sum_vals
             |FROM uniq""".stripMargin),
      Seq("C10", "C15")
    ),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword ranking
    // (documents) and the cosine vector ranking (embeddings — the id spaces
    // align 1:1 in the testdata). Ranks come from the ROUNDED scores on
    // both sides so rank order is engine-independent; the fused score is
    // rank-only arithmetic (1/(60+r)), which is why RRF needs no score
    // calibration between the two lists.
    "ts_hybrid_rrf" -> Q(
      (s, d) => {
        val bm = TextSearch.bm25Scores(documents(s, d), "text", "doc_id", bm25Terms)
          .select(col("doc_id"), round(col("score"), 6).as("s"))
          .orderBy(col("s").desc, col("doc_id")).limit(20)
        val qv = embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        val vec = Similarity.topK(embeddings(s, d).filter(col("vec_id") =!= 0),
            "embedding", "vec_id", qv, 20)
          .select(col("vec_id").as("doc_id"), col("sim").as("s"))
        TextSearch.fuseRrf(Seq(bm, vec), "doc_id", "s", k = 10)
          .select(col("doc_id"), col("n_lists"), round(col("rrf"), 6).as("rrf"))
      },
      Some(hybridRrfOracleSql),
      Seq("E2", "L2", "SO2")
    )
  )

  private def bm25Terms = Seq("spark", "vector", "hash")

  private def bm25IndexDir(d: String, suffix: String = ""): String = {
    val sf = java.nio.file.Paths.get(d).getFileName.toString
    val p = s"/tmp/graft/$sf/bm25_index$suffix"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(): Unit
    }
    val f = new java.io.File(p)
    if (f.exists()) rm(f)
    p
  }

  /** DuckDB twin of [[graft.operators.TextSearch.bm25Scores]] with the Okapi
    * defaults (k1=1.2, b=0.75), written with the same literal arithmetic
    * (`1.2 + 1.0`, `1.0 - 0.75`) so both engines round the identical doubles.
    */
  private def bm25OracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(trim(text), ' '), t -> length(t) > 0) AS toks
       |  FROM documents),
       |lens AS (SELECT doc_id, len(toks) AS dl, toks FROM toks),
       |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM lens)
       |  WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT doc_id,
       |         ln(1.0 + (n - df + 0.5) / (df + 0.5))
       |           * (tf * (1.2 + 1.0))
       |           / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) AS w
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
       |SELECT doc_id, round(sum(w), 6) AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin

  /** DuckDB twin of [[graft.operators.TextSearch.evalRanking]] over the
    * three single-term BM25 rankings: per-term scoring through the shared
    * bm25 CTE shape, rank windows with the smallest-doc tie-break, rel=1 ⟺
    * tf ≥ 2 (read straight off the tf CTE), then the nDCG/MRR/recall math.
    */
  private def evalMetricsOracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(trim(text), ' '), t -> length(t) > 0) AS toks
       |  FROM documents),
       |lens AS (SELECT doc_id, len(toks) AS dl, toks FROM toks),
       |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM lens)
       |  WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT term AS query, doc_id,
       |         ln(1.0 + (n - df + 0.5) / (df + 0.5))
       |           * (tf * (1.2 + 1.0))
       |           / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) AS score
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
       |ranked AS (
       |  SELECT query, doc_id, score,
       |         row_number() OVER (PARTITION BY query ORDER BY score DESC, doc_id) AS rank
       |  FROM scored),
       |topk AS (SELECT * FROM ranked WHERE rank <= 10),
       |rel AS (SELECT term AS query, doc_id, 1 AS rel FROM tf WHERE tf >= 2),
       |joined AS (
       |  SELECT t.query, t.rank, COALESCE(r.rel, 0) AS rel
       |  FROM topk t LEFT JOIN rel r ON t.query = r.query AND t.doc_id = r.doc_id),
       |dcg AS (
       |  SELECT query,
       |         sum((power(2.0, rel) - 1.0) / log2(rank + 1)) AS dcg,
       |         min(CASE WHEN rel > 0 THEN rank END) AS firstrel,
       |         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS relret
       |  FROM joined GROUP BY query),
       |ideal AS (
       |  SELECT query,
       |         sum(CASE WHEN irank <= 10
       |             THEN (power(2.0, rel) - 1.0) / log2(irank + 1) ELSE 0.0 END) AS idcg,
       |         count(*) AS reltotal
       |  FROM (SELECT query, doc_id, rel,
       |               row_number() OVER (PARTITION BY query ORDER BY rel DESC, doc_id) AS irank
       |        FROM rel)
       |  GROUP BY query)
       |SELECT d.query,
       |       round(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg,
       |       round(CASE WHEN d.firstrel IS NOT NULL THEN 1.0 / d.firstrel ELSE 0.0 END, 6) AS mrr,
       |       round(CAST(d.relret AS DOUBLE) / i.reltotal, 6) AS recall
       |FROM dcg d JOIN ideal i USING (query)""".stripMargin

  /** DuckDB twin of the polynomial gram-hash contamination sweep: token
    * hashes via `md5_number_lower >> 4 mod p`, window hashes as the modular
    * sum `Σ h_j · C^(n-1-j) mod p` — value-identical to the Spark side's
    * Horner fold by modular-arithmetic identity.
    */
  private def polyContaminationOracleSql(n: Int): String = {
    val p = Dedup.MersenneP
    val C = 1000003L
    val coefs = (0 until n).map { j =>
      var x = 1L
      (0 until (n - 1 - j)).foreach(_ => x = x * C % p)
      x
    }
    val values = coefs.zipWithIndex.map { case (c, j) => s"($j, $c)" }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM documents),
       |flat AS (
       |  SELECT doc_id, len(ts) AS nt, generate_subscripts(ts, 1) AS i,
       |         (CAST((md5_number_lower(unnest(ts)) >> 4) AS BIGINT) % $p) AS h
       |  FROM toks),
       |offs AS (SELECT * FROM (VALUES $values) AS t(off, coef)),
       |terms AS (
       |  SELECT doc_id, nt, (i - off) AS start, (h * coef) % $p AS term
       |  FROM flat JOIN offs ON i - off >= 1),
       |grams AS (
       |  SELECT doc_id, start, CAST(SUM(term) % $p AS BIGINT) AS gh
       |  FROM terms WHERE start <= nt - ${n - 1}
       |  GROUP BY doc_id, nt, start),
       |dgrams AS (SELECT DISTINCT doc_id, gh FROM grams),
       |corp AS (SELECT doc_id, gh FROM dgrams WHERE doc_id % 50 <> 0),
       |bench AS (SELECT DISTINCT gh FROM dgrams WHERE doc_id % 50 = 0),
       |flagged AS (SELECT DISTINCT c.doc_id FROM corp c JOIN bench b USING (gh))
       |SELECT CAST(count(*) AS BIGINT) AS n_contaminated,
       |       CAST(COALESCE(sum(doc_id), 0) AS BIGINT) AS sum_ids FROM flagged""".stripMargin
  }

  /** DuckDB twin of the hybrid query: the bm25 CTE (top 20 by rounded
    * score), the cosine CTE (top 20 — membership by raw sim like the green
    * e2_cosine_topk oracle, rank by rounded), RRF-fused.
    */
  private def hybridRrfOracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(trim(text), ' '), t -> length(t) > 0) AS toks
       |  FROM documents),
       |lens AS (SELECT doc_id, len(toks) AS dl, toks FROM toks),
       |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM lens)
       |  WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT doc_id,
       |         ln(1.0 + (n - df + 0.5) / (df + 0.5))
       |           * (tf * (1.2 + 1.0))
       |           / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) AS w
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
       |bm_top AS (SELECT doc_id, round(sum(w), 6) AS s FROM scored GROUP BY doc_id
       |           ORDER BY s DESC, doc_id LIMIT 20),
       |bm_rank AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r FROM bm_top),
       |qv AS (SELECT generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
       |       FROM embeddings WHERE vec_id = 0),
       |v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
       |      FROM embeddings WHERE vec_id <> 0),
       |sims AS (SELECT v.vec_id, sum(v.x * q.x) AS dot, sqrt(sum(v.x * v.x)) AS na
       |         FROM v JOIN qv q ON v.i = q.i GROUP BY v.vec_id),
       |nb AS (SELECT sqrt(sum(x * x)) AS nb FROM qv),
       |vec_top AS (SELECT vec_id AS doc_id, round(dot / (na * (SELECT nb FROM nb)), 6) AS s
       |            FROM sims ORDER BY dot / (na * (SELECT nb FROM nb)) DESC, vec_id LIMIT 20),
       |vec_rank AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r FROM vec_top),
       |contrib AS (SELECT doc_id, 1.0 / (60 + r) AS cc FROM bm_rank
       |            UNION ALL SELECT doc_id, 1.0 / (60 + r) FROM vec_rank)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists, round(sum(cc), 6) AS rrf
       |FROM contrib GROUP BY doc_id ORDER BY sum(cc) DESC, doc_id LIMIT 10""".stripMargin

  /** DuckDB twin of [[graft.operators.LanguageModel]]: the same even-slice
    * bigram LM, the same smoothing arithmetic (`0.5 * vocab` written out so
    * both engines fold the identical doubles), per-doc log-ppl rounded to
    * 6dp then integer-summed in micro-units.
    */
  private def perplexityOracleSql: String =
    """WITH lens AS (
      |  SELECT doc_id, lang, list_filter(string_split(trim(text), ' '), t -> length(t) > 0) AS toks
      |  FROM documents),
      |train AS (SELECT doc_id, toks FROM lens WHERE doc_id % 2 = 0 AND len(toks) >= 1),
      |uni AS (SELECT w, count(*) AS c FROM (SELECT unnest(toks) AS w FROM train) GROUP BY w),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total, count(*) AS vocab FROM uni),
      |tflat AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w FROM train),
      |bi AS (SELECT a.w AS w1, b.w AS w2, count(*) AS c12
      |       FROM tflat a JOIN tflat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |       GROUP BY w1, w2),
      |scored AS (SELECT doc_id, lang, toks, len(toks) AS n_toks FROM lens WHERE len(toks) >= 1),
      |firstlp AS (
      |  SELECT s.doc_id, ln((COALESCE(u.c, 0) + 0.5) / (tot.total + 0.5 * tot.vocab)) AS lp
      |  FROM scored s LEFT JOIN uni u ON u.w = s.toks[1] CROSS JOIN tot),
      |sflat AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w FROM scored),
      |spairs AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
      |           FROM sflat a JOIN sflat b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |pairlp AS (
      |  SELECT p.doc_id, ln((COALESCE(bi.c12, 0) + 0.5) / (COALESCE(u.c, 0) + 0.5 * tot.vocab)) AS lp
      |  FROM spairs p LEFT JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
      |  LEFT JOIN uni u ON u.w = p.w1 CROSS JOIN tot),
      |lp AS (SELECT doc_id, lp FROM firstlp UNION ALL SELECT doc_id, lp FROM pairlp),
      |perdoc AS (SELECT doc_id, sum(lp) AS logprob FROM lp GROUP BY doc_id),
      |final AS (SELECT s.lang, s.n_toks, -p.logprob / s.n_toks AS log_ppl
      |          FROM perdoc p JOIN scored s USING (doc_id))
      |SELECT lang, count(*) AS n, CAST(sum(n_toks) AS BIGINT) AS sum_toks,
      |       CAST(sum(CAST(round(round(log_ppl, 6) * 1e6) AS BIGINT)) AS BIGINT) AS s_logppl,
      |       CAST(sum(CASE WHEN round(log_ppl, 6) <= 3.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      |FROM final GROUP BY lang""".stripMargin

  /** DuckDB twin of [[graft.functions.TextFunctions.langId]] +
    * [[graft.functions.TextFunctions.langIdNgram]], generated from the SAME
    * stopword/trigram tables so the two sides cannot drift.
    */
  private def langIdOracleSql: String = {
    import graft.functions.TextFunctions.{langStopwords, langTrigrams}
    val langs = langStopwords.keys.toSeq.sorted
    def swStruct(l: String): String = {
      val sw = langStopwords(l).map(s => s"'$s'").mkString(",")
      s"{'score': CAST(len(list_filter(toks, t -> list_contains([$sw], t))) AS DOUBLE) / " +
        s"CAST(greatest(len(toks), 1) AS DOUBLE), 'lang': '$l'}"
    }
    def ngStruct(l: String): String = {
      val terms = langTrigrams(l)
        .map(g => s"(length(padded) - length(replace(padded, '$g', ''))) / ${g.length}")
        .mkString(" + ")
      s"{'score': CAST($terms AS DOUBLE) / CAST(greatest(length(padded), 1) AS DOUBLE), 'lang': '$l'}"
    }
    s"""WITH base AS (
       |  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,
       |         ' ' || lower(trim(text)) || ' ' AS padded
       |  FROM documents),
       |scored AS (
       |  SELECT
       |    (list_max([${langs.map(swStruct).mkString(",\n      ")}])).lang AS pred_stopword,
       |    (list_max([${langs.map(ngStruct).mkString(",\n      ")}])).lang AS pred_ngram
       |  FROM base)
       |SELECT pred_stopword, pred_ngram, count(*) AS n
       |FROM scored GROUP BY pred_stopword, pred_ngram""".stripMargin
  }
  /** The battery's rule-7 word list: the published English constant plus
    * the langId stopword profiles — the corpus is multilingual, and the
    * English-only list would zero the rule (every doc failing rule 7 makes
    * `n_keep` a degenerate 0=0 check). Sorted so the oracle inlines the
    * identical list.
    */
  private lazy val gopherBatteryStopwords: Seq[String] =
    (graft.operators.QualityFilters.GopherStopwords ++
      graft.functions.TextFunctions.langStopwords.values.flatten).distinct.sorted

  /** DuckDB twin of [[graft.operators.QualityFilters.gopherSignals]] over
    * the salted battery corpus (same thresholds, same explicit ASCII
    * classes, same exact-integer ratio scaling, stopword list inlined from
    * the same Scala source).
    */
  private def gopherOracleSql: String =
    s"""WITH salted AS (
      |  SELECT lang,
      |         CASE WHEN doc_id % 3 = 0
      |              THEN text || chr(10) || chr(8226) || ' item one' || chr(10) || '- item two' || chr(10) || 'trailing...'
      |              ELSE text END AS t
      |  FROM documents),
      |base AS (
      |  SELECT lang, t,
      |         regexp_split_to_array(trim(t), '\\s+') AS toks,
      |         string_split(t, chr(10)) AS lines
      |  FROM salted),
      |sig AS (
      |  SELECT lang,
      |    len(toks) AS n_words,
      |    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
      |      / greatest(len(toks), 1) AS mwl,
      |    CAST((length(t) - length(replace(t, '#', '')))
      |       + (length(t) - length(replace(t, '...', ''))) / 3
      |       + (length(t) - length(replace(t, chr(8230), ''))) AS DOUBLE)
      |      / greatest(len(toks), 1) AS sym,
      |    CAST(len(list_filter(lines, l -> starts_with(ltrim(l), chr(8226))
      |           OR starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* '))) AS DOUBLE)
      |      / greatest(len(lines), 1) AS bullet,
      |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
      |           OR ends_with(rtrim(l), chr(8230)))) AS DOUBLE)
      |      / greatest(len(lines), 1) AS ellipsis,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      |      / greatest(len(toks), 1) AS alpha,
      |    len(list_filter([${gopherBatteryStopwords.map(w => s"'$w'").mkString(",")}],
      |          sw -> list_contains(list_transform(toks, x -> lower(x)), sw))) AS stop_types
      |  FROM base)
      |SELECT lang, count(*) AS n,
      |  CAST(sum(CASE WHEN n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
      |                 AND sym <= 0.1 AND bullet < 0.9 AND ellipsis < 0.3
      |                 AND alpha >= 0.8 AND stop_types >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(sum(n_words) AS BIGINT) AS sum_words,
      |  CAST(sum(CAST(round(round(mwl, 6) * 1e6) AS BIGINT)) AS BIGINT) AS s_mwl,
      |  CAST(sum(CAST(round(round(sym, 6) * 1e6) AS BIGINT)) AS BIGINT) AS s_sym,
      |  CAST(sum(CAST(round(round(bullet, 6) * 1e6) AS BIGINT)) AS BIGINT) AS s_bullet,
      |  CAST(sum(CAST(round(round(ellipsis, 6) * 1e6) AS BIGINT)) AS BIGINT) AS s_ellipsis,
      |  CAST(sum(CAST(round(round(alpha, 6) * 1e6) AS BIGINT)) AS BIGINT) AS s_alpha,
      |  CAST(sum(stop_types) AS BIGINT) AS s_stop
      |FROM sig GROUP BY lang""".stripMargin

  /** DuckDB twin of the DSIR pipeline (`ImportanceSampling`): bigrams over
    * the whitespace split, md5-hash buckets mod `buckets`, add-one smoothed
    * log-ratio of the 5%-target vs raw distributions, per-doc weighted sum;
    * gram-less raw documents score a neutral 0 (the `weights` CTE's left
    * join). Terminates at `weights(doc_id, logw)`.
    */
  private def dsirCtes(buckets: Int): String =
    s"""corpus AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(toks) - 1 <= 0 THEN CAST([] AS VARCHAR[])
       |    ELSE list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
       |      i -> array_to_string(list_slice(toks, i, i + 1), ' ')) END) AS g
       |  FROM corpus),
       |gb AS (
       |  SELECT doc_id,
       |         (CAST((md5_number_lower(g) >> 4) AS BIGINT) % $buckets) AS bucket
       |  FROM grams),
       |tcnt AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 20 = 0 GROUP BY bucket),
       |rcnt AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 20 <> 0 GROUP BY bucket),
       |tot AS (SELECT
       |  CAST((SELECT coalesce(sum(cnt), 0) FROM tcnt) + $buckets AS DOUBLE) AS tt,
       |  CAST((SELECT coalesce(sum(cnt), 0) FROM rcnt) + $buckets AS DOUBLE) AS tr),
       |ratio AS (
       |  SELECT coalesce(t.bucket, r.bucket) AS bucket,
       |         ln(coalesce(t.cnt, 0) + 1.0) - ln((SELECT tt FROM tot))
       |         - ln(coalesce(r.cnt, 0) + 1.0) + ln((SELECT tr FROM tot)) AS lr
       |  FROM tcnt t FULL OUTER JOIN rcnt r ON t.bucket = r.bucket),
       |dtf AS (
       |  SELECT doc_id, bucket, count(*) AS tf FROM gb
       |  WHERE doc_id % 20 <> 0 GROUP BY doc_id, bucket),
       |scored AS (
       |  SELECT d.doc_id,
       |         sum(d.tf * coalesce(rt.lr,
       |           -ln((SELECT tt FROM tot)) + ln((SELECT tr FROM tot)))) AS logw
       |  FROM dtf d LEFT JOIN ratio rt USING (bucket) GROUP BY d.doc_id),
       |weights AS (
       |  SELECT a.doc_id, coalesce(s.logw, 0.0) AS logw
       |  FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) a
       |  LEFT JOIN scored s USING (doc_id))""".stripMargin
}
