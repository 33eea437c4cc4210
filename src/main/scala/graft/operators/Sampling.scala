package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling and splitting for training-data
  * pipelines.
  *
  * `df.sample()` draws from a seeded RNG stream, so membership depends on
  * partitioning and row order — re-running after a repartition (or on a
  * different cluster size) yields a different subset. Hash-based membership
  * (`hash(id) mod N < threshold`) is the scale-correct alternative: every
  * row decides its own fate from its key alone, so samples and train/val/
  * test splits are reproducible across runs, engines, and topology changes,
  * and a document never migrates between splits when the corpus grows.
  */
object Sampling {

  /** Buckets per unit of probability: thresholds are expressed in 1/10000ths. */
  val Buckets = 10000

  private def bucket(idCol: Column, hashFn: Column => Column): Column =
    pmod(hashFn(idCol), lit(Buckets))

  /** Keep ~`fraction` of rows, membership decided by the id hash alone. */
  def sampleByHash(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.filter(bucket(col(idCol), hashFn) < lit(math.round(fraction * Buckets)))
  }

  /** Rebalance a corpus toward target mixture ratios: keep a per-key
    * fraction of rows (downsample overrepresented sources), membership
    * again decided by the id hash alone. Keys absent from `fractions` are
    * kept whole.
    */
  def rebalance(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0,1]")
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(Buckets.toLong)) {
      case (rest, (k, f)) =>
        when(col(keyCol) === k, lit(math.round(f * Buckets))).otherwise(rest)
    }
    df.filter(bucket(col(idCol), hashFn) < threshold)
  }

  /** Assign every row to exactly one named split by cumulative hash-bucket
    * ranges — disjoint and exhaustive by construction (weights normalize and
    * the last split absorbs rounding).
    *
    * @param weights ordered (name, weight) pairs, e.g.
    *                `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`
    */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)],
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cumulative = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val thresholds = cumulative.map(c => math.round(c * Buckets))
    val b = bucket(col(idCol), hashFn)
    val assigned = weights.map(_._1).zip(thresholds).foldRight(lit(weights.last._1)) {
      case ((name, thr), rest) => when(b < lit(thr), lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** Leakage-safe split assignment: near-duplicate documents must land in
    * the SAME split — a near-dup of a test document sitting in train is
    * train/eval contamination that survives ordinary decontamination
    * (which only guards against the eval BENCHMARK, not the held-out
    * slice of the corpus itself). Rows are assigned by their near-dup
    * CLUSTER's canonical id instead of their own: connected components
    * over the candidate pairs label every clustered id with its
    * component's minimum id; unclustered rows group as themselves. The
    * split decision is then the same cumulative hash-bucket rule as
    * [[assignSplits]] applied to the group id, so every member of a
    * cluster lands together by construction.
    *
    * Scale shape: components runs over candidate PAIRS (already banded and
    * skew-capped upstream — never all-pairs); the component table holds
    * only clustered ids (a small fraction of any real corpus), so the
    * join-back broadcasts under AQE at typical duplication rates; the
    * split decision itself stays a per-row hash with no corpus shuffle.
    *
    * @param pairs near-dup candidate pairs (`id_a`, `id_b`) from any
    *              generator — MinHash-LSH, SimHash, semantic cells
    * @param star  cluster via the large-star/small-star variant
    *              (O(log diameter) rounds) instead of min-label propagation
    * @return df plus `split_group` (the cluster canonical / own id) and
    *         `split` columns
    */
  def leakageSafeSplits(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      weights: Seq[(String, Double)],
      hashFn: Column => Column = Dedup.xxBaseHash,
      star: Boolean = false
  ): DataFrame = {
    val comps = (if (star) Dedup.componentsStar(pairs) else Dedup.components(pairs))
      .withColumnRenamed("id", idCol)
    val grouped = df.join(comps, Seq(idCol), "left")
      .withColumn("split_group", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    assignSplits(grouped, "split_group", weights, hashFn)
  }

  /** Temperature-based mixture sampling — the standard multilingual /
    * multi-source rebalancing rule (XLM-R-style): resample so the corpus
    * mixture follows `share_s^alpha` instead of the raw share. `alpha < 1`
    * flattens the mixture (upweights low-resource sources relative to their
    * natural share); `alpha = 1` is a no-op; downsampling only (no source's
    * keep-fraction exceeds 1 — the scarcest-per-target source is kept whole
    * and everything else downsamples toward the tempered mixture).
    *
    * Keep-fractions derive from per-source counts: `w_s = (n_s/N)^alpha`,
    * `f_s = min_j(n_j/w_j) · w_s / n_s` — the normalizing constant cancels,
    * which also keeps the arithmetic a chain of individually-rounded IEEE
    * ops (no cross-source float sum), so an external SQL engine replays the
    * fractions bit-identically. Membership is then the same hash-bucket
    * rule as [[rebalance]]: content-stable, topology-free, reproducible.
    *
    * Scale shape: one map-side-combined count per source (k rows to the
    * driver, k = #sources) + a scan with a per-row hash filter — no shuffle
    * of the corpus itself.
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      alpha: Double,
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("ns"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val total = counts.map(_._2).sum.toDouble
    def pow(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha) // sqrt is IEEE-exact
    val w = counts.map { case (k, ns) => (k, ns, pow(ns.toDouble / total)) }
    val c = w.map { case (_, ns, ws) => ns.toDouble / ws }.min
    val fractions = w.map { case (k, ns, ws) => k -> c * ws / ns.toDouble }.toMap
    rebalance(df, idCol, keyCol, fractions, hashFn)
  }

  /** Sequence packing — assign documents to fixed-token-budget training
    * bins the way pretraining data is actually packed: concatenate in a
    * deterministic order (by `idCol` within each `keyCol` stream) and cut
    * every `targetTokens`; a document's bin is the context window its first
    * token lands in (`floor(running_prefix / target)`). Deterministic,
    * rebuild-stable, and exactly replayable by a SQL window oracle.
    *
    * Scale shape: one shuffle on `keyCol` + an ordered window per stream —
    * the sort-based packing every published pipeline uses. Streams are the
    * parallelism unit; pick `keyCol` (source, shard, ...) so no single
    * stream dominates.
    *
    * @return df plus a `bin` column (0-based window index within the key)
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      keyCol: String,
      targetTokens: Int
  ): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("bin",
      floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)).cast("double") / targetTokens)
        .cast("long"))
  }

  /** Deterministic sample of exactly `k` rows per group (inspection sets,
    * per-source eval slices, few-shot pools): rank rows inside each group
    * by the id hash — salted so different draws are independent — and keep
    * the first `k`. Groups with fewer than `k` rows are kept whole.
    *
    * Scale shape: the `row_number <= k` filter compiles to
    * WindowGroupLimit, which truncates each group to `k` rows map-side
    * BEFORE the exchange, so the shuffle carries at most `k` rows per
    * group per input partition — never the corpus. The id tiebreak makes
    * the draw total-ordered and therefore reproducible across topology.
    */
  def sampleKPerGroup(
      df: DataFrame,
      idCol: String,
      groupCols: Seq[String],
      k: Int,
      salt: String = "",
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val h = hashFn(concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(h.asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  /** Token-budget cut per source — the "give me N tokens of source X"
    * primitive of training-mixture construction: documents are ordered by a
    * salted hash (a reproducible, selection-bias-free shuffle order) and
    * the prefix whose cumulative `tokensCol` fits `budgetTokens` is kept,
    * independently per source.
    *
    * Semantically this is ONE running-sum window per source — but a
    * per-source window is a single sequential task, the thing a 10 TB
    * source cannot afford. The implementation decomposes it: rows land in
    * 4096 ORDER-PRESERVING hash-range buckets, bucket token totals get the
    * running sum (a 4096-row window per source), full buckets below the
    * boundary pass wholesale, buckets beyond it drop wholesale, and the
    * row-level window runs only INSIDE the one boundary bucket (~1/4096 of
    * the source). Result is row-identical to the naive global window —
    * bucketing is monotone in the hash, so the global prefix IS the bucket
    * prefix plus the boundary-bucket prefix (SamplingSpec pins equality;
    * the `ta_token_budget_take` oracle replays the naive form).
    *
    * @param hashFn non-negative ordering hash; bucket = hash div 2⁴⁸ —
    *        4096 buckets for the 60-bit oracle hash ([[Dedup.md5Lower60]]),
    *        32768 for the default 63-bit [[Dedup.xxBaseHash]] (either way a
    *        small, order-preserving decomposition)
    */
  def takeTokenBudget(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      sourceCol: String,
      budgetTokens: Long,
      salt: String = "",
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    takeBudgetImpl(df, idCol, tokensCol, sourceCol, _ => lit(budgetTokens), salt, hashFn)
  }

  /** [[takeTokenBudget]] with a PER-SOURCE budget map — the real mixture
    * primitive: "N_s tokens of source s" with differing N_s (e.g. 3×
    * Wikipedia epochs vs 0.5 of CommonCrawl in published mixtures). Sources
    * absent from the map get `defaultBudget` (0 = drop them — the safe
    * default for an explicit mixture spec). The map rides the plan as a
    * literal (mixtures have tens of sources, never corpus-sized), so no
    * join is added over the single-budget form.
    */
  def takeTokenBudgets(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      sourceCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L,
      salt: String = "",
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    budgets.foreach { case (s, b) => require(b >= 0, s"budget for '$s' must be >= 0, got $b") }
    require(defaultBudget >= 0, s"defaultBudget must be >= 0, got $defaultBudget")
    val budgetOf: Column => Column =
      if (budgets.isEmpty) _ => lit(defaultBudget)
      else s => coalesce(element_at(typedLit(budgets), s), lit(defaultBudget))
    takeBudgetImpl(df, idCol, tokensCol, sourceCol, budgetOf, salt, hashFn)
  }

  /** One-call mixture construction — the form published pipelines actually
    * specify: per-source WEIGHTS plus a TOTAL token budget ("half web, a
    * quarter code, a quarter books into an N-token mix"). Each source's
    * budget is `min(available_s, round(w_s/Σw · total))` — the weight
    * share, capped at what the source can supply — and the cut is the
    * bucket-decomposed [[takeTokenBudgets]] prefix. Sources absent from
    * `weights` are dropped. Deliberately NO shortfall redistribution: if a
    * source cannot fill its share the mix under-fills rather than silently
    * shifting the requested ratios (redistribute by re-weighting
    * explicitly — implicit redistribution is how mixture bugs ship).
    *
    * Scale shape: one map-side-combined sum per source (k rows to the
    * driver, k = #sources — the [[temperatureMix]] discipline), then the
    * budget-map cut; the corpus itself is never collected or re-shuffled
    * beyond the single boundary-bucket window per source. Normalization
    * sums the weights in sorted-key order so the derived budgets are
    * deterministic across Map iteration orders.
    */
  def takeMixture(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      totalTokens: Long,
      salt: String = "",
      hashFn: Column => Column = Dedup.xxBaseHash
  ): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(w => w > 0 && !w.isNaN && !w.isInfinite),
      s"weights must be positive and finite, got $weights")
    require(totalTokens >= 0, s"totalTokens must be >= 0, got $totalTokens")
    val wsum = weights.toSeq.sortBy(_._1).map(_._2).sum
    val avail = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol))
      .agg(coalesce(sum(col(tokensCol)), lit(0L)).as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = weights.map { case (s, w) =>
      s -> math.min(avail.getOrElse(s, 0L), math.round(w / wsum * totalTokens))
    }
    takeTokenBudgets(df, idCol, tokensCol, sourceCol, budgets, 0L, salt, hashFn)
  }

  private def takeBudgetImpl(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      sourceCol: String,
      budgetOf: Column => Column,
      salt: String,
      hashFn: Column => Column
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val h = hashFn(concat(col(idCol).cast("string"), lit(":" + salt)))
    // _budget is a pure function of sourceCol, so it is constant within
    // every window/group below
    val rows = df.withColumn("_h", h)
      .withColumn("_b", expr("_h div 281474976710656")) // 2^48 → 4096 ordered buckets
      .withColumn("_budget", budgetOf(col(sourceCol)))
    val bucketCum = rows.groupBy(col(sourceCol), col("_b"))
      .agg(sum(col(tokensCol)).as("_bt"))
      .withColumn("_before", coalesce(
        sum(col("_bt")).over(w.partitionBy(col(sourceCol)).orderBy(col("_b"))
          .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
    val joined = rows.join(bucketCum, Seq(sourceCol, "_b"))
    val fullKeep = joined.filter(col("_before") + col("_bt") <= col("_budget"))
    // the boundary bucket: its running sum crosses the budget — row-level
    // prefix within it only
    val boundary = joined
      .filter(col("_before") < col("_budget") && col("_before") + col("_bt") > col("_budget"))
      .withColumn("_run", sum(col(tokensCol)).over(
        w.partitionBy(col(sourceCol), col("_b")).orderBy(col("_h").asc, col(idCol).asc)))
      .filter(col("_before") + col("_run") <= col("_budget"))
      .drop("_run")
    fullKeep.unionByName(boundary)
      .select(df.columns.map(col): _*) // joins moved key columns first; restore caller order
  }

  /** Deterministic global training-order shuffle ("epoch shuffle") into
    * `nShards` shards. Every row's position in the epoch is a pure function
    * of its id and the salt — `order_key = hash(id:salt)` — and its shard is
    * the top-bits range of that key, so `(shard asc, order_key asc)` IS the
    * global shuffled order and each shard holds one contiguous range of it.
    * Changing the salt ("epoch 0" → "epoch 1") yields an independent
    * permutation; re-running, repartitioning, or growing the cluster never
    * reorders an epoch — the property `df.orderBy(rand(seed))` famously
    * lacks (its RNG stream is positional, so the "same seed" reshuffles
    * whenever partitioning shifts).
    *
    * Scale shape: a per-row hash projection — NO exchange at all until the
    * caller materializes order (then exactly one hash exchange on `shard` +
    * a local sort in [[writeShuffleShards]]; never a global sort, and never
    * the sampling pass a range partitioner needs). Shard sizes are balanced
    * in expectation by hash uniformity.
    *
    * @param hashBits width of `hashFn`'s output domain ([[Dedup.xxBaseHash]]
    *                 spans 63 bits, [[Dedup.md5Lower60]] 60); shard ranges
    *                 divide `2^hashBits` evenly
    * @return df plus `order_key` (long) and `shard` (int) columns
    */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "epoch0",
      hashFn: Column => Column = Dedup.xxBaseHash,
      hashBits: Int = 63
  ): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(hashBits >= 1 && hashBits <= 63, s"hashBits must be in [1,63], got $hashBits")
    val span = BigInt(2).pow(hashBits)
    val q = ((span + nShards - 1) / nShards).toLong
    df.withColumn("order_key", hashFn(concat(col(idCol).cast("string"), lit(":" + salt))))
      .withColumn("shard", expr(s"order_key div ${q}L").cast("int"))
  }

  /** Materialize [[shuffleShards]] as training-shard files: parquet
    * partitioned by `shard`, every shard exactly ONE file whose row order is
    * the epoch order (readers stream shard 0..n-1 top to bottom and see the
    * full deterministic permutation). One hash exchange on `shard` + a
    * sort WITHIN each shard — no global sort. The id breaks order-key ties
    * so the layout is byte-stable across reruns.
    */
  def writeShuffleShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      path: String,
      salt: String = "epoch0",
      hashFn: Column => Column = Dedup.xxBaseHash,
      hashBits: Int = 63
  ): Unit =
    shuffleShards(df, idCol, nShards, salt, hashFn, hashBits)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("order_key"), col(idCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").parquet(path)

  /** Weighted sample WITHOUT replacement: the `n` rows with the largest
    * `ln(weight) + Gumbel(id)` key — selection probability ∝ weight (the
    * Gumbel-top-k identity), deterministic because the noise derives from
    * the id hash, not an RNG stream ([[ImportanceSampling.gumbelNoise]],
    * exposed corpus-generically — DSIR's `resample` is this with learned
    * importance weights). Plans as a TakeOrdered: per-partition heaps, a
    * driver merge of n rows, no global sort. Monotone in the weights under
    * a fixed salt: raising one row's weight can only keep it selected.
    * Rows with weight ≤ 0 or NaN can never be selected — NaN needs its own
    * guard because `NaN > 0` is true under Spark's NaN-greatest ordering,
    * and `log(NaN)+g = NaN` would sort AHEAD of every legitimate key.
    */
  def takeWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      salt: String = "wtake",
      idHashFn: Column => Column = graft.operators.Dedup.xxBaseHash
  ): DataFrame =
    df.filter(col(weightCol) > 0 && !isnan(col(weightCol)))
      .withColumn("_key",
        log(col(weightCol)) +
          ImportanceSampling.gumbelNoise(col(idCol), salt, idHashFn))
      .orderBy(col("_key").desc, col(idCol))
      .limit(n)
      .drop("_key")

  /** Length-bucketed batching — the dynamic-batching primitive every
    * tokenize-and-train (or batch-inference) loop needs: within each
    * source, rows sort by `(lenCol desc, idCol)` and chop into consecutive
    * batches of `batchSize`, so each batch holds near-equal lengths and
    * padding waste (`max_len × rows − Σ len`) collapses. Returns the input
    * plus a `batch_id` column; [[paddingStats]] reports the per-batch
    * waste the layout saves.
    *
    * Scale shape — the [[takeTokenBudget]] decomposition applied to
    * ranking: a whole-source `row_number` window is the 10 TB non-starter,
    * so the global rank is assembled from LENGTH-RANGE buckets
    * (`len div lenBucketWidth`): every row in a higher bucket sorts
    * strictly before every row in a lower one, so
    * `rank = (rows in higher buckets) + (rank within own bucket)` — the
    * bucket-offset table is tiny (sources × maxLen/width rows, window'd
    * driver-free), and the row window partitions by `(source, bucket)`,
    * never by source alone. Deterministic: ties break by id; the hash-free
    * ordering is fully replayable in SQL.
    */
  def lengthBatches(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int,
      sourceCol: String,
      lenBucketWidth: Int = 64
  ): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(lenBucketWidth > 0, s"lenBucketWidth must be positive, got $lenBucketWidth")
    val w = org.apache.spark.sql.expressions.Window
    val b = df.withColumn("_slb", expr(s"CAST($lenCol AS BIGINT) div $lenBucketWidth"))
    // bucket-count table: ≤ sources × (maxLen/width) rows — the only
    // cross-bucket pass, and it moves counts, not rows
    val offsets = b.groupBy(col(sourceCol), col("_slb"))
      .agg(count(lit(1)).as("_sn"))
      .withColumn("_soff",
        coalesce(sum(col("_sn")).over(
          w.partitionBy(col(sourceCol)).orderBy(col("_slb").desc)
            .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .drop("_sn")
    b.join(offsets, Seq(sourceCol, "_slb"))
      .withColumn("_srn",
        row_number().over(w.partitionBy(col(sourceCol), col("_slb"))
          .orderBy(col(lenCol).desc, col(idCol))))
      .withColumn("batch_id", expr(s"(_soff + _srn - 1) div $batchSize"))
      .drop("_slb", "_soff", "_srn")
  }

  /** Per-batch padding report over a [[lengthBatches]] result: rows, the
    * batch's max length (= its padded width), total payload, and the waste
    * `max×rows − Σ len` a fixed-width batch would pad.
    */
  def paddingStats(batched: DataFrame, lenCol: String, sourceCol: String): DataFrame =
    batched.groupBy(col(sourceCol), col("batch_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col(lenCol)).cast("long").as("max_len"),
        sum(col(lenCol)).cast("long").as("sum_len"))
      .withColumn("padding", col("max_len") * col("n_rows") - col("sum_len"))
}
