package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{AsOfJoin, CountMin, EventWindows, RangeJoin}

/** Event-table battery: CDC-style status filters (F1-F3 semantics), JSON
  * codec (C15), timestamp formatting (C14), and the event-time window
  * extensions (tumbling / sliding / session).
  */
object EventQueries {

  val all: Map[String, Q] = Map(

    // F1: status ∈ {added, modified} — CDC changed-set semantics.
    "f1_changed_set" -> Q(
      (s, d) =>
        events(s, d).filter(col("event_type").isin("click", "view"))
          .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, count(*) AS n FROM events
             |WHERE event_type IN ('click','view') GROUP BY event_type""".stripMargin),
      Seq("F1")
    ),

    // F2: status ≠ removed — live set.
    "f2_live_set" -> Q(
      (s, d) =>
        events(s, d).filter(col("event_type") =!= "error")
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")),
      Some("""SELECT event_type, count(*) AS n, round(sum(value),2) AS sum_value FROM events
             |WHERE event_type <> 'error' GROUP BY event_type""".stripMargin),
      Seq("F2")
    ),

    // F3: tombstones, per key.
    "f3_tombstones" -> Q(
      (s, d) =>
        events(s, d).filter(col("event_type") === "error")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_errors")),
      Some("""SELECT user_id, count(*) AS n_errors FROM events
             |WHERE event_type = 'error' GROUP BY user_id""".stripMargin),
      Seq("F3")
    ),

    // A2/A3: counts and distinct keys per status.
    "a2_a3_status_counts" -> Q(
      (s, d) =>
        events(s, d).groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            round(sum(col("value")), 2).as("sum_value")
          ),
      Some("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
             |round(sum(value),2) AS sum_value FROM events GROUP BY event_type""".stripMargin),
      Seq("A2", "A3")
    ),

    // J4: failed-retry — keys whose LAST event is a failure re-enter.
    "j4_failed_retry" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") === "error")
          .select(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id FROM (
             |  SELECT user_id, event_id, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1 AND event_type = 'error'""".stripMargin),
      Seq("J4")
    ),

    // C14: ISO timestamp formatting at the JSON boundary.
    "c14_iso_format" -> Q(
      (s, d) =>
        events(s, d).groupBy(col("event_type"))
          .agg(
            date_format(min(col("ts")), "yyyy-MM-dd'T'HH:mm:ss").as("first_at"),
            date_format(max(col("ts")), "yyyy-MM-dd'T'HH:mm:ss").as("last_at")
          ),
      Some("""SELECT event_type, strftime(min(ts), '%Y-%m-%dT%H:%M:%S') AS first_at,
             |strftime(max(ts), '%Y-%m-%dT%H:%M:%S') AS last_at
             |FROM events GROUP BY event_type""".stripMargin),
      Seq("C14")
    ),

    // C15: JSON row codec — extract a field from the props JSON column.
    "c15_json_extract" -> Q(
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_with_k")),
      Some("""SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
             |FROM events GROUP BY event_type""".stripMargin),
      Seq("C15")
    ),

    // Tumbling 1-hour windows.
    "w_tumbling_hourly" -> Q(
      (s, d) =>
        EventWindows.tumbling(events(s, d), "ts", "1 hour", Seq("event_type")),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
             |count(*) AS n, round(sum(value),2) AS sum_value
             |FROM events GROUP BY wstart, event_type""".stripMargin),
      Seq("A2")
    ),

    // Sliding 1-hour windows every 30 minutes (each event in 2 windows).
    "w_sliding_1h_30m" -> Q(
      (s, d) =>
        EventWindows.sliding(events(s, d), "ts", "1 hour", "30 minutes", Seq("event_type")),
      Some("""SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS wstart,
             |event_type, count(*) AS n, round(sum(value),2) AS sum_value
             |FROM events CROSS JOIN (VALUES (0),(1)) AS t(k)
             |GROUP BY wstart, event_type""".stripMargin),
      Seq("A2")
    ),

    // As-of join: every click joined to the user's latest prior (or
    // equal-time) view state. Spark has no native as-of join; the operator
    // is the sort-based union+window form (one shuffle, no range
    // cross-product), oracled against DuckDB's native ASOF LEFT JOIN. The
    // view side is pre-aggregated to one row per (user, ts) so the match
    // is tie-free on both engines.
    "j_asof_state" -> Q(
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("state_id"), max(col("value")).as("state_value"))
        AsOfJoin.asOf(clicks, views, Seq("user_id"), "ts", "ts",
            Seq("state_id", "state_value"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_clicks"),
            count(col("asof_state_id")).as("n_matched"),
            sum(col("asof_state_id")).as("sum_state_ids"),
            round(sum(col("asof_state_value")), 2).as("sum_state_value"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
             |views AS (
             |  SELECT user_id, ts, max(event_id) AS state_id, max(value) AS state_value
             |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |j AS (
             |  SELECT c.user_id, v.state_id, v.state_value
             |  FROM clicks c ASOF LEFT JOIN views v
             |    ON c.user_id = v.user_id AND c.ts >= v.ts)
             |SELECT user_id, count(*) AS n_clicks, count(state_id) AS n_matched,
             |       CAST(sum(state_id) AS BIGINT) AS sum_state_ids,
             |       round(sum(state_value), 2) AS sum_state_value
             |FROM j GROUP BY user_id""".stripMargin),
      Seq("J1", "W2")
    ),

    // Range join, point-in-interval: attribute every non-error event to the
    // same user's 10-minute incident windows (one window per error event).
    // The operator buckets the time axis and equi-joins on (bucket, user) —
    // a bare BETWEEN join with no equality conjunct would plan as a
    // BroadcastNestedLoopJoin. Oracle is DuckDB's native range-predicate
    // join; the residual filter makes the bucketing invisible to results.
    "j_range_attrib" -> Q(
      (s, d) => {
        val ev = events(s, d)
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        val incidents = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("incident_id"), col("user_id"),
            col("us").as("lo"), (col("us") + lit(600000000L)).as("hi"))
        val points = ev.filter(col("event_type") =!= "error")
          .select(col("event_id"), col("user_id"), col("us").as("p"), col("value"))
        RangeJoin.pointInInterval(points, incidents, "p", "lo", "hi",
            keys = Seq("user_id"), bucketWidth = 600000000L)
          .groupBy(col("incident_id"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("event_id")).as("sum_event_ids"),
            round(sum(col("value")), 2).as("sum_value"))
      },
      Some("""WITH inc AS (
             |  SELECT event_id AS incident_id, user_id, epoch_us(ts) AS lo,
             |         epoch_us(ts) + 600000000 AS hi
             |  FROM events WHERE event_type = 'error'),
             |pts AS (
             |  SELECT event_id, user_id AS puser, epoch_us(ts) AS p, value
             |  FROM events WHERE event_type <> 'error')
             |SELECT incident_id, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS sum_event_ids,
             |       round(sum(value), 2) AS sum_value
             |FROM pts JOIN inc ON puser = inc.user_id AND p BETWEEN lo AND hi
             |GROUP BY incident_id""".stripMargin),
      Seq("J1")
    ),

    // Range join, interval overlap: per user, error windows [t, t+10m]
    // overlapping purchase windows [t-5m, t+5m]. Both sides explode to
    // bucket spans; each overlapping pair is claimed exactly once (in the
    // bucket of greatest(lo_l, lo_r)) — the oracle's plain overlap join
    // pins that the dedup-by-claim-bucket emits no duplicates.
    "j_range_overlap" -> Q(
      (s, d) => {
        val ev = events(s, d)
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        val errWin = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"),
            col("us").as("err_lo"), (col("us") + lit(600000000L)).as("err_hi"))
        val buyWin = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("user_id"),
            (col("us") - lit(300000000L)).as("buy_lo"), (col("us") + lit(300000000L)).as("buy_hi"))
        RangeJoin.overlap(errWin, buyWin, "err_lo", "err_hi", "buy_lo", "buy_hi",
            keys = Seq("user_id"), bucketWidth = 600000000L)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_pairs"),
            sum(col("err_id")).as("sum_err_ids"),
            sum(col("buy_id")).as("sum_buy_ids"))
      },
      Some("""WITH ew AS (
             |  SELECT event_id AS err_id, user_id, epoch_us(ts) AS err_lo,
             |         epoch_us(ts) + 600000000 AS err_hi
             |  FROM events WHERE event_type = 'error'),
             |bw AS (
             |  SELECT event_id AS buy_id, user_id AS buser, epoch_us(ts) - 300000000 AS buy_lo,
             |         epoch_us(ts) + 300000000 AS buy_hi
             |  FROM events WHERE event_type = 'purchase')
             |SELECT user_id, count(*) AS n_pairs,
             |       CAST(sum(err_id) AS BIGINT) AS sum_err_ids,
             |       CAST(sum(buy_id) AS BIGINT) AS sum_buy_ids
             |FROM ew JOIN bw ON user_id = buser
             |  AND err_lo <= buy_hi AND buy_lo <= err_hi
             |GROUP BY user_id""".stripMargin),
      Seq("J1")
    ),

    // Session windows: 30-minute inactivity gap per user.
    "w_session_gap" -> Q(
      (s, d) =>
        EventWindows.sessionCounts(events(s, d), "ts", "user_id", 1800L),
      Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
             |  SELECT user_id,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events) GROUP BY user_id""".stripMargin),
      Seq("A2")
    ),

    // W-series: Spark's NATIVE session_window aggregation (batch form) —
    // the built-in the hand-rolled gaps-and-islands twin (w_session_gap)
    // re-derives. Session semantics: a window extends while the next event
    // arrives STRICTLY BEFORE last_ts + gap, so the island boundary is
    // diff >= gap (vs > gap in w_session_gap) — the oracle replays exactly
    // that. Aggregated per user so timestamps never reach the compare.
    "w_session_window_native" -> Q(
      (s, d) =>
        events(s, d)
          .groupBy(col("user_id"),
            expr("session_window(ts, '30 minutes')").as("sw"))
          .agg(count(lit(1)).as("n_in_session"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_sessions"),
            sum(col("n_in_session")).as("n_events"),
            max(col("n_in_session")).as("max_session_events")),
      Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
             |       count(*) AS n_events,
             |       CAST(max(sz) AS BIGINT) AS max_session_events
             |FROM (
             |  SELECT user_id, new_session,
             |         count(*) OVER (PARTITION BY user_id, island) AS sz
             |  FROM (
             |    SELECT user_id, new_session,
             |           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |                                  ROWS UNBOUNDED PRECEDING) AS island
             |    FROM (
             |      SELECT user_id, ts,
             |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |               OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
             |             THEN 1 ELSE 0 END AS new_session
             |      FROM events)))
             |GROUP BY user_id""".stripMargin),
      Seq("A2", "W1")
    ),

    // W-series: trailing 1-hour rolling count/sum per user (RANGE frame on
    // epoch seconds — peers at the same second included, the ANSI frame
    // semantics both engines share). Summed over event_id so the rolling
    // sum is exact integer arithmetic; the outer aggregate keeps the result
    // compact and order-free.
    "w_rolling_1h" -> Q(
      (s, d) =>
        EventWindows.rollingTrailing(events(s, d), "ts", "user_id", "event_id", 3600L)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n"),
            max(col("roll_n")).as("max_roll_n"),
            sum(col("roll_sum")).as("sum_roll_sum")),
      Some("""SELECT user_id, count(*) AS n,
             |       CAST(max(roll_n) AS BIGINT) AS max_roll_n,
             |       CAST(sum(roll_sum) AS BIGINT) AS sum_roll_sum FROM (
             |  SELECT user_id,
             |         count(*) OVER w AS roll_n,
             |         sum(event_id) OVER w AS roll_sum
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT)
             |               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
             |GROUP BY user_id""".stripMargin),
      Seq("W2", "A2")
    ),

    // W-series: the ranking-function family (row_number / dense_rank /
    // ntile / lag) in one pass — event_id is unique, so every ordering is
    // total and all outputs are exact integers.
    "w_rank_funcs" -> Q(
      (s, d) => {
        val byType = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        val byUser = Window.partitionBy(col("event_type")).orderBy(col("user_id"), col("event_id"))
        events(s, d)
          .withColumn("rn", row_number().over(byType))
          .withColumn("nt", ntile(4).over(byType))
          .withColumn("dr", dense_rank().over(byUser))
          .withColumn("gap", col("event_id") - coalesce(lag(col("event_id"), 1).over(byType), lit(0L)))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("nt")).as("sum_ntile"),
            max(col("dr")).as("max_dense_rank"),
            sum(col("gap")).as("sum_gaps"),
            sum(col("rn") * col("user_id")).as("rank_dot"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(sum(nt) AS BIGINT) AS sum_ntile,
             |       CAST(max(dr) AS BIGINT) AS max_dense_rank,
             |       CAST(sum(gap) AS BIGINT) AS sum_gaps,
             |       CAST(sum(rn * user_id) AS BIGINT) AS rank_dot FROM (
             |  SELECT event_type, user_id,
             |         row_number() OVER w AS rn,
             |         ntile(4) OVER w AS nt,
             |         dense_rank() OVER (PARTITION BY event_type ORDER BY user_id, event_id) AS dr,
             |         event_id - COALESCE(lag(event_id, 1) OVER w, 0) AS gap
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id))
             |GROUP BY event_type""".stripMargin),
      Seq("W2", "A2")
    ),

    // W-series completion: the analytic-function family — percent_rank /
    // cume_dist (rationals, rounded at 6dp) and first_value / last_value /
    // nth_value over an explicit full frame (ANSI default frame for
    // last_value stops at CURRENT ROW — pinned UNBOUNDED on both sides so
    // the value is the partition's, not the row's).
    "w_analytic_funcs" -> Q(
      (s, d) => {
        val byType = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        val full = byType.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        events(s, d)
          .withColumn("pr", percent_rank().over(byType))
          .withColumn("cd", cume_dist().over(byType))
          .withColumn("fv", first_value(col("user_id")).over(byType))
          .withColumn("lv", last_value(col("user_id")).over(full))
          .withColumn("nv", nth_value(col("user_id"), 3).over(full))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("pr")), 6).as("sum_pct_rank"),
            round(sum(col("cd")), 6).as("sum_cume_dist"),
            max(col("fv")).as("first_user"),
            max(col("lv")).as("last_user"),
            max(col("nv")).as("third_user"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |       round(sum(pr), 6) AS sum_pct_rank,
             |       round(sum(cd), 6) AS sum_cume_dist,
             |       CAST(max(fv) AS BIGINT) AS first_user,
             |       CAST(max(lv) AS BIGINT) AS last_user,
             |       CAST(max(nv) AS BIGINT) AS third_user FROM (
             |  SELECT event_type,
             |         percent_rank() OVER w AS pr,
             |         cume_dist() OVER w AS cd,
             |         first_value(user_id) OVER w AS fv,
             |         last_value(user_id) OVER wf AS lv,
             |         nth_value(user_id, 3) OVER wf AS nv
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id),
             |         wf AS (PARTITION BY event_type ORDER BY event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             |GROUP BY event_type""".stripMargin),
      Seq("W2", "A2")
    ),

    // C14-series breadth: the datetime extraction family — date_trunc to
    // the hour, day-of-week, hour-of-day — as grouping keys. Integer
    // outputs; ISO dow (Monday=1) is computed the same way on both sides.
    "c_datetime_funcs" -> Q(
      (s, d) =>
        events(s, d)
          .groupBy(
            dayofweek(col("ts")).as("dow"),
            hour(col("ts")).as("hod"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users")),
      Some("""SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow, CAST(hour(ts) AS INT) AS hod,
             |       count(*) AS n, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1, 2""".stripMargin),
      Seq("C14", "A2")
    ),

    // A-series: exact interpolated quantiles (percentile, not the sketch) of
    // an integer column per event type — both engines compute the same
    // rational midpoints, so the doubles match bit-for-bit.
    "a_median_exact" -> Q(
      (s, d) =>
        events(s, d)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            expr("percentile(user_id, 0.5)").as("med_user"),
            expr("percentile(user_id, 0.25)").as("p25_user"),
            expr("percentile(user_id, 0.75)").as("p75_user")),
      Some("""SELECT event_type, count(*) AS n,
             |       quantile_cont(user_id, 0.5) AS med_user,
             |       quantile_cont(user_id, 0.25) AS p25_user,
             |       quantile_cont(user_id, 0.75) AS p75_user
             |FROM events GROUP BY event_type""".stripMargin),
      Seq("A2")
    ),

    // C-series: VARIANT shredding (Spark 4 semi-structured path) —
    // parse_json once into the binary VARIANT encoding, typed field
    // extraction via variant_get, then a plain relational aggregate. At
    // 100 TB this is the schema-on-read discipline for ragged metadata
    // columns: the VARIANT decode is per-row codegen work, no UDF, and the
    // aggregate behind it shuffles longs, never JSON text.
    "c_variant_shred" -> Q(
      (s, d) =>
        events(s, d)
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k")),
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
             |       CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
             |FROM events GROUP BY event_type""".stripMargin),
      Seq("C15")
    ),

    // A-series: deterministic MODE per group — most frequent event type per
    // user, ties broken toward the smallest value (mode(expr, true)); the
    // oracle replays the argmax with the same tie order through a window.
    "a_mode_per_user" -> Q(
      (s, d) =>
        events(s, d)
          .groupBy(col("user_id"))
          .agg(expr("mode(event_type, true)").as("mode_et"),
            count(lit(1)).as("n")),
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*) AS cnt
             |  FROM events GROUP BY user_id, event_type),
             |r AS (
             |  SELECT user_id, event_type,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY cnt DESC, event_type) AS rn
             |  FROM c)
             |SELECT r.user_id, r.event_type AS mode_et, t.n
             |FROM r JOIN (SELECT user_id, count(*) AS n FROM events GROUP BY user_id) t
             |  USING (user_id)
             |WHERE r.rn = 1""".stripMargin),
      Seq("A2", "L2")
    ),

    // A-series: HLL sketches built PER SHARD and merged — the at-scale
    // distinct-count discipline: at 100 TB each ingest shard aggregates its
    // own fixed-size sketch and only sketches travel to the final union
    // (report-time merge), never re-reading rows. merge_agrees pins the
    // mergeability law: the shard-union estimate tracks the single-pass
    // sketch within 2% (exact equality holds only while both stay in
    // sparse mode — the union promotes to dense HLL_8 at higher
    // cardinality, measured at sf0.1: 1488 vs 1499 on 1500 exact).
    // est_in_bound is the HLL accuracy envelope vs the exact count (the
    // ta_approx_stats convention: DuckDB asserts the booleans).
    "a_hll_shard_merge" -> Q(
      (s, d) => {
        val ev = events(s, d)
        val shards = ev.withColumn("shard", pmod(col("event_id"), lit(16)))
          .groupBy(col("shard"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val merged = shards.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val direct = ev.agg(
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("dest"),
          countDistinct(col("user_id")).as("n_exact"))
        merged.crossJoin(direct).select(
          col("n_exact"),
          (abs(col("est") - col("dest"))
            <= greatest(lit(1.0), col("dest") * 0.02)).as("merge_agrees"),
          (abs(col("est") - col("n_exact"))
            <= greatest(lit(1.0), col("n_exact") * 0.05)).as("est_in_bound"))
      },
      Some("""SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
             |       TRUE AS merge_agrees, TRUE AS est_in_bound
             |FROM events""".stripMargin),
      Seq("A3", "A2")
    ),

    // A-series: KLL quantile sketches built PER SHARD and merged — the
    // third mergeable-sketch discipline (after HLL distinct-count and
    // frequent-items top-k): percentile telemetry at 100 TB is per-shard
    // fixed-size sketches + a report-time merge, never a global sort.
    // n_sketch == count(*) is EXACT (KLL tracks n losslessly — a dropped
    // or double-merged shard breaks equality). The rank envelope is the
    // KLL guarantee: the merged estimate at rank p must sit within ±3% of
    // p in the TRUE empirical CDF (k=200 ⇒ ε≈1.65%, asserted with slack);
    // merge_agrees pins mergeability — merged-vs-single-pass ranks within
    // 2% of each other at every probed quantile.
    "a_kll_shard_quantiles" -> Q(
      (s, d) => {
        val x = documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("double").as("x"))
        // kll_sketch_merge_double is a BINARY merge (unlike hll_union_agg),
        // so report time folds the 16 fixed-size shard buffers — one row,
        // never corpus data
        val sketches = x.withColumn("shard", pmod(col("doc_id"), lit(16)))
          .groupBy(col("shard"))
          .agg(expr("kll_sketch_agg_double(x)").as("sk"))
          .agg(collect_list(col("sk")).as("sks"))
          .select(expr(
            "aggregate(slice(sks, 2, size(sks) - 1), sks[0], (a, b) -> kll_sketch_merge_double(a, b))")
            .as("msk"))
          .crossJoin(x.agg(expr("kll_sketch_agg_double(x)").as("dsk")))
          .select(
            expr("kll_sketch_get_n_double(msk)").as("n_sketch"),
            expr("kll_sketch_get_quantile_double(msk, 0.5)").as("q50"),
            expr("kll_sketch_get_quantile_double(msk, 0.9)").as("q90"),
            expr("kll_sketch_get_quantile_double(msk, 0.99)").as("q99"),
            expr("kll_sketch_get_quantile_double(dsk, 0.5)").as("d50"),
            expr("kll_sketch_get_quantile_double(dsk, 0.9)").as("d90"),
            expr("kll_sketch_get_quantile_double(dsk, 0.99)").as("d99"))
        val ranks = sketches.crossJoin(x).agg(
          first(col("n_sketch")).as("n_sketch"),
          (sum(when(col("x") <= col("q50"), 1L).otherwise(0L)) / count(lit(1))).as("r50"),
          (sum(when(col("x") <= col("q90"), 1L).otherwise(0L)) / count(lit(1))).as("r90"),
          (sum(when(col("x") <= col("q99"), 1L).otherwise(0L)) / count(lit(1))).as("r99"),
          (sum(when(col("x") <= col("d50"), 1L).otherwise(0L)) / count(lit(1))).as("s50"),
          (sum(when(col("x") <= col("d90"), 1L).otherwise(0L)) / count(lit(1))).as("s90"),
          (sum(when(col("x") <= col("d99"), 1L).otherwise(0L)) / count(lit(1))).as("s99"))
        ranks.select(
          col("n_sketch"),
          (abs(col("r50") - 0.5) <= 0.03).as("p50_in_bound"),
          (abs(col("r90") - 0.9) <= 0.03).as("p90_in_bound"),
          (abs(col("r99") - 0.99) <= 0.03).as("p99_in_bound"),
          (greatest(
            abs(col("r50") - col("s50")),
            abs(col("r90") - col("s90")),
            abs(col("r99") - col("s99"))) <= 0.02).as("merge_agrees"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_sketch,
             |       TRUE AS p50_in_bound, TRUE AS p90_in_bound,
             |       TRUE AS p99_in_bound, TRUE AS merge_agrees
             |FROM documents""".stripMargin),
      Seq("A2")
    ),

    // A-series: count-min frequency sketches built PER SHARD and merged —
    // the fourth mergeable-sketch discipline (HLL, frequent-items, KLL,
    // CMS). CMS is the strictest of the family, and the entry pins both of
    // its laws: the error is ONE-SIDED (an estimate never undercounts, and
    // overshoots by at most ε·N), and merging is EXACT integer counter
    // addition — so re-sharding the same rows 16 ways vs 4 ways merges to
    // IDENTICAL estimates, asserted as equality, not an envelope. Probe
    // keys are the distinct event types (bounded); the oracle supplies
    // their exact counts and asserts the booleans.
    "a_cms_shard_merge" -> Q(
      (s, d) => {
        import s.implicits._
        val ev = events(s, d).select(col("event_id"), col("event_type"))
        def sketchOver(nShards: Int) = CountMin.mergedSketch(
          CountMin.shardSketches(
            ev.withColumn("shard", pmod(col("event_id"), lit(nShards))),
            "event_type", "shard", eps = 0.001, confidence = 0.99, seed = 42))
        val sk16 = sketchOver(16)
        val sk4 = sketchOver(4)
        val slack = math.ceil(0.001 * sk16.totalCount()).toLong
        val types = ev.select(col("event_type")).distinct().as[String].collect().sorted
        val ests = types.toSeq
          .map(t => (t, sk16.estimateCount(t), sk4.estimateCount(t)))
          .toDF("event_type", "est", "est_resharded")
        ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
          .join(broadcast(ests), Seq("event_type"))
          .select(col("event_type"), col("n_exact"),
            (col("est") >= col("n_exact")).as("one_sided_ok"),
            (col("est") - col("n_exact") <= lit(slack)).as("eps_bound_ok"),
            (col("est") === col("est_resharded")).as("reshard_exact_equal"))
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact,
             |       TRUE AS one_sided_ok, TRUE AS eps_bound_ok,
             |       TRUE AS reshard_exact_equal
             |FROM events GROUP BY event_type""".stripMargin),
      Seq("A2")
    ),

    // Streaming count-min maintenance: events arrive as two file-drop
    // microbatches; each batch persists its own fixed-size sketch segment
    // keyed by batch id (a replayed batch overwrites its segment — the
    // exactly-once layout, since CMS addition is not idempotent), and the
    // report merges segments. Oracle supplies the exact per-type counts
    // and asserts the one-sided + ε-bound laws over the merged estimate.
    "s9_streaming_sketch" -> Q(
      (s, d) => graft.streaming.StreamingPipeline.withStatePartitions(s) {
        import s.implicits._
        val srcDir = tmpDir(d, "cms_src"); val ckpt = tmpDir(d, "cms_ckpt")
        val skDir = tmpDir(d, "cms_sketch")
        Seq(srcDir, ckpt, skDir).foreach(cleanDir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
        val ev = events(s, d).select(col("event_id"), col("event_type"))
        def run(): Unit = {
          val src = s.readStream
            .schema("event_id BIGINT, event_type STRING").json(srcDir)
          val q = graft.streaming.StreamingPipeline
            .sketchingWriter(src, "event_type", skDir, ckpt).start()
          q.awaitTermination()
        }
        ev.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").json(srcDir)
        run()
        ev.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").json(srcDir)
        run()
        val merged = graft.operators.CountMin.readMerged(s, skDir)
        val slack = math.ceil(0.001 * merged.totalCount()).toLong
        val types = ev.select(col("event_type")).distinct().as[String].collect().sorted
        val ests = types.toSeq.map(t => (t, merged.estimateCount(t)))
          .toDF("event_type", "est")
        ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
          .join(broadcast(ests), Seq("event_type"))
          .select(col("event_type"), col("n_exact"),
            (col("est") >= col("n_exact")).as("one_sided_ok"),
            (col("est") - col("n_exact") <= lit(slack)).as("eps_bound_ok"))
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact,
             |       TRUE AS one_sided_ok, TRUE AS eps_bound_ok
             |FROM events GROUP BY event_type""".stripMargin),
      Seq("S6", "A2")
    ),

    // §2.11: watermarked stream-stream interval join — view → purchase
    // attribution within 6 hours per user, both sides ARRIVING AS STREAMS
    // (file drops), joined with the bounded-state interval condition and a
    // shared 12-hour watermark. Timestamps travel through the JSON hop as
    // epoch micros (longs) so serialization cannot truncate precision; the
    // oracle replays the same interval join over the events table in SQL.
    // sum_pair_ids pins WHICH pairs matched, not just how many.
    "s7_stream_stream_join" -> Q(
      (s, d) => graft.streaming.StreamingPipeline.withStatePartitions(s) {
        val viewDir = tmpDir(d, "ss_views"); val purDir = tmpDir(d, "ss_purchases")
        val outDir = tmpDir(d, "ss_joined"); val ckpt = tmpDir(d, "ss_ckpt")
        Seq(viewDir, purDir, outDir, ckpt).foreach(cleanDir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(viewDir))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(purDir))
        val ev = events(s, d)
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts_us"))
          .coalesce(1).write.mode("overwrite").json(viewDir)
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
          .coalesce(1).write.mode("overwrite").json(purDir)
        def src(dir: String, schema: String) =
          s.readStream.schema(schema).json(dir)
            .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        val views = src(viewDir, "event_id BIGINT, user_id BIGINT, ts_us BIGINT")
        val purchases =
          src(purDir, "event_id BIGINT, user_id BIGINT, ts_us BIGINT, value DOUBLE")
        val q = graft.streaming.StreamingPipeline
          .intervalJoin(views, purchases, "user_id", "ts", "6 hours", "12 hours")
          .select(col("event_id"), col("user_id"), col("r_event_id"), col("r_value"))
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", outDir).start()
        q.awaitTermination()
        s.read.parquet(outDir).agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("event_id") + col("r_event_id")).as("sum_pair_ids"),
          round(sum(col("r_value")), 2).as("sum_value"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(count(DISTINCT v.user_id) AS BIGINT) AS n_users,
             |       CAST(sum(v.event_id + p.event_id) AS BIGINT) AS sum_pair_ids,
             |       round(sum(p.value), 2) AS sum_value
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON p.user_id = v.user_id
             | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR""".stripMargin),
      Seq("S6", "J1")
    ),

    // §2.11: LEFT-OUTER stream-stream interval join — the unattributed-view
    // analysis: every view emits, unconverted ones with NULL purchase
    // columns. Outer results are watermark-DELAYED (a null row may only
    // emit once no partner can still arrive), so each side also carries a
    // far-future sentinel row (user_id = −1, filtered from the result):
    // the sentinel batch pushes the global watermark past every real
    // interval's end, and the trailing no-data batch (which Structured
    // Streaming runs after the watermark advances) flushes the remaining
    // unmatched state — no per-file rate limit needed, which keeps the
    // microbatch count minimal. The oracle replays the whole thing as a
    // plain LEFT JOIN over the events table.
    "s7_stream_stream_outer" -> Q(
      (s, d) => graft.streaming.StreamingPipeline.withStatePartitions(s) {
        val viewDir = tmpDir(d, "sso_views"); val purDir = tmpDir(d, "sso_purchases")
        val outDir = tmpDir(d, "sso_joined"); val ckpt = tmpDir(d, "sso_ckpt")
        Seq(viewDir, purDir, outDir, ckpt).foreach(cleanDir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(viewDir))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(purDir))
        val ev = events(s, d)
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts_us"))
          .coalesce(1).write.mode("overwrite").json(viewDir)
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
          .coalesce(1).write.mode("overwrite").json(purDir)
        // sentinel: 10 years past the corpus max on BOTH sides (the global
        // watermark is the min across inputs)
        val maxUs = ev.agg(max(col("ts_us"))).head().getLong(0)
        val sentinelUs = maxUs + 10L * 365 * 24 * 3600 * 1000000L
        java.nio.file.Files.write(
          java.nio.file.Paths.get(viewDir, "zz_sentinel.json"),
          s"""{"event_id":-1,"user_id":-1,"ts_us":$sentinelUs}""".getBytes("UTF-8"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(purDir, "zz_sentinel.json"),
          s"""{"event_id":-1,"user_id":-1,"ts_us":$sentinelUs,"value":0.0}""".getBytes("UTF-8"))
        def src(dir: String, schema: String) =
          s.readStream.schema(schema).json(dir)
            .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        val views = src(viewDir, "event_id BIGINT, user_id BIGINT, ts_us BIGINT")
        val purchases =
          src(purDir, "event_id BIGINT, user_id BIGINT, ts_us BIGINT, value DOUBLE")
        val q = graft.streaming.StreamingPipeline
          .intervalJoinLeftOuter(views, purchases, "user_id", "ts", "6 hours", "12 hours")
          .select(col("event_id"), col("user_id"), col("r_event_id"), col("r_value"))
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", outDir).start()
        q.awaitTermination()
        s.read.parquet(outDir).filter(col("user_id") >= 0).agg(
          count(lit(1)).as("n_rows"),
          count(col("r_event_id")).as("n_matched"),
          sum(when(col("r_event_id").isNull, 1L).otherwise(0L)).as("n_unmatched"),
          countDistinct(col("event_id")).as("n_views"),
          sum(col("event_id") + col("r_event_id")).as("sum_pair_ids"),
          round(sum(col("r_value")), 2).as("sum_value"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(p.event_id) AS BIGINT) AS n_matched,
             |       CAST(sum(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
             |       CAST(count(DISTINCT v.event_id) AS BIGINT) AS n_views,
             |       CAST(sum(v.event_id + p.event_id) AS BIGINT) AS sum_pair_ids,
             |       round(sum(p.value), 2) AS sum_value
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON p.user_id = v.user_id
             | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR""".stripMargin),
      Seq("S6", "J1")
    ),

    // §2.11: STREAMING gap sessionization — the stateful
    // flatMapGroupsWithState path (event-time timeout, state evicted per
    // closed session) pinned by a relational oracle, not just a spec: the
    // whole events table streams through sessionizeClosed with a 3-hour
    // gap, a far-future sentinel (user −1) advances the watermark so every
    // open tail times out and closes, and the emitted closed sessions must
    // equal DuckDB's gaps-and-islands replay. Session arithmetic runs on
    // epoch MILLIS on both sides (the stateful op compares
    // Timestamp.getTime) so µs-edge gaps can't diverge.
    "s8_streaming_sessions" -> Q(
      (s, d) => graft.streaming.StreamingPipeline.withStatePartitions(s) {
        val evDir = tmpDir(d, "sess_events"); val outDir = tmpDir(d, "sess_out")
        val ckpt = tmpDir(d, "sess_ckpt")
        Seq(evDir, outDir, ckpt).foreach(cleanDir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evDir))
        val ev = events(s, d)
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        ev.select(col("user_id"), col("ts_us"))
          .coalesce(1).write.mode("overwrite").json(evDir)
        val maxUs = ev.agg(max(col("ts_us"))).head().getLong(0)
        val sentinelUs = maxUs + 10L * 365 * 24 * 3600 * 1000000L
        java.nio.file.Files.write(
          java.nio.file.Paths.get(evDir, "zz_sentinel.json"),
          s"""{"user_id":-1,"ts_us":$sentinelUs}""".getBytes("UTF-8"))
        val src = s.readStream
          .schema("user_id BIGINT, ts_us BIGINT").json(evDir)
          .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        val sessions = graft.streaming.StreamingPipeline
          .sessionizeClosed(s, src, gapMs = 3L * 3600 * 1000, watermark = "1 minute")
        val q = sessions.toDF()
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", outDir).start()
        q.awaitTermination()
        s.read.parquet(outDir).filter(col("userId") >= 0).agg(
          count(lit(1)).as("n_sessions"),
          sum(col("nEvents")).as("sum_events"),
          max(col("nEvents")).as("max_session"),
          countDistinct(col("userId")).as("n_users"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS ms FROM events),
             |lagged AS (
             |  SELECT user_id, ms, lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev
             |  FROM ev),
             |flags AS (
             |  SELECT user_id, ms,
             |         CASE WHEN prev IS NULL OR ms - prev > 10800000 THEN 1 ELSE 0 END AS new_s
             |  FROM lagged),
             |sess AS (
             |  SELECT user_id,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ms
             |                          ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flags),
             |sizes AS (SELECT user_id, sid, count(*) AS n FROM sess GROUP BY user_id, sid)
             |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(n) AS BIGINT) AS sum_events,
             |       CAST(max(n) AS BIGINT) AS max_session,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM sizes""".stripMargin),
      Seq("S6", "W1")
    ),

    // ROWS-frame moving average — the count-based sibling of the RANGE
    // rolling window (w_rolling_1h): per user, the mean of the last 4
    // events by (ts, event_id) order. Per-row averages round at 6dp, then
    // convert to exact MICRO-UNIT longs before the per-user sum — integer
    // associativity makes the fold partition-invariant and replayable.
    "w_moving_avg" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 0)
        events(s, d)
          .withColumn("ma", round(avg(col("value")).over(w), 6))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("ma") * 1e6).cast("long")).as("sum_ma_micro"))
      },
      Some("""WITH ma AS (
             |  SELECT user_id,
             |         round(avg(value) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id
             |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS ma
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(ma * 1e6) AS BIGINT)) AS BIGINT) AS sum_ma_micro
             |FROM ma GROUP BY user_id""".stripMargin),
      Seq("W1", "A2")
    ),

    // §2.11: STREAM-STATIC enrichment join — the third Structured Streaming
    // join shape after stream-stream inner/outer: a purchase stream joined
    // per microbatch against a STATIC per-user profile table (views count +
    // last view id from the batch corpus). Stream-static joins are
    // STATELESS — no watermark, no buffered state; the static side is
    // re-planned each microbatch, which is exactly why it must BROADCAST: a
    // shuffle join would re-exchange the stream every batch, and at 100 TB
    // the dim side (users, domains, blocklists) is the small one by
    // construction. LEFT join keeps profile-less purchasers with NULL
    // profile columns. Oracle replays it as a plain SQL left join.
    "s10_stream_static_enrich" -> Q(
      (s, d) => graft.streaming.StreamingPipeline.withStatePartitions(s) {
        val purDir = tmpDir(d, "sse_purchases"); val outDir = tmpDir(d, "sse_out")
        val ckpt = tmpDir(d, "sse_ckpt")
        Seq(purDir, outDir, ckpt).foreach(cleanDir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(purDir))
        val ev = events(s, d)
        val profile = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_views"), max(col("event_id")).as("last_view_id"))
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
          .coalesce(1).write.mode("overwrite").json(purDir)
        val purchases = s.readStream
          .schema("event_id BIGINT, user_id BIGINT, ts_us BIGINT, value DOUBLE")
          .json(purDir)
        val q = purchases
          .join(broadcast(profile), Seq("user_id"), "left")
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", outDir).start()
        q.awaitTermination()
        s.read.parquet(outDir).agg(
          count(lit(1)).as("n_purchases"),
          count(col("n_views")).as("n_with_profile"),
          sum(col("n_views")).as("sum_views"),
          sum(col("event_id") + col("last_view_id")).as("sum_pair_ids"),
          round(sum(col("value")), 2).as("sum_value"))
      },
      Some("""WITH profile AS (
             |  SELECT user_id, count(*) AS n_views, max(event_id) AS last_view_id
             |  FROM events WHERE event_type = 'view' GROUP BY user_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_purchases,
             |       CAST(count(pr.n_views) AS BIGINT) AS n_with_profile,
             |       CAST(sum(pr.n_views) AS BIGINT) AS sum_views,
             |       CAST(sum(p.event_id + pr.last_view_id) AS BIGINT) AS sum_pair_ids,
             |       round(sum(p.value), 2) AS sum_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN profile pr USING (user_id)""".stripMargin),
      Seq("S6", "J1")
    )
  )

  private def tmpDir(d: String, name: String): String = QueryScratch.dir(d, name)
  private def cleanDir(p: String): Unit = QueryScratch.clean(p)
}
