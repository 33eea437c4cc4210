package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{Overlay, SkewJoin}

/** The relational operator battery: filters, joins, aggregations, windows,
  * limits, set ops (SURVEY §2.3-2.8) exercised over the TPC-H-ish tables.
  */
object RelationalQueries {

  val all: Map[String, Q] = Map(

    // A2: the flagship pricing-summary aggregation (grouped sums/counts).
    "q1_pricing_summary" -> Q(
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
            count(lit(1)).as("count_order")
          ),
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity),2) AS sum_qty,
             |round(sum(l_extendedprice),2) AS sum_base_price,
             |round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
             |count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
      Seq("A2")
    ),

    // Star join chain: orders → customer → nation → region. No hints —
    // AQE broadcasts each dim while it fits (the audited plan shows all
    // three as BroadcastHashJoin) and would shuffle a dim that outgrew the
    // ceiling, which a forced hint would wrongly pin at 100 TB.
    "q_star_join" -> Q(
      (s, d) =>
        orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price")),
      Some("""SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price
             |FROM orders JOIN customer ON o_custkey=c_custkey
             |JOIN nation ON c_nationkey=n_nationkey
             |JOIN region ON n_regionkey=r_regionkey
             |GROUP BY r_name""".stripMargin),
      Seq("A2")
    ),

    // Skew-salted equi-join: the explicit lever for hot keys AQE's runtime
    // skew handling can't reach (a deterministic row-hash salt spreads the
    // big side 8 ways, the dim side replicates 8×). Salting must be
    // result-invisible — the oracle is the PLAIN join, so any
    // duplicate/dropped row from the salt machinery hash-mismatches.
    "j_salted_skew" -> Q(
      (s, d) => {
        val big = lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_extendedprice"), col("l_discount"))
        val dim = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
        SkewJoin.saltedJoin(big, dim, Seq("o_orderkey"), salts = 8)
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin),
      Seq("J1", "A2")
    ),

    // J1: the central incremental anti-join — size-adaptive like
    // Identify.identifyFiles: no broadcast hint, so AQE broadcasts the
    // "already processed" side while it fits and shuffles beyond (the
    // ledger is unbounded at the 100 TB north star).
    "j1_incremental_antijoin" -> Q(
      (s, d) => {
        val state = orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey").as("l_orderkey"))
        lineitem(s, d)
          .join(state, Seq("l_orderkey"), "left_anti")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      },
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
             |FROM lineitem
             |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus='F')
             |GROUP BY l_returnflag""".stripMargin),
      Seq("J1", "F4")
    ),

    // J1 via the bloom pre-filter: identical semantics to
    // j1_incremental_antijoin (same oracle), but rows the bloom proves
    // absent from the exclusion set bypass the anti-join shuffle — the
    // 100 TB path once the ledger outgrows broadcast. The bloom only
    // routes; the exact anti-join resolves every "maybe", so the result
    // is exact.
    "j1_bloom_prefilter" -> Q(
      (s, d) => {
        val state = orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        graft.operators.BloomAntiJoin
          .antiJoin(lineitem(s, d), "l_orderkey", state, "o_orderkey",
            expectedItems = 200000L, fpp = 0.01)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      },
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
             |FROM lineitem
             |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus='F')
             |GROUP BY l_returnflag""".stripMargin),
      Seq("J1", "F4")
    ),

    // J2/SO1: validation set compare — ids on one side but not the other.
    "j2_validation_setdiff" -> Q(
      (s, d) => {
        val a = customer(s, d).select(col("c_custkey").as("id")).distinct()
        val b = orders(s, d).select(col("o_custkey").as("id")).distinct()
        val aOnly = a.join(b, Seq("id"), "left_anti").withColumn("side", lit("state_only"))
        val bOnly = b.join(a, Seq("id"), "left_anti").withColumn("side", lit("store_only"))
        aOnly.unionByName(bOnly).groupBy(col("side")).agg(count(lit(1)).as("n"))
      },
      Some("""WITH a AS (SELECT DISTINCT c_custkey AS id FROM customer),
             |b AS (SELECT DISTINCT o_custkey AS id FROM orders),
             |d AS (SELECT id, 'state_only' AS side FROM (SELECT id FROM a EXCEPT SELECT id FROM b)
             |      UNION ALL
             |      SELECT id, 'store_only' AS side FROM (SELECT id FROM b EXCEPT SELECT id FROM a))
             |SELECT side, count(*) AS n FROM d GROUP BY side""".stripMargin),
      Seq("J2", "SO1")
    ),

    // J3/K1: upsert overlay — updates replace stored rows with equal key,
    // last-write-wins via a window over the key.
    "j3_upsert_overlay" -> Q(
      (s, d) => {
        val store = lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        val updates = store.filter(col("l_returnflag") === "R")
          .withColumn("l_quantity", col("l_quantity") + 100)
        Overlay
          .overlay(store, updates, Seq("l_orderkey", "l_linenumber"), Seq("l_quantity", "l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      },
      Some("""WITH all_rows AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, 0 AS is_new FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, l_quantity+100, l_returnflag, 1 FROM lineitem WHERE l_returnflag='R'),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
             |                              ORDER BY is_new DESC, l_quantity DESC, l_returnflag DESC) AS rn
             |  FROM all_rows)
             |SELECT l_returnflag, round(sum(l_quantity),2) AS sum_qty, count(*) AS n
             |FROM ranked WHERE rn=1 GROUP BY l_returnflag""".stripMargin),
      Seq("J3", "K1")
    ),

    // SO2: union of id sets.
    "so2_union_ids" -> Q(
      (s, d) =>
        customer(s, d).select(col("c_custkey").as("id"))
          .union(orders(s, d).select(col("o_custkey").as("id")))
          .distinct()
          .agg(count(lit(1)).as("n_ids")),
      Some("""SELECT count(*) AS n_ids FROM
             |(SELECT c_custkey AS id FROM customer UNION SELECT o_custkey FROM orders)""".stripMargin),
      Seq("SO2", "A3")
    ),

    // L1: stable-ordered head-n of a to-process list.
    "l1_limit" -> Q(
      (s, d) =>
        documents(s, d).orderBy(col("doc_id")).limit(20)
          .select(col("doc_id"), col("source"), col("n_chars")),
      Some("SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id LIMIT 20"),
      Seq("L1")
    ),

    // L2: sorted top-10 display truncation.
    "l2_top10" -> Q(
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("total").desc, col("o_custkey"))
          .limit(10),
      Some("""SELECT o_custkey, round(sum(o_totalprice),2) AS total FROM orders
             |GROUP BY o_custkey ORDER BY total DESC, o_custkey LIMIT 10""".stripMargin),
      Seq("L2")
    ),

    // W2: enumerated positions via row_number per partition.
    "w2_row_number" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 2)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 2""".stripMargin),
      Seq("W2")
    ),

    // A4 (relational form): token-budget grouping via running sum + bucket.
    "a4_token_budget_buckets" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        documents(s, d)
          .withColumn("cum", sum(col("n_chars")).over(w))
          .withColumn("bucket", floor(col("cum") / 5000).cast("long"))
          .groupBy(col("source"))
          .agg(countDistinct(col("bucket")).as("n_groups"), count(lit(1)).as("n_docs"))
      },
      Some("""SELECT source, count(DISTINCT bucket) AS n_groups, count(*) AS n_docs FROM (
             |  SELECT source,
             |         CAST(floor(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             |              ROWS UNBOUNDED PRECEDING) / 5000) AS BIGINT) AS bucket
             |  FROM documents) GROUP BY source""".stripMargin),
      Seq("A4")
    ),

    // Rollup aggregation (subtotals + grand total) — beyond reference parity.
    "q_rollup" -> Q(
      (s, d) =>
        lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
      Seq("A2")
    ),

    // Statistical aggregates: Pearson correlation + sample covariance/stddev
    // per group. Both engines implement the same textbook estimators;
    // round(,6) absorbs accumulation-order noise as with every float agg.
    "a_corr_stats" -> Q(
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"),
            round(stddev_samp(col("l_quantity")), 6).as("sd_qty")),
      Some("""SELECT l_returnflag, count(*) AS n,
             |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             |       round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
             |       round(stddev_samp(l_quantity), 6) AS sd_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      Seq("A2")
    ),

    // PIVOT with an explicit value list (the deterministic form — Spark
    // requires literal pivot values for a stable schema): order totals by
    // priority, one column per order status. The oracle is the relational
    // identity: FILTERed conditional aggregates.
    "q_pivot" -> Q(
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(sum(col("o_totalprice")), 2))
          .select(col("o_orderpriority"),
            col("F").as("f_total"), col("O").as("o_total"), col("P").as("p_total")),
      Some("""SELECT o_orderpriority,
             |       round(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 2) AS f_total,
             |       round(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 2) AS o_total,
             |       round(sum(o_totalprice) FILTER (o_orderstatus = 'P'), 2) AS p_total
             |FROM orders GROUP BY o_orderpriority""".stripMargin),
      Seq("A2")
    ),

    // EXCEPT ALL — bag semantics: every order's custkey minus ONE occurrence
    // per customer key (multiplicity arithmetic, where EXCEPT would collapse
    // to the set). SO-series breadth.
    "so_except_all" -> Q(
      (s, d) =>
        orders(s, d).select(col("o_custkey").cast("long").as("custkey"))
          .exceptAll(customer(s, d).select(col("c_custkey").cast("long").as("custkey")))
          .agg(count(lit(1)).as("n"), sum(col("custkey")).as("sum_keys")),
      Some("""SELECT count(*) AS n, CAST(sum(custkey) AS BIGINT) AS sum_keys FROM (
             |  SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders
             |  EXCEPT ALL
             |  SELECT CAST(c_custkey AS BIGINT) FROM customer)""".stripMargin),
      Seq("SO1", "SO2")
    ),

    // Equal-width histogram with fixed literal bounds: integer floor-div
    // bucketing is identical IEEE arithmetic in both engines (no
    // data-dependent min/max round trip — the fixed bounds are the
    // deterministic, one-pass production shape).
    "a_histogram" -> Q(
      (s, d) =>
        orders(s, d)
          .groupBy(least(floor(col("o_totalprice") / 50000.0), lit(9.0)).cast("long").as("bin"))
          .agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(least(floor(o_totalprice / 50000.0), 9.0) AS BIGINT) AS bin,
             |       count(*) AS n
             |FROM orders GROUP BY 1""".stripMargin),
      Seq("A2")
    ),

    // GROUPING SETS — the general grouping-set form behind rollup/cube,
    // through the SQL surface (spark.sql), mixing a two-column set, a
    // one-column set, and the grand total.
    "q_grouping_sets" -> Q(
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("lineitem_gs")
        s.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n,
            |       round(sum(l_quantity), 2) AS sum_qty
            |FROM lineitem_gs
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |       round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin),
      Seq("A2")
    ),

    // CUBE: all grouping-set combinations (rollup's sibling — §2.5 breadth).
    "q_cube" -> Q(
      (s, d) =>
        lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),
      Seq("A2")
    ),

    // Correlated scalar subquery: line items priced above their part's own
    // average. Catalyst must DECORRELATE this into an aggregate + equi-join
    // (the plan invariant pins it) — the naive per-row re-execution of the
    // inner query is the 100 TB non-starter this optimizer rewrite exists
    // for. float-sum association order differs between engines, so the
    // aggregate rounds at 2dp (cents-exact in both).
    "q_correlated_subquery" -> Q(
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("lineitem_corr")
        s.sql(
          """SELECT l_returnflag, count(*) AS n,
            |       round(sum(l_extendedprice), 2) AS sum_price
            |FROM lineitem_corr l1
            |WHERE l_extendedprice > (SELECT avg(l_extendedprice)
            |                         FROM lineitem_corr l2
            |                         WHERE l2.l_partkey = l1.l_partkey)
            |GROUP BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |       round(sum(l_extendedprice), 2) AS sum_price
             |FROM lineitem l1
             |WHERE l_extendedprice > (SELECT avg(l_extendedprice)
             |                         FROM lineitem l2
             |                         WHERE l2.l_partkey = l1.l_partkey)
             |GROUP BY l_returnflag""".stripMargin),
      Seq("A2", "J1")
    ),

    // LATERAL join with a correlated ordered-LIMIT subquery: per-nation
    // top-2 customers by balance — the "top-k per outer row" idiom SQL
    // users reach for before they know window functions. Catalyst must
    // rewrite the lateral into a join (DecorrelateInnerQuery handles the
    // correlated LIMIT), not re-execute the inner query per outer row.
    // Balances pass through unmodified (no float arithmetic), so values
    // compare exactly.
    "q_lateral_topk" -> Q(
      (s, d) => {
        nation(s, d).createOrReplaceTempView("nation_lat")
        customer(s, d).createOrReplaceTempView("customer_lat")
        s.sql("""SELECT n.n_name, l.c_name, l.c_acctbal
                |FROM nation_lat n,
                |LATERAL (SELECT c_name, c_acctbal FROM customer_lat c
                |         WHERE c.c_nationkey = n.n_nationkey
                |         ORDER BY c_acctbal DESC, c_name LIMIT 2) l""".stripMargin)
      },
      Some("""SELECT n.n_name, l.c_name, l.c_acctbal
             |FROM nation n,
             |LATERAL (SELECT c_name, c_acctbal FROM customer c
             |         WHERE c.c_nationkey = n.n_nationkey
             |         ORDER BY c_acctbal DESC, c_name LIMIT 2) l""".stripMargin),
      Seq("J1", "L2")
    ),

    // ROLLUP with GROUPING() markers: the hierarchy prefix of CUBE plus the
    // marker function that disambiguates "NULL because subtotal" from "NULL
    // in the data" — the piece q_cube doesn't exercise.
    "q_rollup_grouping" -> Q(
      (s, d) =>
        lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).as("g_rf"),
            grouping(col("l_linestatus")).as("g_ls"),
            count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
             |       CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls,
             |       count(*) AS n, round(sum(l_quantity),2) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
      Seq("A2")
    ),

    // INTERSECT (SO-series breadth next to except/union): customer nations
    // that also appear among supplier nations.
    "so_intersect" -> Q(
      (s, d) =>
        customer(s, d).select(col("c_nationkey").cast("long").as("nationkey"))
          .intersect(supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
          .agg(count(lit(1)).as("n"), sum(col("nationkey")).as("sum_keys")),
      Some("""SELECT count(*) AS n, CAST(sum(nationkey) AS BIGINT) AS sum_keys FROM (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             |  INTERSECT
             |  SELECT CAST(s_nationkey AS BIGINT) FROM supplier)""".stripMargin),
      Seq("SO1", "SO2")
    ),

    // Full outer join with deliberately disjoint edges: nations below 15
    // against customer counts for nations 10+, so left-only, right-only,
    // and matched rows all appear (§2.4 breadth).
    "q_full_outer" -> Q(
      (s, d) => {
        val nat = nation(s, d).filter(col("n_nationkey") < 15)
          .select(col("n_nationkey"), col("n_name"))
        val cust = customer(s, d).filter(col("c_nationkey") >= 10)
          .groupBy(col("c_nationkey").cast("long").as("n_nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        nat.join(cust, Seq("n_nationkey"), "full_outer")
      },
      Some("""WITH nat AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15),
             |cust AS (SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey, count(*) AS n_cust
             |         FROM customer WHERE c_nationkey >= 10 GROUP BY 1)
             |SELECT COALESCE(nat.n_nationkey, cust.n_nationkey) AS n_nationkey, n_name, n_cust
             |FROM nat FULL OUTER JOIN cust USING (n_nationkey)""".stripMargin),
      Seq("J1", "A2")
    ),

    // Semi-join (EXISTS): orders with at least one heavy line.
    "q_semi_join" -> Q(
      (s, d) =>
        orders(s, d)
          .join(
            lineitem(s, d).filter(col("l_quantity") > 45)
              .select(col("l_orderkey").as("o_orderkey")),
            Seq("o_orderkey"), "left_semi"
          )
          .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |GROUP BY o_orderstatus""".stripMargin),
      Seq("J1")
    ),

    // F5-adjacent: conditional failure-record synthesis via when/otherwise
    // routing (the relational face of the exists-guard).
    "f5_guard_routing" -> Q(
      (s, d) =>
        orders(s, d)
          .withColumn(
            "route",
            when(col("o_totalprice") < 1000, lit("failed_too_small"))
              .when(col("o_orderstatus") === "F", lit("final"))
              .otherwise(lit("ok"))
          )
          .groupBy(col("route")).agg(count(lit(1)).as("n")),
      Some("""SELECT CASE WHEN o_totalprice < 1000 THEN 'failed_too_small'
             |            WHEN o_orderstatus = 'F' THEN 'final'
             |            ELSE 'ok' END AS route, count(*) AS n
             |FROM orders GROUP BY 1""".stripMargin),
      Seq("F5")
    ),

    // Correlated EXISTS / NOT EXISTS through the SQL surface: Catalyst must
    // decorrelate both into semi/anti joins — a per-outer-row subquery
    // execution is the 100 TB non-starter the rewrite exists for. The two
    // predicates partition the customers, which the count pins.
    "q_exists_subquery" -> Q(
      (s, d) => {
        customer(s, d).createOrReplaceTempView("customer_ex")
        orders(s, d).createOrReplaceTempView("orders_ex")
        s.sql(
          """SELECT c_nationkey,
            |       count(*) AS n_with_big_order
            |FROM customer_ex c
            |WHERE EXISTS (SELECT 1 FROM orders_ex o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
            |  AND NOT EXISTS (SELECT 1 FROM orders_ex o
            |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 5000)
            |GROUP BY c_nationkey""".stripMargin)
      },
      Some("""SELECT c_nationkey, count(*) AS n_with_big_order
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 5000)
             |GROUP BY c_nationkey""".stripMargin),
      Seq("J1", "SO1")
    ),

    // Parquet AGGREGATE PUSHDOWN: an unfiltered global count/min/max runs
    // against footer statistics — zero row groups decoded, the scan node
    // itself answers the query (`PushedAggregation` in the plan). At 100 TB
    // this is the difference between a metadata read and a full-table scan
    // for the monitoring queries every pipeline runs constantly. Needs the
    // DSv2 parquet path, so the entry runs in a child session (shared
    // SparkContext, isolated conf) rather than flipping the battery-wide
    // session's source list. min/max push for numeric columns only — the
    // date/string columns stay unpushed on purpose and are not used here.
    "a_agg_pushdown" -> Q(
      (s, d) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.sources.useV1SourceList", "")
        s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        s2.read.parquet(s"$d/lineitem.parquet")
          .agg(
            expr("count(*)").as("n_rows"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            min(col("l_orderkey")).as("min_ok"),
            max(col("l_orderkey")).as("max_ok"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
             |FROM lineitem""".stripMargin),
      Seq("A2", "F6")
    )
  )
}
