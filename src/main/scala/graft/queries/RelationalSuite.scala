package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational surface: scans, projections, filters, inner/semi/anti joins,
  * group-by aggregation, distinct, sort/limit, set ops, and DML-as-dataflow
  * (INSERT/UPDATE/DELETE semantics re-expressed over immutable DataFrames).
  *
  * Covers SURVEY §2.2 P1/P3/P5 (projection, equality predicates, AND
  * chaining), §2.3 J1-J4 (the reference's only join is inner-equi —
  * /root/reference/client.py:384-427 — we add semi/anti as capability
  * growth), §2.4 A1 (GROUP BY + count, the reference's intended-but-dead
  * branch at server.py:897-920, implemented correctly), §2.5 sorts/set-ops,
  * §2.10 M1/M2 DML.
  *
  * Scale notes per query are inline. Aggregates over doubles are rounded to
  * 2 decimals in BOTH engines so float summation order can't flip the
  * oracle hash.
  */
object RelationalSuite extends Suite {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.t(s, d, n)

  /** Cent-exact money aggregation: per-term round to integer cents (both
    * engines see identical double bits, so identical cents), sum as BIGINT
    * (exact, order-independent), divide once at the end. Plain
    * round(sum(double), 2) flips on .005 boundaries between engines —
    * observed 2/1297 rows off by one cent at sf0.01. */
  private[queries] def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100, 0).cast("long")
  private[queries] def money(sumCents: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sumCents / 100.0

  def defs: Map[String, Q] = Map(

    // Flagship: TPC-H Q1-style full-scan aggregation. Map-side partial agg +
    // 6-group final — no skew possible, scan-bound at any scale; filter and
    // the 7-column projection push to parquet.
    "q1_agg" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          money(sum(cents(col("l_extendedprice")))).as("sum_base_price"),
          money(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))).as("sum_disc_price"),
          money(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))).as("sum_charge"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
             |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS sum_disc_price,
             |  sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)) / 100.0 AS sum_charge,
             |  round(avg(l_quantity), 2) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // P1+P3+P5: projection + conjunctive equality/range predicates. Both
    // filters and the 3-column ReadSchema reach the parquet scan.
    "q_filter_project" -> Q(
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_orderstatus = 'O' AND o_totalprice > 150000""".stripMargin)),

    // J1/J2: 3-way inner join + aggregation (TPC-H Q3 shape). customer is a
    // dim → explicit broadcast kills one shuffle; orders⋈lineitem shuffles
    // on orderkey, which is also the grouping key → single exchange reused.
    "q_join3_revenue" -> Q(
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = t(s, d, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(money(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))).as("revenue"))
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY l_orderkey, o_orderdate""".stripMargin)),

    // J2/J4: 6-table multi-way join (TPC-H Q5 shape). All four dims
    // broadcast; the only shuffle is lineitem⋈orders + final 25-group agg.
    // This is the plan shape that survives 100 TB: one big-table shuffle.
    "q_join5_nation_revenue" -> Q(
      (s, d) => {
        val nat = t(s, d, "nation"); val reg = t(s, d, "region")
        val sup = t(s, d, "supplier"); val cust = t(s, d, "customer")
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(money(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))).as("revenue"))
      },
      Some("""SELECT r_name, n_name,
             |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // J3 as a real semi-join (the reference evaluates WHERE as a semi-join of
    // index rowids, client.py:672-738): customers with a >200k order.
    "q_semi_join" -> Q(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 200000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 200000)""".stripMargin)),

    // Anti-join (capability beyond the reference's inner-only §2.3 table).
    "q_anti_join" -> Q(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_nationkey"),
      Some("""SELECT c_custkey, c_nationkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin)),

    // A1: the reference's one aggregation — GROUP BY + count
    // (server.py:897-920, implemented correctly here).
    "q_groupby_count" -> Q(
      (s, d) => t(s, d, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY c_nationkey")),

    // distinct aggregation (expand + two-phase agg under the hood).
    "q_count_distinct" -> Q(
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // table profiling (the ANALYZE/data-card shape for relational tables):
    // row count, key cardinalities, null tally, min/max ranges — ONE scan,
    // one partial-agg shuffle, the stats a planner or data catalog wants.
    // min/max only (no float sums), so every value is order-independent.
    "q_profile" -> Q(
      (s, d) => t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_returnflag")).as("n_flags"),
        sum(col("l_quantity").isNull.cast("long")).as("n_null_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags,
             |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_null_qty,
             |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
             |FROM lineitem""".stripMargin)),

    // UNPIVOT/melt (pivot's inverse — wide measure columns to long
    // (measure, value) rows). Spark's unpivot is a zero-shuffle Expand;
    // values are cent-exact fixed-point so the melt is hash-stable.
    "q_unpivot" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("extendedprice_c"),
          round(col("l_discount") * 100, 0).cast("long").as("discount_c"),
          round(col("l_tax") * 100, 0).cast("long").as("tax_c"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("extendedprice_c"), col("discount_c"), col("tax_c")),
          variableColumnName = "measure", valueColumnName = "cents"),
      Some("""SELECT l_orderkey, l_linenumber, measure,
             |  CAST(cents AS BIGINT) AS cents
             |FROM (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS extendedprice_c,
             |    CAST(round(l_discount * 100, 0) AS BIGINT) AS discount_c,
             |    CAST(round(l_tax * 100, 0) AS BIGINT) AS tax_c
             |  FROM lineitem WHERE l_orderkey <= 100)
             |UNPIVOT (cents FOR measure IN
             |  (extendedprice_c, discount_c, tax_c))""".stripMargin)),

    // grouping sets via ROLLUP (subtotal rows carry NULL group keys in both
    // engines).
    "q_rollup" -> Q(
      (s, d) => t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)),

    // exact percentiles (linear interpolation — quantile_cont semantics).
    // EXACT quantiles with NO sort and NO data shuffle: binary search on
    // the value domain, one conditional-count scan per round, all probes
    // advanced in the same pass (operators.Quantiles — the selection
    // alternative to percentile()'s collect-all buffer at 100 TB). Cents
    // keep the counting integer-exact; the oracle is the explicit rank
    // formulation, immune to quantile-interpolation-mode differences.
    "q_exact_quantiles" -> Q(
      (s, d) => graft.operators.Quantiles.exactQuantiles(
        t(s, d, "lineitem").select(
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents")),
        "cents", Seq(0.5, 0.9, 0.99)),
      Some(Seq(0.5, 0.9, 0.99).map(p =>
        graft.operators.Quantiles.exactQuantileSql("lineitem",
          "CAST(round(l_extendedprice * 100, 0) AS BIGINT)", p))
        .mkString("\nUNION ALL\n"))),

    // exact top-k per group with NO window sort: two bounded heap folds
    // (k rows per group per partition, then per group) — the selection
    // identity win_row_number's full-group sort doesn't exploit. Unique
    // event_id doubles as the required determinism tiebreak.
    "q_topk_per_group" -> Q(
      (s, d) => graft.operators.TopK.perGroup(
        Tables.t(s, d, "events").select(col("user_id"), col("event_id")),
        Seq("user_id"), "event_id", "event_id", k = 3),
      Some("""SELECT user_id, event_id, CAST(rn AS INT) AS rank FROM (
             |  SELECT user_id, event_id, row_number() OVER (
             |      PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events) WHERE rn <= 3""".stripMargin)),

    // per-GROUP exact quantiles ("p99 per host"): same selection, one
    // scan per round for every group × probe via bucket histograms.
    "q_exact_quantiles_by" -> Q(
      (s, d) => graft.operators.Quantiles.exactQuantilesBy(
        Tables.t(s, d, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents", Seq(0.5, 0.99)),
      Some {
        def leg(p: Double) =
          s"""SELECT g AS event_type, CAST($p AS DOUBLE) AS prob,
             |  min(v) AS value FROM r
             |WHERE rn >= CAST(floor($p * (n - 1)) AS BIGINT) + 1
             |GROUP BY g""".stripMargin
        s"""WITH vv AS (SELECT event_type AS g,
           |    CAST(round(value * 100, 0) AS BIGINT) AS v
           |  FROM events WHERE value IS NOT NULL),
           |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
           |        count(*) OVER (PARTITION BY g) AS n
           |      FROM vv)
           |${leg(0.5)}
           |UNION ALL
           |${leg(0.99)}""".stripMargin
      }),

    "q_percentile" -> Q(
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 2).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price")),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 2) AS p50_qty,
             |  round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // statistical aggregates (growth): Pearson correlation and sample
    // stddev/variance per group — single-pass co-moment accumulation in
    // both engines (one partial-agg shuffle); rounded to 4 decimals so
    // summation-order float noise can't flip the hash.
    "q_corr" -> Q(
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r_qty_price"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 4).as("var_disc")),
      Some("""SELECT l_returnflag,
             |  round(corr(l_quantity, l_extendedprice), 4) AS r_qty_price,
             |  round(stddev_samp(l_quantity), 4) AS sd_qty,
             |  round(var_samp(l_discount), 4) AS var_disc
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // sketch percentiles (approx_percentile) — estimator values are
    // implementation-specific, so rows-only for DuckDB; the estimate is
    // error-bounded IN-PATH at t2-fixture scale: each group's p50 must
    // land within 5% of the exact median.
    "q_approx_percentile" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val approx = li.groupBy(col("l_returnflag"))
          .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_price"))
        // memoized table count: the gate costs nothing per invocation
        if (Tables.rowCount(s, d, "lineitem") <= 100000L) {
          val offBound = approx.join(
            li.groupBy(col("l_returnflag"))
              .agg(expr("percentile(l_extendedprice, 0.5)").as("exact_p50")),
            "l_returnflag")
            .filter(abs(col("p50_price") - col("exact_p50")) >
              col("exact_p50") * 0.05)
            .count()
          require(offBound == 0, s"approx p50 off by >5% in $offBound groups")
        }
        approx
      },
      None),

    // scalar string functions (SURVEY §2.6: absent in the reference; full
    // functions library here) — upper/substr/concat/length/replace.
    "q_string_funcs" -> Q(
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_type"), 1, 3).as("type3"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), "A", "@").as("type_sub")),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  substr(p_type, 1, 3) AS type3,
             |  concat(p_brand, '/', p_type) AS brand_type,
             |  length(p_name) AS name_len,
             |  replace(p_type, 'A', '@') AS type_sub
             |FROM part""".stripMargin)),

    // scalar date/time functions — extract parts, date arithmetic, diff.
    "q_date_funcs" -> Q(
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002")),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS y,
             |  CAST(month(o_orderdate) AS INTEGER) AS m,
             |  CAST(day(o_orderdate) AS INTEGER) AS dom,
             |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
             |    AS days_to_2002
             |FROM orders""".stripMargin)),

    // full grouping-set lattice via CUBE.
    "q_cube" -> Q(
      (s, d) => t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // bloom-pruned join (growth): urgent orders are a selective dim —
    // the fact side probes the broadcast key bloom scan-side, so the
    // shuffle moves ~selectivity of lineitem; false positives die in the
    // join, so the revenue answer is EXACTLY the plain join's (the
    // oracle). AQE's runtime filters, made explicit and deterministic.
    "q_bloom_join" -> Q(
      (s, d) => {
        val urgent = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderpriority"))
        graft.operators.SkewJoin.bloomPrunedJoin(
            t(s, d, "lineitem"), urgent, "l_orderkey", "o_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("cents"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
             |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             |       AS BIGINT) AS cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY o_orderpriority""".stripMargin)),

    // explicit GROUPING SETS (the general form rollup/cube sugar over):
    // (status, priority), (status), () — one partial-agg pass expands to
    // the three grouping shapes, same plan Structured rollups use.
    "q_grouping_sets" -> Q(
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
                |FROM orders
                |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                |  (o_orderstatus), ())""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
             |  (o_orderstatus), ())""".stripMargin)),

    // HAVING — post-aggregation filter.
    "q_having" -> Q(
      (s, d) => t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 15),
      Some("""SELECT o_custkey, count(*) AS n_orders FROM orders
             |GROUP BY o_custkey HAVING count(*) >= 15""".stripMargin)),

    // conditional aggregation (pivot-style counts in one pass).
    "q_conditional_agg" -> Q(
      (s, d) => t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p")),
      // CAST: DuckDB sum(INTEGER) is HUGEINT, which the driver's Arrow
      // fetch path renders as a float — BIGINT keeps it integral.
      Some("""SELECT o_orderpriority,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // HLL sketch (approx_count_distinct) — estimator values are
    // implementation-specific, so rows-only for DuckDB; but the estimate is
    // error-bounded IN-PATH (Verify runs it): every group must land within
    // 3× the default 5% rsd of the exact distinct count. The exact-count
    // cross-shuffle only runs at t2-fixture scale (like dedup_simhash's
    // brute-force check) — the production plan is the sketch alone.
    "q_approx_distinct" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        // memoized table count: the gate costs nothing per invocation
        if (Tables.rowCount(s, d, "lineitem") <= 100000L) {
          val offBound = approx.join(
            li.groupBy(col("l_returnflag"))
              .agg(countDistinct(col("l_partkey")).as("exact_parts")),
            "l_returnflag")
            .filter(abs(col("approx_parts") - col("exact_parts")) >
              col("exact_parts") * 0.15)
            .count()
          require(offBound == 0, s"HLL estimate off by >15% in $offBound groups")
        }
        approx
      },
      None),

    // ANSI SQL passthrough surface: the engine registers every table as a
    // temp view and accepts full Spark SQL — the reference's SQL API grown
    // to a complete dialect.
    "q_sql_passthrough" -> Q(
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT n_name, count(*) AS cnt
                |FROM customer JOIN nation ON c_nationkey = n_nationkey
                |GROUP BY n_name""".stripMargin)
      },
      Some("""SELECT n_name, count(*) AS cnt
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // correlated scalar subquery — Catalyst decorrelates into an aggregate
    // + join; the reference has no subqueries at all.
    "q_correlated_subquery" -> Q(
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT c_custkey, c_acctbal FROM customer
                |WHERE c_acctbal > (SELECT avg(o_totalprice) * 0.02 FROM orders
                |                   WHERE o_custkey = c_custkey)""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE c_acctbal > (SELECT avg(o_totalprice) * 0.02 FROM orders
             |                   WHERE o_custkey = c_custkey)""".stripMargin)),

    // IN-subquery (rewritten to a semi-join).
    "q_in_subquery" -> Q(
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT s_suppkey, s_name FROM supplier
                |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                |                      WHERE n_regionkey = 2)""".stripMargin)
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
             |                      WHERE n_regionkey = 2)""".stripMargin)),

    // Distinct = shuffle-dedup; partial-distinct map-side first.
    "q_distinct" -> Q(
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // Top-k: TakeOrderedAndProject — O(k) per partition, no full sort at
    // scale. Unique tie-break on o_orderkey keeps both engines deterministic.
    "q_topk" -> Q(
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice").limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // §2.5 set ops (the reference's FTS OR-union / AND-intersection of rowid
    // sets, server.py:1124-1128, client.py:730-738, generalized).
    "q_set_union" -> Q(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("k"))).distinct(),
      Some("SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier")),
    "q_set_intersect" -> Q(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k"))),
      Some("""SELECT DISTINCT c_nationkey AS k FROM customer
             |INTERSECT SELECT DISTINCT s_nationkey AS k FROM supplier""".stripMargin)),
    "q_set_except" -> Q(
      (s, d) => t(s, d, "nation").select(col("n_nationkey").as("k"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("k"))),
      Some("""SELECT DISTINCT n_nationkey AS k FROM nation
             |EXCEPT SELECT DISTINCT s_nationkey AS k FROM supplier""".stripMargin)),
    // MULTISET set ops (ALL variants — bag semantics): occurrences
    // subtract/min rather than collapsing to membership. Spark plans both
    // as one aggregate computing per-row counts on each side + a
    // generate — same single-shuffle shape as the distinct forms, no join.
    "q_set_except_all" -> Q(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("k"))
        .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("k"))),
      Some("""SELECT c_nationkey AS k FROM customer
             |EXCEPT ALL SELECT s_nationkey AS k FROM supplier""".stripMargin)),
    "q_set_intersect_all" -> Q(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("k"))),
      Some("""SELECT c_nationkey AS k FROM customer
             |INTERSECT ALL SELECT s_nationkey AS k FROM supplier""".stripMargin)),

    // M1 INSERT: append-as-union (at scale: an append to a partitioned
    // table — never a rewrite).
    "q_insert" -> Q(
      (s, d) => t(s, d, "region").select("r_regionkey", "r_name")
        .unionByName(s.range(1).select(
          lit(99).cast("int").as("r_regionkey"), lit("NEWREGION").as("r_name"))),
      Some("""SELECT r_regionkey, r_name FROM region
             |UNION ALL SELECT 99 AS r_regionkey, 'NEWREGION' AS r_name""".stripMargin)),

    // M2 UPDATE … SET … WHERE as copy-on-write projection
    // (reference client.py:483-546). At 100 TB: rewrite only affected
    // partitions; the transform itself is this same `when` projection.
    "q_update" -> Q(
      (s, d) => t(s, d, "orders").withColumn("o_orderpriority",
          when(col("o_orderstatus") === "F", lit("0-DONE"))
            .otherwise(col("o_orderpriority")))
        .select("o_orderkey", "o_orderpriority"),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN '0-DONE' ELSE o_orderpriority END
             |    AS o_orderpriority
             |FROM orders""".stripMargin)),

    // S3 DELETE as anti-filter (reference client.py:204-212).
    "q_delete" -> Q(
      (s, d) => t(s, d, "orders").filter(!(col("o_orderstatus") === "F"))
        .select("o_orderkey", "o_orderstatus"),
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderstatus <> 'F'""".stripMargin))
  )
}
