package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AsOfJoin, RangeJoin, Resample}

/** Window functions, event-time bucketing, and the as-of join — SURVEY §2.5
  * (the reference has no window functions; its only sort is the KV sk sort)
  * and §2.7 (stream-shaped capabilities; the batch analogs here share the
  * same groupBy(window(...)) plan that Structured Streaming runs
  * incrementally — see graft.streaming.Streams).
  *
  * events.ts arrives as epoch-nano longs (see Tables.tsNanos); every
  * time-bucket query converts before bucketing so Spark and the DuckDB
  * oracle (which reads TIMESTAMP_NS natively) agree.
  */
object TimeSuite extends Suite {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "events").withColumn("ts_utc", Tables.tsNanos(col("ts")))

  def defs: Map[String, Q] = Map(

    // row_number with unique ordering key — deterministic top-3 per user.
    "win_row_number" -> Q(
      (s, d) => events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
        .filter(col("rn") <= 3)
        .select("user_id", "event_id", "rn"),
      Some("""SELECT user_id, event_id, rn FROM (
             |  SELECT user_id, event_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events)
             |WHERE rn <= 3""".stripMargin)),

    // running sum — frame order identical in both engines (unique tie-break),
    // rounded so float accumulation can't drift the hash.
    "win_running_sum" -> Q(
      (s, d) => Tables.t(s, d, "orders")
        .withColumn("running", sum(round(col("o_totalprice") * 100, 0).cast("long")).over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 100.0)
        .select("o_custkey", "o_orderkey", "running"),
      Some("""SELECT o_custkey, o_orderkey,
             |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running
             |FROM orders""".stripMargin)),

    // lag — previous event type per user.
    "win_lag" -> Q(
      (s, d) => events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
        .select("event_id", "user_id", "prev_type"),
      Some("""SELECT event_id, user_id,
             |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
             |FROM events""".stripMargin)),

    // ntile quantile binning (growth): 4 equal-frequency buckets of order
    // value within each priority class — the feature-binning shape.
    // Per-group sort (one shuffle on the partition key), unique tie-break.
    "win_ntile" -> Q(
      (s, d) => Tables.t(s, d, "orders")
        .withColumn("bin", ntile(4).over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice"), col("o_orderkey"))))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("bin").cast("long").as("bin")),
      Some("""SELECT o_orderkey, o_orderpriority,
             |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bin
             |FROM orders""".stripMargin)),

    // event-time tumbling bucket via date_trunc: partial agg map-side, tiny
    // final state — the streaming-safe aggregation shape.
    "time_window_agg" -> Q(
      (s, d) => events(s, d)
        .groupBy(date_trunc("hour", col("ts_utc")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value")),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |  count(*) AS cnt,
             |  sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Spark's window() operator (epoch-aligned 6h tumbling windows), the
    // exact groupBy Structured Streaming incrementalizes.
    "time_window_6h" -> Q(
      (s, d) => events(s, d)
        .groupBy(window(col("ts_utc"), "6 hours").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("w_start"), col("cnt")),
      Some("""SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP)
             |    AS w_start,
             |  count(*) AS cnt
             |FROM events GROUP BY 1""".stripMargin)),

    // session windows (gap-based) — Spark's session_window merges events
    // whose gap to the session end is < 6h; end = last event + gap. The
    // oracle reconstructs identical sessions via the lag/cumsum idiom.
    // This is the batch twin of Streams.sessionize (same semantics,
    // flatMapGroupsWithState holds the open session incrementally).
    "time_session_agg" -> Q(
      (s, d) => events(s, d)
        .groupBy(col("user_id"), session_window(col("ts_utc"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n_events")),
      Some("""WITH m AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |              >= INTERVAL 6 HOUR
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m)
             |SELECT user_id, min(ts) AS s_start,
             |  max(ts) + INTERVAL 6 HOUR AS s_end, count(*) AS n_events
             |FROM s GROUP BY user_id, sid""".stripMargin)),

    // interval join without an equi-key (operators.RangeJoin): purchases
    // within 10 minutes after each click, bucketized so Spark plans a
    // shuffled equi-join on the bucket id instead of a nested-loop join.
    "q_interval_join" -> Q(
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("ts_utc"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("ts_utc").as("p_ts"))
        RangeJoin.intervalJoin(clicks, purchases, "ts_utc", "p_ts",
            beforeUs = 0L, afterUs = 10L * 60 * 1000 * 1000)
          .groupBy(col("event_id")).agg(count(lit(1)).as("n_purch"))
      },
      Some("""SELECT c.event_id, count(*) AS n_purch
             |FROM events c JOIN events p
             |  ON c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
             |GROUP BY c.event_id""".stripMargin)),

    // As-of join: latest order at-or-before each event, per user/customer.
    "asof_join" -> Q(
      (s, d) => AsOfJoin.asOf(
        left = events(s, d).select("event_id", "user_id", "ts_utc"),
        right = Tables.t(s, d, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts_utc", rightTime = "o_orderdate",
        payload = Map("o_orderdate" -> "last_order_date"))
        .select("event_id", "last_order_date"),
      Some("""SELECT e.event_id, max(o.o_orderdate) AS last_order_date
             |FROM events e
             |LEFT JOIN orders o
             |  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             |GROUP BY e.event_id""".stripMargin)),

    // As-of with tolerance (round-7 growth — pandas merge_asof's
    // `tolerance`): the latest at-or-before match comes out NULL when it
    // is more than 30 days old. The gate is one scan-side comparison on
    // the carried match time; equivalence with the windowed oracle holds
    // because the LATEST at-or-before row is the closest — if it misses
    // the tolerance window, every earlier row does too.
    "asof_tolerance" -> Q(
      (s, d) => AsOfJoin.asOf(
        left = events(s, d).select("event_id", "user_id", "ts_utc"),
        right = Tables.t(s, d, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts_utc", rightTime = "o_orderdate",
        payload = Map("o_orderdate" -> "last_order_date"),
        tolerance = Some(30L * 86400))
        .select("event_id", "last_order_date"),
      Some("""SELECT e.event_id, max(o.o_orderdate) AS last_order_date
             |FROM events e
             |LEFT JOIN orders o
             |  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             |  AND o.o_orderdate >= e.ts - INTERVAL 2592000 SECOND
             |GROUP BY e.event_id""".stripMargin)),

    // Forward as-of join: earliest order at-or-after each event — the
    // "next scheduled thing" lookup, same union+window plan reversed.
    "asof_forward" -> Q(
      (s, d) => AsOfJoin.asOfForward(
        left = events(s, d).select("event_id", "user_id", "ts_utc"),
        right = Tables.t(s, d, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts_utc", rightTime = "o_orderdate",
        payload = Map("o_orderdate" -> "next_order_date"))
        .select("event_id", "next_order_date"),
      Some("""SELECT e.event_id, min(o.o_orderdate) AS next_order_date
             |FROM events e
             |LEFT JOIN orders o
             |  ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
             |GROUP BY e.event_id""".stripMargin)),

    // Funnel analysis (growth — product-analytics shape the reference has
    // no analog for): per user, the furthest stage of the ordered
    // view → click → purchase cascade, each step strictly after the
    // previous step's FIRST occurrence. Three min-aggregations chained by
    // equi-joins (no window over the whole event log, no self-join blowup);
    // timestamps compared as raw epoch-nano longs so neither engine
    // truncates (Spark TIMESTAMP is micros).
    "time_funnel" -> Q(
      (s, d) => {
        val ev = Tables.t(s, d, "events").select(
          col("user_id"), col("event_type"), col("ts"))
        def stepAfter(typ: String, prev: org.apache.spark.sql.DataFrame,
                      prevT: String, as: String) =
          ev.filter(col("event_type") === typ)
            .join(prev, "user_id").filter(col("ts") > col(prevT))
            .groupBy("user_id").agg(min(col("ts")).as(as))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val c = stepAfter("click", v, "t1", "t2")
        val p = stepAfter("purchase", c.select("user_id", "t2"), "t2", "t3")
        ev.select("user_id").distinct()
          .join(v.select("user_id", "t1"), Seq("user_id"), "left")
          .join(c.select("user_id", "t2"), Seq("user_id"), "left")
          .join(p.select("user_id", "t3"), Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
              .when(col("t1").isNotNull, 1L).otherwise(0L).as("funnel_stage"))
      },
      Some("""WITH v AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
             |           WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
             |      FROM events e JOIN v USING (user_id)
             |      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t1
             |      GROUP BY 1),
             |p AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
             |      FROM events e JOIN c USING (user_id)
             |      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t2
             |      GROUP BY 1)
             |SELECT u.user_id,
             |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             |    AS funnel_stage
             |FROM (SELECT DISTINCT user_id FROM events) u
             |LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
             |LEFT JOIN p USING (user_id)""".stripMargin)),

    // PIVOT (Spark's relational pivot operator — one shuffle with the
    // pivot values folded into the aggregate, NOT one pass per column).
    // Values enumerated explicitly so no pre-scan; absent combinations
    // coalesce to 0 to match the conditional-count mirror.
    "time_pivot" -> Q(
      (s, d) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val p = Tables.t(s, d, "events")
          .groupBy(col("user_id")).pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      },
      Some("""SELECT user_id,
             |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
             |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
             |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
             |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
             |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error
             |FROM events GROUP BY user_id""".stripMargin)),

    // Gap-filled hourly resample (operators.Resample.gapFill): dense
    // (event_type, hour) grid over the global span with zero-filled empty
    // buckets — the model-feature-grid shape. The tick axis is generated
    // in-plan from a 1-row bounds aggregate (range-sized, not data-sized);
    // hour = integer division of epoch-nanos so both engines bucket
    // identically.
    // Truncated EWMA (α=1/2 over the last 8 events per user): all
    // arithmetic is exact power-of-two scaling + identically-ordered left
    // folds, so the smoothed doubles hash-match bit-for-bit — no float
    // tolerance (see Resample.ewma).
    "time_ewma" -> Q(
      (s, d) => Resample.ewma(
        Tables.t(s, d, "events").select(col("user_id"), col("event_id"),
          col("value")),
        "user_id", "event_id", "value", window = 8)
        .select("user_id", "event_id", "ewma"),
      Some(s"""WITH v AS (SELECT user_id, event_id,
              |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
              |                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
              |      AS vals
              |  FROM events)
              |SELECT user_id, event_id, ${Resample.ewmaSql("vals")} AS ewma
              |FROM v""".stripMargin)),

    // OHLC candlestick downsample (growth): per (type, 6h bucket) open/
    // high/low/close in cents, open/close anchored on the unique event_id
    // (deterministic where first()/last() are not). One partial-agg
    // shuffle — the market-data rollup shape at any scale.
    "time_ohlc" -> Q(
      (s, d) => Resample.ohlc(
        Tables.t(s, d, "events").select(col("event_type"),
          expr("ts div 21600000000000").as("tick"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          col("event_id")),
        "event_type", "tick", "cents", "event_id"),
      Some("""SELECT event_type, epoch_ns(ts) // 21600000000000 AS tick,
             |  arg_min(CAST(round(value * 100, 0) AS BIGINT), event_id) AS open,
             |  max(CAST(round(value * 100, 0) AS BIGINT)) AS high,
             |  min(CAST(round(value * 100, 0) AS BIGINT)) AS low,
             |  arg_max(CAST(round(value * 100, 0) AS BIGINT), event_id) AS close,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1, 2""".stripMargin)),

    "time_gapfill" -> Q(
      (s, d) => Resample.gapFill(
        Tables.t(s, d, "events").select(col("event_type"),
          expr("ts div 3600000000000").as("h"), col("value")),
        "event_type", "h", "value"),
      Some("""WITH e AS (SELECT event_type,
             |    epoch_ns(ts) // 3600000000000 AS tick,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |hs AS (SELECT unnest(generate_series((SELECT min(tick) FROM e),
             |                                     (SELECT max(tick) FROM e))) AS tick),
             |ty AS (SELECT DISTINCT event_type FROM e),
             |c AS (SELECT event_type, tick, count(*) AS cnt, sum(cents) AS sc
             |      FROM e GROUP BY 1, 2)
             |SELECT ty.event_type, hs.tick,
             |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
             |  coalesce(c.sc, 0) / 100.0 AS sum_value
             |FROM hs CROSS JOIN ty
             |LEFT JOIN c ON c.tick = hs.tick AND c.event_type = ty.event_type"""
        .stripMargin)),

    // Forward fill (LOCF) over the gap-filled grid: empty buckets carry
    // the most recent non-empty bucket's sum; buckets before a group's
    // first observation stay NULL. One window pass, single-value state.
    "time_gapfill_ffill" -> Q(
      (s, d) => Resample.forwardFill(
        Resample.gapFill(
          Tables.t(s, d, "events").select(col("event_type"),
            expr("ts div 3600000000000").as("h"), col("value")),
          "event_type", "h", "value"),
        "event_type", "tick", "sum_value", "cnt"),
      Some("""WITH e AS (SELECT event_type,
             |    epoch_ns(ts) // 3600000000000 AS tick,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |hs AS (SELECT unnest(generate_series((SELECT min(tick) FROM e),
             |                                     (SELECT max(tick) FROM e))) AS tick),
             |ty AS (SELECT DISTINCT event_type FROM e),
             |c AS (SELECT event_type, tick, count(*) AS cnt, sum(cents) AS sc
             |      FROM e GROUP BY 1, 2),
             |g AS (SELECT ty.event_type, hs.tick,
             |    CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
             |    coalesce(c.sc, 0) / 100.0 AS sum_value
             |  FROM hs CROSS JOIN ty
             |  LEFT JOIN c ON c.tick = hs.tick AND c.event_type = ty.event_type)
             |SELECT event_type, tick, cnt,
             |  last_value(CASE WHEN cnt > 0 THEN sum_value END IGNORE NULLS)
             |    OVER (PARTITION BY event_type ORDER BY tick
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sum_value
             |FROM g""".stripMargin)),

    // Cohort retention (growth): cohort = each user's first active week,
    // cell (cohort, offset) = distinct users from that cohort active
    // offset weeks later. Weeks computed by INTEGER division of epoch-nano
    // timestamps (day = ns div 86400e9, week = day div 7) — no calendar
    // functions, so both engines bucket identically regardless of
    // week-start or timezone conventions.
    "time_retention" -> Q(
      (s, d) => {
        val ev = Tables.t(s, d, "events").select(col("user_id"),
          expr("(ts div 86400000000000) div 7").as("week"))
        val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort"))
        ev.join(cohort, "user_id")
          .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH w AS (SELECT user_id,
             |    (epoch_ns(ts) // 86400000000000) // 7 AS week FROM events),
             |c AS (SELECT user_id, min(week) AS cohort FROM w GROUP BY 1)
             |SELECT cohort, week - cohort AS week_offset,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM w JOIN c USING (user_id)
             |GROUP BY cohort, week_offset""".stripMargin)),

    // Z-SCORE outlier flagging per (event_type, day) — |x − mean| > 3σ in
    // EXACT integer arithmetic over cent-scaled values: the inequality is
    // cross-multiplied to (n·x − Σ)² > 9·(n·Σx² − Σ²), no division and no
    // float, so the flagged set hash-matches where a (x-avg)/stddev
    // comparison could flip rows one ULP from the threshold. Plan: one
    // partial-agg shuffle for the per-group stats, broadcast back, filter
    // scan-side (operators.Anomaly scaladoc has the overflow contract).
    "time_zscore" -> Q(
      (s, d) => {
        val ev = Tables.t(s, d, "events").select(col("event_id"),
          col("event_type"), expr("ts div 86400000000000").as("day"),
          round(col("value") * 100).cast("long").as("c"))
        graft.operators.Anomaly.zscoreOutliers(
            ev, Seq("event_type", "day"), "c", k = 3)
          .select("event_id", "event_type", "c")
      },
      Some(s"""WITH e AS (SELECT event_id, event_type,
              |    epoch_ns(ts) // 86400000000000 AS day,
              |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
              |g AS (SELECT event_type, day, CAST(count(c) AS BIGINT) AS n,
              |    sum(c) AS s, sum(c * c) AS q
              |  FROM e GROUP BY 1, 2)
              |SELECT event_id, event_type, c
              |FROM e JOIN g USING (event_type, day)
              |WHERE ${graft.operators.Anomaly.predicateSql("n", "s", "q", "c", 3)}""".stripMargin))
  )
}
