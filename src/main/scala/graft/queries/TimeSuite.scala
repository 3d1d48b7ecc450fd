package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.AsOfJoin

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
             |GROUP BY e.event_id""".stripMargin))
  )
}
