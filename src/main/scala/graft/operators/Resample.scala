package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket an event stream onto a dense, regular
  * grid — emitting EMPTY buckets for gaps — and optionally carry the last
  * observed value forward across them (LOCF). The reference has no
  * time-series surface at all (SURVEY §2.3); this is driver-mandated
  * growth for the event-analytics shape every monitoring/feature pipeline
  * needs: a model-feature grid wants one row per (entity, tick) whether or
  * not anything happened in that tick.
  *
  * Scale posture: the dense scaffold is `span/step × |groups|` rows —
  * a RANGE-driven size, independent of event count, generated in-plan
  * (`sequence` + `explode` from a 1-row bounds aggregate, no driver
  * collect). The per-bucket aggregate is one partial-agg shuffle of the
  * facts; the scaffold join is a second shuffle keyed on (group, bucket)
  * whose left side is the (small) grid. Nothing here is proportional to
  * events × buckets.
  */
object Resample {

  /** OHLC downsample (the candlestick shape): per (group, tick) open /
    * high / low / close of an integral value, where open/close are the
    * values at the MINIMUM/MAXIMUM of `ordCol` within the bucket
    * (`min_by`/`max_by` against a unique order key — ties impossible, so
    * the result is deterministic where first()/last() would not be).
    * One partial-agg shuffle on (group, tick); value should be integral
    * (cents) so both engines agree bit-for-bit. */
  def ohlc(events: DataFrame, groupCol: String, tickCol: String,
           valueCol: String, ordCol: String): DataFrame =
    events.groupBy(col(groupCol), col(tickCol))
      .agg(min_by(col(valueCol), col(ordCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(ordCol)).as("close"),
        count(lit(1)).as("n"))

  /** Dense per-(group, bucket) counts+sums over `[min(tick), max(tick)]`
    * of the input, step 1: every group carries every bucket in the global
    * span, zero-filled where it had no events. `tick` must already be an
    * integral bucket index (e.g. `ts div 3_600e9` for hours — integer
    * bucketing keeps Spark and external oracles bit-identical, no calendar
    * math). Returns (groupCol, tick, cnt, sum_value).
    */
  def gapFill(events: DataFrame, groupCol: String, tickCol: String,
              valueCol: String): DataFrame = {
    val ev = events.select(col(groupCol), col(tickCol).cast("long").as("tick"),
      col(valueCol))
    // 1-row global bounds → in-plan dense tick axis (no collect; the
    // cross join is a 1-row broadcast nested loop, i.e. free).
    val bounds = ev.agg(min("tick").as("t0"), max("tick").as("t1"))
    val ticks = bounds.select(explode(sequence(col("t0"), col("t1"))).as("tick"))
    val groups = ev.select(groupCol).distinct()
    val scaffold = ticks.crossJoin(broadcast(groups))
    // cents-long sum so the zero-fill and the facts agree bit-for-bit in
    // any engine (see TimeSuite's rounding gotcha)
    val agg = ev.groupBy(col(groupCol), col("tick"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col(valueCol) * 100, 0).cast("long")).as("sum_cents"))
    scaffold.join(agg, Seq(groupCol, "tick"), "left")
      .select(col(groupCol), col("tick"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        (coalesce(col("sum_cents"), lit(0L)) / 100.0).as("sum_value"))
  }

  /** Last-observation-carried-forward over a gap-filled grid: for each
    * group in tick order, replace `valueCol` in empty buckets (where
    * `presentCol` = 0) with the most recent non-empty bucket's value;
    * buckets before the first observation stay NULL. One window pass per
    * group — the same partitioned-sort shape as win_running_sum, state is
    * a single carried value. */
  def forwardFill(grid: DataFrame, groupCol: String, tickCol: String,
                  valueCol: String, presentCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val observed = when(col(presentCol) > 0, col(valueCol))
    grid.withColumn(valueCol, last(observed, ignoreNulls = true).over(w))
  }

  /** Truncated exponential moving average (α = 1/2, normalized over the
    * available terms — the smoothing every monitoring/feature pipeline
    * runs): per group, in `ordCol` order, over the last `window` rows,
    *
    *   ewma = Σ_j v_{t-j} · 2^{-j}  /  Σ_j 2^{-j}   (j = 0 .. window-1)
    *
    * Truncation does two jobs at once: the window frame bounds state
    * (an untruncated EWMA drags the whole history into every row), and
    * 2^{-j} with j < 64 keeps every weight an EXACT binary scaling —
    * multiplication and division by powers of two are exact in IEEE
    * doubles, the numerator/denominator fold LEFT over the frame array in
    * both engines, and every add/divide is correctly rounded, so the
    * result is bit-identical across engines with no float-tolerance
    * caveat (round(6) only stabilizes display).
    *
    * Same partitioned-sort shape as win_running_sum: one bounded frame
    * per key, no global sort. Appends `outCol` to the input rows. */
  def ewma(events: DataFrame, groupCol: String, ordCol: String,
           valueCol: String, window: Int, outCol: String = "ewma"): DataFrame = {
    require(window >= 1 && window <= 62, s"window must be in 1..62, got $window")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(ordCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val vals = collect_list(col(valueCol)).over(w) // frame order: oldest first
    val n = size(col("graft_ewma_vals"))
    // element i (0-based idx = i-1) has age n-i ⇒ weight 2^-(n-i)… the
    // NEWEST (i = n) gets 2^0. Scale by integer shifts, not pow().
    // 2^(n-i) via pow: exact for integral exponents below the window cap
    // (the value is an exactly-representable power of two and pow is
    // correctly rounded in both engines)
    def shifted(expr: Column => Column): Column =
      aggregate(sequence(lit(1), n),
        lit(0.0),
        (acc, i) => acc + expr(i) / pow(lit(2.0), (n - i).cast("double")))
    events.withColumn("graft_ewma_vals", vals)
      .withColumn(outCol,
        round(shifted(i => element_at(col("graft_ewma_vals"), i)) /
          shifted(_ => lit(1.0)), 6))
      .drop("graft_ewma_vals")
  }

  /** DuckDB mirror of [[ewma]] given a window-collected list column
    * `vals` (oldest first): the identical left fold and exact power-of-two
    * scaling. */
  def ewmaSql(vals: String): String = {
    def fold(term: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, len($vals) + 1),
         |    i -> $term / CAST(1::BIGINT << (len($vals) - i) AS DOUBLE))),
         |  (acc, x) -> acc + x)""".stripMargin
    s"round(${fold(s"$vals[i]")} / ${fold("1.0")}, 6)"
  }
}
