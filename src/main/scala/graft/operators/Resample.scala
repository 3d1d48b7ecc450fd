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
}
