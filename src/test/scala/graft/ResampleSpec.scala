package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Gap-fill + forward-fill resampling: dense grid shape, zero-fill
  * semantics, LOCF carry rules, and the no-driver-collect plan contract. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // group a: ticks 2 and 5 (gap 3..4); group b: tick 3 only; span 2..5
  private def fixture = Seq(
    ("a", 2L, 1.0), ("a", 2L, 3.0), ("a", 5L, 10.0), ("b", 3L, 7.0)
  ).toDF("g", "tick", "v")

  test("gapFill emits the full span × groups grid with zero-filled gaps") {
    val out = Resample.gapFill(fixture, "g", "tick", "v")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("a", 2L, 2L, 4.0), ("a", 3L, 0L, 0.0), ("a", 4L, 0L, 0.0),
      ("a", 5L, 1L, 10.0),
      ("b", 2L, 0L, 0.0), ("b", 3L, 1L, 7.0), ("b", 4L, 0L, 0.0),
      ("b", 5L, 0L, 0.0)))
  }

  test("forwardFill carries the last observed value; leading gaps stay null") {
    val filled = Resample.forwardFill(
        Resample.gapFill(fixture, "g", "tick", "v"),
        "g", "tick", "sum_value", "cnt")
      .select("g", "tick", "sum_value")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(filled == Set(
      ("a", 2L, Some(4.0)), ("a", 3L, Some(4.0)), ("a", 4L, Some(4.0)),
      ("a", 5L, Some(10.0)),
      ("b", 2L, None), ("b", 3L, Some(7.0)), ("b", 4L, Some(7.0)),
      ("b", 5L, Some(7.0))))
  }

  test("single-tick input yields one bucket per group; empty groups impossible") {
    val one = Seq(("x", 9L, 2.5)).toDF("g", "tick", "v")
    val out = Resample.gapFill(one, "g", "tick", "v")
      .as[(String, Long, Long, Double)].collect().toList
    assert(out == List(("x", 9L, 1L, 2.5)))
  }

  test("scaffold is generated in-plan: no CollectLimit / driver round-trip") {
    val plan = Resample.gapFill(fixture, "g", "tick", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CollectLimit"), plan)
    // the groups side of the scaffold cross join is broadcast
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("ewma: hand-computed weights, constant invariance, truncation") {
    val d = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 1L, 7.0)).toDF("g", "t", "v")
    val got = Resample.ewma(d, "g", "t", "v", window = 2)
      .select("g", "t", "ewma").as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // window 2, α=1/2 normalized: first row = v; later = (2·v_t + v_{t-1})/3
    // (the operator rounds to 6 decimals for display stability)
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-6
    assert(got(("a", 1L)) == 1.0)
    assert(near(got(("a", 2L)), (2 * 2.0 + 1.0) / 3))
    assert(near(got(("a", 3L)), (2 * 3.0 + 2.0) / 3))
    assert(got(("b", 1L)) == 7.0) // single row: weight sum normalizes to v
    // constant series: ewma == the constant at every row, any window
    val const = (1L to 20L).map(i => ("c", i, 4.25)).toDF("g", "t", "v")
    val cs = Resample.ewma(const, "g", "t", "v", window = 8)
      .select("ewma").as[Double].collect()
    assert(cs.forall(_ == 4.25), cs.mkString(","))
    // truncation: rows beyond the window cannot influence the result —
    // an early outlier must produce identical ewma from row window+1 on
    val spike = (("s", 0L, 1e9) +: (1L to 10L).map(i => ("s", i, 1.0)))
      .toDF("g", "t", "v")
    val flat = (1L to 10L).map(i => ("s", i, 1.0)).toDF("g", "t", "v")
    def tailVals(df: org.apache.spark.sql.DataFrame) =
      Resample.ewma(df, "g", "t", "v", window = 4)
        .filter(col("t") >= 5).orderBy("t")
        .select("ewma").as[Double].collect().toSeq
    assert(tailVals(spike) == tailVals(flat), "window truncation leaked")
  }

  test("zscoreOutliers flags exactly |z| > k; σ=0 and NULLs safe; stats broadcast") {
    import graft.operators.Anomaly
    // group a: 20 values near 100 plus one 10000 spike — only the spike
    // has |z| > 3; group b all-equal (σ = 0) flags nothing; NULL ignored
    val a = (1L to 20L).map(i => ("a", i, Some(100L + i))) :+ (("a", 99L, Some(10000L)))
    val b = (1L to 5L).map(i => ("b", 100L + i, Some(7L)))
    val n = Seq(("a", 98L, Option.empty[Long]))
    val df = (a ++ b ++ n).toDF("g", "id", "v")
    val flagged = Anomaly.zscoreOutliers(df, Seq("g"), "v", k = 3)
      .select("id").as[Long].collect().toSet
    assert(flagged == Set(99L), s"flagged $flagged")
    // reference check vs float z-scores on group a
    val vals = a.map(_._3.get.toDouble)
    val mean = vals.sum / vals.size
    val sd = math.sqrt(vals.map(x => (x - mean) * (x - mean)).sum / vals.size)
    val refFlag = a.filter(r => math.abs(r._3.get - mean) > 3 * sd).map(_._2).toSet
    assert(refFlag == Set(99L), s"fixture degenerate: $refFlag")
    // per-group stats ride a broadcast join — the fact side never
    // re-shuffles on the group key for the probe
    val plan = Anomaly.zscoreOutliers(df, Seq("g"), "v", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("ohlc: order-anchored open/close, extremes, partition-invariance") {
    // bucket 1 of g: events (ord, v) = (10, 5), (11, 9), (12, 2), (13, 7)
    //   → open 5 (ord 10), high 9, low 2, close 7 (ord 13)
    val df = Seq(
      ("g", 1L, 5L, 10L), ("g", 1L, 9L, 11L), ("g", 1L, 2L, 12L),
      ("g", 1L, 7L, 13L), ("g", 2L, 4L, 20L), ("h", 1L, 6L, 15L)
    ).toDF("grp", "tick", "v", "ord")
    def run(d: org.apache.spark.sql.DataFrame) =
      Resample.ohlc(d, "grp", "tick", "v", "ord")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val got = run(df)
    assert(got == Set(
      ("g", 1L, 5L, 9L, 2L, 7L, 4L),
      ("g", 2L, 4L, 4L, 4L, 4L, 1L),
      ("h", 1L, 6L, 6L, 6L, 6L, 1L)), s"ohlc: $got")
    assert(run(df.repartition(7)) == got, "ohlc not partition-invariant")
  }
}
