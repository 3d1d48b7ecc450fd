package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

/** Bucketized interval join vs a brute-force range filter — boundary
  * inclusivity and bucket-crossing pairs must match exactly. Plus as-of
  * join payload-type corners. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("as-of join carries an unorderable MapType payload (tie-break skips it)") {
    val left = Seq(("k1", 100L), ("k1", 200L)).toDF("k", "t")
    val right = Seq(("k1", 50L, Map("a" -> 1)), ("k1", 150L, Map("b" -> 2)))
      .toDF("rk", "rt", "m")
    // pre-fix this failed analysis: the tie-break struct included the map
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
      payload = Map("m" -> "m_out"))
      .orderBy("t").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Map[String, Int]]("m_out") == Map("a" -> 1))
    assert(out(1).getAs[Map[String, Int]]("m_out") == Map("b" -> 2))
  }

  test("as-of tolerance: stale matches come out NULL; boundary is inclusive") {
    val left = Seq(("k1", 100L), ("k1", 200L), ("k1", 300L)).toDF("k", "t")
    val right = Seq(("k1", 95L, "x"), ("k1", 150L, "y")).toDF("rk", "rt", "v")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
      payload = Map("v" -> "v_out"), tolerance = Some(50L))
      .orderBy("t").collect().map(r => r.getLong(1) -> Option(r.getString(2)))
    // 100 matches 95 (gap 5); 200 matches 150 at the inclusive boundary
    // (gap 50); 300's latest match (150) is 150 away — NULL, like no match
    assert(out.toSeq == Seq(100L -> Some("x"), 200L -> Some("y"),
      300L -> None), out.mkString(", "))
    // forward mode gates the same way
    val fwd = AsOfJoin.asOfForward(left, right, "k", "rk", "t", "rt",
      payload = Map("v" -> "v_out"), tolerance = Some(50L))
      .orderBy("t").collect().map(r => r.getLong(1) -> Option(r.getString(2)))
    assert(fwd.toSeq == Seq(100L -> Some("y"), 200L -> None, 300L -> None),
      fwd.mkString(", "))
  }

  test("interval join matches brute force, both window edges inclusive") {
    // window = [-5s, +10s]; bucket width 15s — pairs straddle buckets
    val left = Seq((1L, ts(10000)), (2L, ts(29999)), (3L, ts(45000)))
      .toDF("lid", "lt")
    val right = Seq((10L, ts(5000)), (11L, ts(20000)), (12L, ts(20001)),
      (13L, ts(39999)), (14L, ts(40000)), (15L, ts(55000)), (16L, ts(4999)))
      .toDF("rid", "rt")
    val got = RangeJoin.intervalJoin(left, right, "lt", "rt",
        beforeUs = 5000000L, afterUs = 10000000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val exp = left.as[(Long, Timestamp)].collect().flatMap { case (lid, lt) =>
      right.as[(Long, Timestamp)].collect().collect {
        case (rid, rt) if rt.getTime >= lt.getTime - 5000 &&
          rt.getTime <= lt.getTime + 10000 => (lid, rid)
      }
    }.toSet
    assert(got == exp)
    // sanity on the fixture: edges actually exercised
    assert(exp.contains((1L, 10L)) && !exp.contains((1L, 16L)))
    // 39999 ≤ 29999+10000 is the inclusive upper edge; 40000 is 1ms outside
    assert(exp.contains((2L, 13L)) && !exp.contains((2L, 14L)))
  }

  test("each qualifying pair appears exactly once (no bucket double-count)") {
    val left = (0L until 50L).map(i => (i, ts(i * 1000))).toDF("lid", "lt")
    val right = (0L until 50L).map(i => (i + 100, ts(i * 1000 + 500))).toDF("rid", "rt")
    val joined = RangeJoin.intervalJoin(left, right, "lt", "rt",
      beforeUs = 3000000L, afterUs = 3000000L)
    val n = joined.count()
    val distinctN = joined.select("lid", "rid").distinct().count()
    assert(n == distinctN, s"pairs duplicated: $n vs $distinctN")
  }

  test("plan is a shuffled equi-join on the bucket, not a nested loop") {
    val left = Seq((1L, ts(1000))).toDF("lid", "lt")
    val right = Seq((2L, ts(2000))).toDF("rid", "rt")
    val plan = RangeJoin.intervalJoin(left, right, "lt", "rt", 1000000L, 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("forward as-of ≡ brute-force min-following, inclusive at equal t") {
    val left = Seq(("k1", 100L), ("k1", 150L), ("k1", 200L), ("k2", 10L),
      ("k3", 5L)).toDF("k", "t")
    // k1 has rows before/at/after; k2's only right row is in the past
    // (no match); k3 has none at all (null)
    val right = Seq(("k1", 150L, "a"), ("k1", 150L, "b"), ("k1", 300L, "c"),
      ("k2", 5L, "d")).toDF("rk", "rt", "v")
    val got = AsOfJoin.asOfForward(left, right, "k", "rk", "t", "rt",
        payload = Map("v" -> "v_out"))
      .select("k", "t", "v_out").as[(String, Long, String)].collect().toSet
    // at t=100 and t=150 the earliest following is rt=150; the tie on
    // (k1,150) resolves to the SMALLEST payload tuple "a"
    assert(got == Set(("k1", 100L, "a"), ("k1", 150L, "a"),
      ("k1", 200L, "c"), ("k2", 10L, null), ("k3", 5L, null)))
  }

  test("forward and backward as-of agree under time reversal") {
    val left = (0L until 40L).map(i => ("k" + i % 3, i * 7 % 100)).toDF("k", "t")
    val right = (0L until 30L).map(i => ("k" + i % 3, i * 11 % 100, i))
      .toDF("rk", "rt", "p")
    val fwd = AsOfJoin.asOfForward(left, right, "k", "rk", "t", "rt",
        Map("rt" -> "m")).select("k", "t", "m")
      .as[(String, Long, Option[Long])].collect().toSet
    // reverse time on both sides: forward(t) == -backward(-t)
    val bwd = AsOfJoin.asOf(
        left.withColumn("t", -col("t")),
        right.withColumn("rt", -col("rt")), "k", "rk", "t", "rt",
        Map("rt" -> "m"))
      .select(col("k"), -col("t"), -col("m"))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(fwd == bwd)
  }
}
