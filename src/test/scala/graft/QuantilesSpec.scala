package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** Exact range-selection quantiles vs driver-side sorted-index reference:
  * duplicates, negatives, skew, all probes, and the empty/null edges. */
class QuantilesSpec extends SparkSpec with PropertySampling {
  import spark.implicits._

  private def ref(xs: Seq[Long], p: Double): Long = {
    val sorted = xs.sorted
    sorted(math.floor(p * (xs.length - 1)).toInt)
  }

  test("matches sorted-index reference on random multisets incl. negatives") {
    val gen = org.scalacheck.Gen.listOfN(500,
      org.scalacheck.Gen.choose(-1000L, 1000L))
    val probs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    (1 to 3).foreach { seed =>
      val xs = sample(gen, seed + 900)
      val got = Quantiles.exactQuantiles(xs.toDF("v"), "v", probs)
        .as[(Double, Long)].collect().toMap
      probs.foreach { p =>
        assert(got(p) == ref(xs, p), s"seed=$seed p=$p: ${got(p)} != ${ref(xs, p)}")
      }
    }
  }

  test("heavy duplicates and single-value columns select the element") {
    val dup = (Seq.fill(400)(7L) ++ Seq.fill(100)(9L)).toDF("v")
    val got = Quantiles.exactQuantiles(dup, "v", Seq(0.5, 0.9))
      .as[(Double, Long)].collect().toMap
    assert(got(0.5) == 7L && got(0.9) == 9L, got.toString)
    val one = Seq.fill(10)(42L).toDF("v")
    assert(Quantiles.exactQuantiles(one, "v", Seq(0.5))
      .as[(Double, Long)].head()._2 == 42L)
  }

  test("exactQuantilesBy matches per-group sorted-index reference") {
    val gen = org.scalacheck.Gen.listOfN(600, for {
      g <- org.scalacheck.Gen.oneOf("a", "b", "c", "d")
      v <- org.scalacheck.Gen.choose(-500L, 500L)
    } yield (g, v))
    val probs = Seq(0.0, 0.5, 0.9, 1.0)
    (1 to 3).foreach { seed =>
      val xs = sample(gen, seed + 1200)
      val got = Quantiles.exactQuantilesBy(xs.toDF("g", "v"), "g", "v", probs)
        .as[(String, Double, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val byG = xs.groupBy(_._1)
      byG.foreach { case (g, rows) =>
        probs.foreach { p =>
          val exp = ref(rows.map(_._2), p)
          assert(got((g, p)) == exp, s"seed=$seed g=$g p=$p: ${got((g, p))} != $exp")
        }
      }
      assert(got.size == byG.size * probs.length)
    }
    // single-row groups close immediately with their own value
    val tiny = Seq(("x", 7L), ("y", -3L)).toDF("g", "v")
    val t = Quantiles.exactQuantilesBy(tiny, "g", "v", Seq(0.5))
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(t == Map("x" -> 7L, "y" -> -3L))
  }

  test("nulls ignored; empty input returns no rows") {
    val withNulls = Seq(Some(1L), None, Some(3L), None, Some(2L)).toDF("v")
    assert(Quantiles.exactQuantiles(withNulls, "v", Seq(1.0))
      .as[(Double, Long)].head()._2 == 3L)
    assert(Quantiles.exactQuantiles(
      Seq.empty[Long].toDF("v"), "v", Seq(0.5)).count() == 0L)
  }
}
