package graft

import org.apache.spark.sql.functions._
import graft.operators.TopK

/** Bounded-heap top-k-per-group vs the window-sort reference: random
  * multisets, tie determinism, small groups, and the no-Window plan. */
class TopKSpec extends SparkSpec with PropertySampling {
  import spark.implicits._

  test("matches row_number <= k on random data, incl. groups smaller than k") {
    val gen = org.scalacheck.Gen.listOfN(300, for {
      g <- org.scalacheck.Gen.oneOf("a", "b", "c", "d", "e")
      o <- org.scalacheck.Gen.choose(0L, 50L)
      id <- org.scalacheck.Gen.choose(0L, 1000000L)
    } yield (g, o, id))
    (1 to 3).foreach { seed =>
      // unique tie ids make "top k" a well-defined row set
      val xs = sample(gen, seed + 1500).distinctBy(_._3)
      val df = xs.toDF("g", "o", "id")
      val got = TopK.perGroup(df, Seq("g"), "o", "id", k = 4)
        .as[(String, Long, Long, Int)].collect().toSet
      val exp = xs.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (r._2, r._3)).take(4).zipWithIndex
          .map { case ((_, o, id), i) => (g, o, id, i + 1) }
      }.toSet
      assert(got == exp, s"seed=$seed: diff=${(got diff exp).take(3)} / ${(exp diff got).take(3)}")
    }
  }

  test("duplicate ord values resolve by the tiebreak, deterministically") {
    val df = Seq(("x", 1L, 30L), ("x", 1L, 10L), ("x", 1L, 20L), ("x", 0L, 99L))
      .toDF("g", "o", "id")
    val got = TopK.perGroup(df, Seq("g"), "o", "id", k = 3)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == Set(("x", 0L, 99L, 1), ("x", 1L, 10L, 2), ("x", 1L, 20L, 3)))
  }

  test("plan has no Window and no per-group Sort of the data") {
    val df = spark.range(1000)
      .select(pmod(col("id"), lit(7)).as("g"), col("id").as("o"), col("id").as("id"))
    val plan = TopK.perGroup(df, Seq("g"), "o", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"Window leaked into top-k plan:\n$plan")
  }
}
