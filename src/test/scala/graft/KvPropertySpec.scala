package graft

import org.scalacheck.Gen
import graft.kv.KvStore

/** SURVEY §5 property strategy: every KV query shape ≡ brute-force filter
  * over the collected rows, on randomized datasets and bounds (raw
  * ScalaCheck generators, deterministic seeds). */
class KvPropertySpec extends SparkSpec with PropertySampling {
  import spark.implicits._


  private val key = Gen.oneOf("alpha", "beta", "gamma", "delta", "ep")
  private val rowsGen = Gen.listOfN(40, for {
    pk <- key; sk1 <- key; sk2 <- Gen.choose(0, 9)
  } yield (pk, s"$sk1-$sk2", s"$pk/$sk1-$sk2"))

  test("D1/D3/D4 ≡ brute force on random datasets") {
    (1 to 8).foreach { seed =>
      val data = sample(rowsGen, seed)
      val pk = sample(key, seed + 100)
      val skp = sample(key, seed + 200)
      val lo0 = sample(Gen.choose(0, 9), seed + 300)
      val hi0 = sample(Gen.choose(0, 9), seed + 400)
      val (lo, hi) = (math.min(lo0, hi0), math.max(lo0, hi0))
      val store = KvStore(data.toDF("pk", "sk", "value"))

      val d1 = store.queryBegins(pk, skp).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val d1Exp = data.filter(r => r._1 == pk && r._2.startsWith(skp))
        .map(r => (r._1, r._2)).sortBy(_._2)
      assert(d1 == d1Exp, s"D1 seed=$seed pk=$pk skp=$skp")

      val (skLo, skHi) = (s"$skp-$lo", s"$skp-$hi")
      val d3 = store.queryBetween(pk, skLo, skHi).collect().map(_.getString(1)).toSeq
      val d3Exp = data.filter(r => r._1 == pk && r._2 >= skLo && r._2 <= skHi)
        .map(_._2).sorted
      assert(d3 == d3Exp, s"D3 seed=$seed")

      val d4 = store.bothBetween("alpha", pk, skLo, skHi).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val d4Exp = data.filter(r => r._1 >= "alpha" && r._1 <= pk &&
        r._2 >= skLo && r._2 <= skHi).map(r => (r._1, r._2))
      assert(d4.sortBy(x => (x._2, x._1)) == d4Exp.sortBy(x => (x._2, x._1)),
        s"D4 seed=$seed")
    }
  }

  test("inner join ≡ nested loop on random datasets") {
    val pairsGen = Gen.listOfN(30, for {
      k <- Gen.choose(0, 9); v <- Gen.alphaStr.map(_.take(4))
    } yield (k, v))
    (1 to 6).foreach { seed =>
      val l = sample(pairsGen, seed)
      val r = sample(pairsGen, seed + 1000)
      val lDf = l.toDF("k", "lv"); val rDf = r.toDF("k2", "rv")
      val got = lDf.join(rDf, lDf("k") === rDf("k2"))
        .select("k", "lv", "rv").as[(Int, String, String)].collect().sorted.toSeq
      val exp = (for { (lk, lv) <- l; (rk, rv) <- r if lk == rk } yield (lk, lv, rv)).sorted
      assert(got == exp, s"join seed=$seed")
    }
  }
}
