package graft

import org.apache.spark.sql.functions._
import graft.sketch.Kmv

/** KMV sketch invariants beyond the oracle queries: exact mergeability
  * (the union's sketch, not an approximation of it), prefix nesting
  * across k, estimator error at scale, and the no-Window/bounded-fold
  * plan shape. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def ids(from: Long, until: Long) =
    spark.range(from, until).select(col("id"))

  test("merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly") {
    val a = ids(0, 5000)
    val b = ids(3000, 9000) // overlapping halves
    val k = 128
    val skA = Kmv.sketch(a.withColumn("g", lit("x")), Seq("g"),
      Kmv.kmvHash(col("id")), k)
    val skB = Kmv.sketch(b.withColumn("g", lit("x")), Seq("g"),
      Kmv.kmvHash(col("id")), k)
    val merged = Kmv.merge(skA.unionByName(skB), Seq("g"), "kmv", k)
      .select("kmv").as[Seq[Long]].head()
    val direct = Kmv.sketch(a.unionByName(b).withColumn("g", lit("x")),
      Seq("g"), Kmv.kmvHash(col("id")), k)
      .select("kmv").as[Seq[Long]].head()
    assert(merged == direct, "merged sketch != union's direct sketch")
  }

  test("smaller k is a strict prefix of larger k (same data)") {
    val d = ids(0, 4000)
    def sk(k: Int): Seq[Long] =
      Kmv.sketch(d, Seq.empty, Kmv.kmvHash(col("id")), k)
        .select("kmv").as[Seq[Long]].head()
    val s32 = sk(32); val s128 = sk(128)
    assert(s128.take(32) == s32, "k=32 sketch is not the k=128 prefix")
    assert(s128 == s128.sorted && s128.distinct == s128, "not sorted-distinct")
  }

  test("estimator: exact below k, within ~4/sqrt(k) above") {
    val n = 20000L
    val d = ids(0, n)
    val k = 256
    val est = Kmv.sketch(d, Seq.empty, Kmv.kmvHash(col("id")), k)
      .select(Kmv.estimate(col("kmv"), k).as("e")).as[Long].head()
    val err = math.abs(est - n).toDouble / n
    assert(err < 4.0 / math.sqrt(k), s"estimate $est for $n: err $err")
    // below k: the sketch IS the value set — estimate is exact
    val small = Kmv.sketch(ids(0, 100), Seq.empty, Kmv.kmvHash(col("id")), k)
      .select(Kmv.estimate(col("kmv"), k).as("e")).as[Long].head()
    assert(small == 100L, s"sub-k estimate not exact: $small")
  }

  test("jaccard estimate tracks exact overlap; identical sets give 1.0") {
    val k = 256
    def sk(from: Long, until: Long): Seq[Long] =
      Kmv.sketch(ids(from, until), Seq.empty, Kmv.kmvHash(col("id")), k)
        .select("kmv").as[Seq[Long]].head()
    val a = sk(0, 10000); val b = sk(5000, 15000)
    val est = spark.range(1)
      .select(Kmv.jaccard(typedLit(a), typedLit(b), k).as("j"))
      .as[Double].head()
    // exact J = 5000/15000 = 1/3; k=256 → σ ≈ J·(1-J)/sqrt(k)-ish, be loose
    assert(math.abs(est - 1.0 / 3) < 0.15, s"jaccard estimate off: $est")
    val same = spark.range(1)
      .select(Kmv.jaccard(typedLit(a), typedLit(a), k).as("j"))
      .as[Double].head()
    assert(same == 1.0, s"self-jaccard != 1: $same")
  }

  test("plan shape: no Window, one shuffle over bounded partials") {
    val sk = Kmv.sketch(ids(0, 10000).withColumn("g", pmod(col("id"), lit(4))),
      Seq("g"), Kmv.kmvHash(col("id")), 64)
    val plan = sk.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"Window in sketch plan:\n$plan")
    // phase 2 shuffles partial ARRAYS (≤ k per group per partition), never
    // raw hashes: the pre-shuffle side of the exchange must already carry
    // the array-typed partial column
    assert(plan.contains("graft_kmv_partial"),
      s"bounded partial stage missing:\n$plan")
  }

  test("null and string keys: nulls ignored, strings via rolling_hash") {
    val d = Seq(Some(1L), None, Some(2L), Some(1L)).toDF("v")
    val sk = Kmv.sketch(d, Seq.empty, Kmv.kmvHash(col("v")), 8)
      .select("kmv").as[Seq[Long]].head()
    assert(sk.length == 2, s"nulls/dups not handled: $sk")
    val strs = Seq("alpha", "beta", "alpha").toDF("s")
    val sks = Kmv.sketch(strs, Seq.empty,
      graft.functions.RollingHash.rolling_hash(col("s")), 8)
      .select("kmv").as[Seq[Long]].head()
    assert(sks.length == 2, s"string keys wrong: $sks")
  }

  // ---- Count-Min ----

  private def freqData = {
    // key i appears i+1 times, i in [0, 50)
    spark.range(0, 50).select(col("id"),
      explode(sequence(lit(0L), col("id"))).as("rep")).select("id")
  }

  test("count-min never underestimates; exact at wide w") {
    val d = 4; val w = 64
    val cm = graft.sketch.CountMin.sketch(freqData, Seq.empty, col("id"), d, w)
    val est = freqData.distinct()
      .crossJoin(cm)
      .select(col("id"),
        graft.sketch.CountMin.estimate(col("cm"), col("id"), d, w).as("est"))
      .as[(Long, Long)].collect().toMap
    (0L until 50L).foreach { i =>
      assert(est(i) >= i + 1, s"underestimate for $i: ${est(i)} < ${i + 1}")
    }
    // wide grid, 50 keys over 4 rows of 64: at least one collision-free
    // row per key is not guaranteed, but total mass 1275 over w=64 bounds
    // the overestimate by 2N/w with high probability
    (0L until 50L).foreach { i =>
      assert(est(i) - (i + 1) <= 2 * 1275 / w,
        s"overestimate beyond CM bound for $i: ${est(i)} vs ${i + 1}")
    }
    // a genuinely wide grid IS exact: w=4096 ≫ 50 keys
    val wide = graft.sketch.CountMin.sketch(freqData, Seq.empty, col("id"), d, 4096)
    val exact = freqData.distinct().crossJoin(wide)
      .select(col("id"),
        graft.sketch.CountMin.estimate(col("cm"), col("id"), d, 4096).as("est"))
      .as[(Long, Long)].collect().toMap
    (0L until 50L).foreach { i =>
      assert(exact(i) == i + 1, s"wide grid not exact for $i: ${exact(i)}")
    }
  }

  test("count-min merge(grid(A), grid(B)) == grid(A ∪ B) exactly") {
    val d = 3; val w = 32
    val a = ids(0, 4000).withColumn("g", lit("x"))
    val b = ids(2000, 7000).withColumn("g", lit("x"))
    val gA = graft.sketch.CountMin.sketch(a, Seq("g"), col("id"), d, w)
    val gB = graft.sketch.CountMin.sketch(b, Seq("g"), col("id"), d, w)
    val merged = graft.sketch.CountMin.merge(gA.unionByName(gB), Seq("g"), "cm", d, w)
      .select("cm").as[Seq[Long]].head()
    val direct = graft.sketch.CountMin.sketch(a.unionByName(b), Seq("g"),
      col("id"), d, w).select("cm").as[Seq[Long]].head()
    assert(merged == direct, "merged grid != union's direct grid")
    // duplicate occurrences COUNT (frequency, not distinct): the union
    // grid's total mass is |A| + |B|, overlap double-counted
    assert(direct.sum == (4000 + 5000) * d,
      s"grid mass ${direct.sum} != ${(4000 + 5000) * d}")
  }

  test("count-min plan shape: no Window, bounded partial fold below the shuffle") {
    val cm = graft.sketch.CountMin.sketch(
      ids(0, 10000).withColumn("g", pmod(col("id"), lit(4))),
      Seq("g"), col("id"), 4, 64)
    val plan = cm.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"Window in count-min plan:\n$plan")
    assert(plan.contains("graft_cm_partial"),
      s"bounded partial stage missing:\n$plan")
    // nulls ignored
    val withNull = Seq(Some(1L), None, Some(1L)).toDF("v")
    val g = graft.sketch.CountMin.sketch(withNull, Seq.empty, col("v"), 2, 8)
      .select("cm").as[Seq[Long]].head()
    assert(g.sum == 2 * 2, s"null key counted: $g")
  }

  test("histogram grids: merge ≡ direct, quantile error ≤ one bin, edge clamps") {
    import graft.sketch.Histo
    val (lo, step, w) = (0L, 10L, 16)
    val vals = (0 until 1000).map(i => (i % 7).toLong * 23 % 160)
    val df = vals.toDF("v").withColumn("g", lit("x"))
    val grid = Histo.sketch(df, Seq("g"), col("v"), lo, step, w)
    val g = grid.select("hist").as[Seq[Long]].head()
    assert(g.sum == vals.length && g.length == w)
    // split-merge exactness: grids of two halves zip-sum to the whole
    val (h1, h2) = vals.splitAt(vals.length / 2)
    val daily = Histo.sketch(
      h1.toDF("v").withColumn("g", lit("x")).withColumn("d", lit(1))
        .unionByName(h2.toDF("v").withColumn("g", lit("x")).withColumn("d", lit(2))),
      Seq("g", "d"), col("v"), lo, step, w)
    val merged = Histo.merge(daily, Seq("g"), "hist", w)
      .select("hist").as[Seq[Long]].head()
    assert(merged == g, "merged daily grids != direct grid")
    // quantile estimate within one bin width of the exact quantile
    val sorted = vals.sorted
    for (q <- Seq(100, 500, 900, 1000)) {
      val est = grid.select(Histo.quantile(col("hist"), q, lo, step))
        .as[Long].head()
      val exact = sorted(math.max(0, (q * vals.length + 999) / 1000 - 1))
      assert(est <= exact && exact < est + step,
        s"q=$q: est=$est exact=$exact (bin width $step)")
    }
    // under/overflow clamp into edge bins; empty grid → null quantile
    val edge = Seq(-50L, 5000L).toDF("v").withColumn("g", lit("x"))
    val eg = Histo.sketch(edge, Seq("g"), col("v"), lo, step, w)
      .select("hist").as[Seq[Long]].head()
    assert(eg.head == 1L && eg.last == 1L, s"edge clamps: $eg")
    // global grid of an empty input: one all-zero row (Spark's global
    // aggregate), whose quantile is NULL by the n=0 contract
    val empty = Histo.sketch(df.filter(lit(false)), Seq.empty, col("v"), lo, step, w)
    val er = empty.select(col("hist"),
      Histo.quantile(col("hist"), 500, lo, step).as("p50")).collect().head
    assert(er.getSeq[Long](0).forall(_ == 0L) && er.isNullAt(1))
  }

  test("misra-gries: exact accounting, bounds, and heavyHittersExact ≡ naive plan") {
    import graft.sketch.MisraGries
    // 500×h1 + 120×h2 + 1000 singletons, shuffled deterministically
    val rows = (Seq.fill(500)("h1") ++ Seq.fill(120)("h2") ++
      (0 until 1000).map(i => s"s$i")).sortBy(_.hashCode)
    val df = rows.toDF("key").repartition(11)
    val n = rows.length.toLong
    val truth = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap

    val k = 16
    val s = MisraGries.summary(df, "key", k)
      .as[(String, Long, Long, Long)].collect()
    val err = s.head._3
    assert(s.forall(_._4 == n), "n mismatch")
    // mass conservation: every decrement round removes exactly k+1
    assert(n - s.map(_._2).sum == err * (k + 1),
      s"accounting broken: n=$n sum=${s.map(_._2).sum} err=$err")
    // est ≤ true ≤ est + err for present keys; true ≤ err for absent
    s.foreach { case (key, cnt, e, _) =>
      assert(cnt <= truth(key) && truth(key) <= cnt + e, s"bound broken at $key") }
    val present = s.map(_._1).toSet
    truth.foreach { case (key, t) =>
      if (!present(key)) assert(t <= err, s"absent key $key true=$t > err=$err") }

    // exact two-phase result ≡ naive groupBy-HAVING, partition-invariant
    def naive(kk: Int) = df.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * kk > n).as[(String, Long)].collect().toSet
    for (kk <- Seq(4, 8, 64)) {
      val hh = MisraGries.heavyHittersExact(df, "key", kk)
        .as[(String, Long)].collect().toSet
      assert(hh == naive(kk), s"k=$kk: $hh != ${naive(kk)}")
      val hh2 = MisraGries.heavyHittersExact(df.repartition(3), "key", kk)
        .as[(String, Long)].collect().toSet
      assert(hh2 == hh, s"k=$kk not partition-invariant")
    }
    // k=4 ⇒ threshold 405 ⇒ exactly h1; k=8 ⇒ 202.5 ⇒ h1; k=64 ⇒ ~25 ⇒ h1,h2
    assert(naive(4) == Set(("h1", 500L)) && naive(64).map(_._1) == Set("h1", "h2"))

    // fold of two summaries keeps the bound; prune keeps it and caps rows
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val sa = MisraGries.summary(half1.toDF("key"), "key", k).withColumn("src", lit(0))
    val sb = MisraGries.summary(half2.toDF("key"), "key", k).withColumn("src", lit(1))
    val folded = MisraGries.fold(sa.unionByName(sb), "key", "src")
    val f = folded.as[(String, Long, Long, Long)].collect()
    assert(f.head._4 == n)
    f.foreach { case (key, cnt, e, _) =>
      assert(cnt <= truth(key) && truth(key) <= cnt + e, s"fold bound at $key") }
    val pruned = MisraGries.prune(folded, "key", k)
      .as[(String, Long, Long, Long)].collect()
    assert(pruned.length <= k, s"prune left ${pruned.length} rows")
    pruned.foreach { case (key, cnt, e, _) =>
      assert(cnt <= truth(key) && truth(key) <= cnt + e, s"prune bound at $key") }
  }
}
