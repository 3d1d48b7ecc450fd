package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** KMV (k-minimum-values) distinct-count sketches — MERGEABLE cardinality
  * summaries (Bar-Yossef et al. 2002; the theta-sketch family's simplest
  * member).
  *
  * Why a sketch when `count(distinct x)` exists: at 100 TB a distinct
  * count is a full shuffle of every distinct value, and it cannot be
  * PRE-AGGREGATED — yesterday's count plus today's count is not the
  * union's count. A KMV sketch is: the k smallest hash values of a union
  * are a subset of the k∪k smallest of the parts, so per-partition /
  * per-day sketch rows (k longs each) fold into exact sketches OF THE
  * UNION with [[merge]], and any rollup of a sketch summary answers
  * distinct-count questions without re-touching facts — the same
  * serving shape as [[graft.matview.MatView]] aggregate summaries, which
  * plain distinct counts are excluded from.
  *
  * Everything here is EXACT-deterministic (reference: DataSketches' theta
  * sketch has the same property): the hash is the repo's SQL-mirrorable
  * mult-mod permutation mixer over P = 1e9+7 ([[graft.llm.Sampling]]'s
  * arithmetic, reused so both engines agree bit-for-bit), sketches are
  * sorted distinct arrays, and the estimator `(k-1)·P / h_k` is integer
  * division — so sketch bytes, estimates, and jaccards all hash-check
  * against a DuckDB list-arithmetic oracle. Estimation error is the
  * usual ~1/√k (k=256 → ~6%); `len(sketch) < k` means every distinct
  * value was seen and the "estimate" is exact by construction.
  *
  * 100 TB story: phase 1 is a bounded per-partition fold (k smallest per
  * group per partition — memory k·groups longs, no Window, no per-group
  * sort of the data); phase 2 shuffles only those ≤ nPart·k survivors
  * per group. The sketch column in the output is ≤ k longs per group
  * regardless of input size.
  */
object Kmv {

  /** Hash modulus — hash values are uniform-ish in [0, P). Shared with
    * [[graft.llm.Sampling]]'s mixer and [[graft.functions.RollingHash]]'s
    * modulus so string keys can route through `rolling_hash` first. */
  val P = 1000000007L
  private val K = 2654435761L

  /** SQL-mirrorable permutation hash of an integral key into [0, P):
    * ((x mod P) · K) mod P, exact in 64-bit ((P-1)·K < 2^63). A
    * permutation of [0,P) restricted to [0,P) inputs — collision-free on
    * key spaces below P, which keeps `len(sketch) < k ⇒ exact` honest. */
  def kmvHash(c: Column): Column =
    pmod(pmod(c.cast("long"), lit(P)) * lit(K), lit(P))

  /** DuckDB mirror of [[kmvHash]] (SQL `%` keeps the dividend's sign, so
    * the double-pmod shape matches Spark's non-negative pmod). */
  def kmvHashSql(c: String): String =
    s"((((($c % $P) + $P) % $P) * $K) % $P)"

  /** Per-group KMV sketch: `groupCols :+ (outCol: array<long>)` with the
    * ≤ k smallest distinct values of `hash` per group, sorted ascending.
    * `hash` must already be in [0, P) ([[kmvHash]] for integral keys,
    * `rolling_hash` for strings); null hashes are ignored (distinct-count
    * semantics). Empty `groupCols` builds one global sketch row. */
  def sketch(df: DataFrame, groupCols: Seq[String], hash: Column, k: Int,
             outCol: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    val withH = df
      .select(groupCols.map(col) :+ hash.cast("long").as("graft_kmv_h"): _*)
      .filter(col("graft_kmv_h").isNotNull)
    val nGroup = groupCols.length
    // phase 1: per-partition k-smallest-distinct per group. Exact: every
    // member of the global k-min set is in some partition's k-min set.
    // Bounded: one TreeSet of ≤ k longs per live group per partition.
    val partials = withH.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], java.util.TreeSet[java.lang.Long]]
      it.foreach { r =>
        val key = (0 until nGroup).map(r.get)
        val set = m.getOrElseUpdate(key, new java.util.TreeSet[java.lang.Long]())
        set.add(r.getLong(nGroup))
        if (set.size > k) set.pollLast()
      }
      m.iterator.map { case (key, set) =>
        Row.fromSeq(key :+ set.toArray(Array.empty[java.lang.Long]).toSeq.map(Long2long))
      }
    }
    val outSchema = StructType(
      withH.schema.fields.take(nGroup) :+
        StructField("graft_kmv_partial", ArrayType(LongType, containsNull = false),
          nullable = false))
    val partialDf = spark.createDataFrame(partials, outSchema)
    // phase 2: fold partials (≤ nPart·k values per group — tiny) into the
    // final sorted-distinct prefix. Same fold as merge().
    partialDf.groupBy(groupCols.map(col): _*)
      .agg(foldArrays(col("graft_kmv_partial"), k).as(outCol))
  }

  /** Merge sketch ROWS per group: `groupBy(groupCols)` folding `kmvCol`
    * arrays into the union's sketch — EXACTLY the sketch the union's facts
    * would have built (k smallest of a union ⊆ the parts' k-mins), so
    * rollups of a sketch summary stay exact-deterministic. */
  def merge(df: DataFrame, groupCols: Seq[String], kmvCol: String, k: Int,
            outCol: String = "kmv"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(foldArrays(col(kmvCol), k).as(outCol))

  private def foldArrays(arrays: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(collect_list(arrays)))), 1, k)

  /** Two-sketch merge as a scalar expression (for joined sketch rows). */
  def union2(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate of a sketch: exact `len` when the sketch
    * never filled (every distinct value is present), else the KMV
    * estimator (k-1)/U_(k) with U normalized by P — INTEGER division, so
    * both engines produce the identical long. */
  def estimate(kmvCol: Column, k: Int): Column =
    when(size(kmvCol) < k, size(kmvCol).cast("long"))
      .otherwise(org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(lit((k - 1) * P)),
          org.apache.spark.sql.GraftBridge.expression(element_at(kmvCol, k)))))

  /** DuckDB mirror of [[estimate]]. */
  def estimateSql(kmv: String, k: Int): String =
    s"CASE WHEN len($kmv) < $k THEN len($kmv) ELSE ${(k - 1).toLong * P} // $kmv[$k] END"

  /** Jaccard similarity estimate of two sketched sets: the k-min sketch X
    * of the UNION is an unbiased sample of it; J ≈ |X ∩ A ∩ B| / |X|.
    * Small-int IEEE division + round(4) — deterministic in both engines. */
  def jaccard(a: Column, b: Column, k: Int): Column = {
    val x = union2(a, b, k)
    val inter = size(array_intersect(array_intersect(x, a), b))
    round(inter.cast("double") / size(x).cast("double"), 4)
  }

  /** DuckDB mirror of [[jaccard]]. */
  def jaccardSql(a: String, b: String, k: Int): String = {
    val x = s"list_slice(list_sort(list_distinct(list_concat($a, $b))), 1, $k)"
    s"round(len(list_intersect(list_intersect($x, $a), $b))::DOUBLE / len($x), 4)"
  }

  /** DuckDB mirror of the sketch FOLD over a plain value aggregate:
    * `list_slice(list_sort(list_distinct(list(h))), 1, k)`. */
  def sketchAggSql(hashExpr: String, k: Int): String =
    s"list_slice(list_sort(list_distinct(list($hashExpr))), 1, $k)"

  /** DuckDB mirror of [[merge]]'s array-of-arrays fold. */
  def mergeAggSql(kmvExpr: String, k: Int): String =
    s"list_slice(list_sort(list_distinct(flatten(list($kmvExpr)))), 1, $k)"
}

/** Count-Min frequency sketches (Cormode & Muthukrishnan 2005) — MERGEABLE
  * point-frequency summaries, the counting sibling of [[Kmv]]'s
  * distinct-count sketches.
  *
  * Why a sketch when `groupBy(key).count()` exists: at 100 TB a per-key
  * count over a high-cardinality key (user ids, URLs, vocab) is a
  * full shuffle of every key occurrence AND an output as large as the key
  * space. A Count-Min sketch is d·w longs REGARDLESS of cardinality, and
  * it pre-aggregates: per-partition / per-day grids fold by ELEMENTWISE
  * SUM into exactly the union's grid, so stored daily sketch rows answer
  * "how often did key x appear, ever" without re-touching facts. The
  * estimate `min_i grid[i·w + h_i(x) mod w]` NEVER underestimates (each
  * counter sums the true count plus non-negative collision mass) and
  * overestimates by ≤ 2N/w with probability 1 − 2^−d.
  *
  * Everything is EXACT-deterministic like [[Kmv]]: row hashes are d
  * mult-mod permutations of the same modulus P (SQL-mirrorable), the grid
  * is a plain `array<long>` in row-major order, merge is zip-sum — so
  * sketch bytes and estimates hash-check against a DuckDB grid built by
  * list arithmetic. Unlike k-min union, grid merge is NOT idempotent
  * (re-adding a grid double-counts) — the streaming maintenance in
  * [[graft.streaming.Streams.maintainCountMin]] therefore uses the
  * aggregate-store replay/compaction watermark, not the sketch store's
  * merge-anytime contract.
  *
  * 100 TB story: phase 1 is a bounded per-partition fold (one long[d·w]
  * per live group per partition — no Window, no shuffle of key
  * occurrences); phase 2 shuffles only the ≤ nPart·(d·w) partial
  * counters per group. Reference scope: the reference engine has no
  * sketches at all (counts are exact table scans, server.py) — this is
  * pipeline growth mandated by the builder brief.
  */
object CountMin {

  val P = Kmv.P

  /** d independent row multipliers (32-bit primes; (P−1)·K < 2^63 keeps
    * every product exact in a long). d ≤ 4. */
  private val Ks = Array(2654435761L, 2246822519L, 3266489917L, 668265263L)
  val maxDepth: Int = Ks.length

  /** Grid index of `key` in hash row `i`: i·w + ((key mod P)·K_i mod P)
    * mod w — 0-based row-major position in the flat grid array. */
  def slot(key: Column, i: Int, w: Int): Column =
    lit(i.toLong * w) + pmod(pmod(pmod(key.cast("long"), lit(P)) * lit(Ks(i)), lit(P)), lit(w))

  /** DuckDB mirror of [[slot]] (double-pmod shape matches Spark's
    * non-negative pmod for negative keys). */
  def slotSql(c: String, i: Int, w: Int): String =
    s"(${i.toLong * w} + ((((($c % $P) + $P) % $P) * ${Ks(i)}) % $P) % $w)"

  /** All d grid indexes of a key as a SQL `unnest([...])` list — the
    * oracle's per-occurrence scatter. */
  def slotsUnnestSql(c: String, d: Int, w: Int): String =
    s"unnest([${(0 until d).map(slotSql(c, _, w)).mkString(", ")}])"

  /** Per-group Count-Min grid: `groupCols :+ (outCol: array<long>)`, the
    * flat d×w row-major counter grid of `key` occurrences per group. Null
    * keys are ignored; empty `groupCols` builds one global grid row. */
  def sketch(df: DataFrame, groupCols: Seq[String], key: Column,
             d: Int, w: Int, outCol: String = "cm"): DataFrame = {
    require(d >= 1 && d <= maxDepth, s"depth must be in [1, $maxDepth], got $d")
    require(w >= 2, s"width must be >= 2, got $w")
    val spark = df.sparkSession
    val withK = df
      .select(groupCols.map(col) :+ key.cast("long").as("graft_cm_k"): _*)
      .filter(col("graft_cm_k").isNotNull)
    val nGroup = groupCols.length
    // phase 1: one long[d·w] per live group per partition — the entire
    // partition folds into d·w counters before anything shuffles.
    val partials = withK.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Long]]
      it.foreach { r =>
        val grid = m.getOrElseUpdate((0 until nGroup).map(r.get),
          new Array[Long](d * w))
        val x = r.getLong(nGroup)
        var i = 0
        while (i < d) {
          val h = (((x % P) + P) % P) * Ks(i) % P
          grid(i * w + (h % w).toInt) += 1L
          i += 1
        }
      }
      m.iterator.map { case (key, grid) => Row.fromSeq(key :+ grid.toSeq) }
    }
    val outSchema = StructType(
      withK.schema.fields.take(nGroup) :+
        StructField("graft_cm_partial", ArrayType(LongType, containsNull = false),
          nullable = false))
    // phase 2: zip-sum the ≤ nPart partial grids per group.
    CountMin.merge(spark.createDataFrame(partials, outSchema),
      groupCols, "graft_cm_partial", d, w, outCol)
  }

  /** Merge grid ROWS per group by elementwise sum — EXACTLY the grid the
    * union's facts would build (counter addition is associative and
    * commutative; it is NOT idempotent — never merge the same grid
    * twice). */
  def merge(df: DataFrame, groupCols: Seq[String], cmCol: String,
            d: Int, w: Int, outCol: String = "cm"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(aggregate(collect_list(col(cmCol)),
        array_repeat(lit(0L), d * w),
        (acc, x) => zip_with(acc, x, _ + _)).as(outCol))

  /** DuckDB mirror of [[merge]]'s fold: per 0-based slot s, the sum over
    * the grouped grids' values at s. */
  def mergeAggSql(cmExpr: String, d: Int, w: Int): String =
    s"""list_transform(range(0, ${d * w}),
       |  s -> list_sum(list_transform(list($cmExpr), g -> g[s + 1])))""".stripMargin

  /** Point-frequency estimate of `key` from a grid: min over the d
    * counters the key hashes to. ≥ the true count always; exact when no
    * other key collides in some row. */
  def estimate(cm: Column, key: Column, d: Int, w: Int): Column = {
    val rows = (0 until d).map(i => element_at(cm, (slot(key, i, w) + 1).cast("int")))
    if (d == 1) rows.head else least(rows: _*)
  }

  /** DuckDB mirror of [[estimate]] (1-based list indexing). */
  def estimateSql(cm: String, c: String, d: Int, w: Int): String =
    s"least(${(0 until d).map(i => s"$cm[${slotSql(c, i, w)} + 1]").mkString(", ")})"
}

/** Mergeable equi-width histogram sketches — the QUANTILE member of the
  * sketch family ([[Kmv]] distinct counts, [[CountMin]] frequencies,
  * [[MisraGries]] heavy hitters): a fixed integer grid of `w` bins of
  * width `step` starting at `lo`, one `array<long>` of counts per group.
  *
  * Why a sketch when exact quantiles exist
  * ([[graft.operators.Quantiles]]): exact selection must touch facts per
  * query, and per-day exact quantiles CANNOT pre-aggregate — yesterday's
  * p95 plus today's p95 is not the union's p95. The grid CAN: merge is
  * elementwise sum (associative/commutative, exactly the union's grid),
  * so per-day/per-partition rows of w longs serve any rollup's quantiles
  * later without re-touching facts, with error bounded by ONE BIN WIDTH
  * — the error is a deliberate knob (step), not a float hazard.
  *
  * Everything is exact-deterministic like its siblings: bin index is
  * integer (x−lo) div step clamped into [0, w) (under/overflow land in
  * the edge bins — size the grid so that's the tail you can tolerate),
  * the quantile estimate returns the lower edge of the first bin whose
  * cumulative count reaches ⌈q·N/1000⌉ (integer permille arithmetic) —
  * both SQL-mirrorable, so grids AND estimates hash-check against DuckDB
  * list arithmetic. Not idempotent under re-merge (counter sums): the
  * streaming maintenance uses the aggregate-store replay/compaction
  * watermark, same as [[CountMin]].
  *
  * 100 TB story: phase 1 folds each partition into one long[w] per live
  * group (no Window, no shuffle of value rows); phase 2 shuffles only
  * the ≤ nPart partial grids per group. */
object Histo {

  /** 0-based bin of an integral value: (x−lo) div step, clamped.
    * Integral `div` (Column `/` would widen to double). */
  def bin(x: Column, lo: Long, step: Long, w: Int): Column = {
    val d = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(x.cast("long") - lo),
        org.apache.spark.sql.GraftBridge.expression(lit(step))))
    least(greatest(d, lit(0L)), lit(w - 1L))
  }

  /** DuckDB mirror of [[bin]] (`//` = integer division). */
  def binSql(c: String, lo: Long, step: Long, w: Int): String =
    s"least(greatest((CAST($c AS BIGINT) - $lo) // $step, 0), ${w - 1})"

  /** Per-group histogram grid: `groupCols :+ (outCol: array<long>)`.
    * Null values are ignored; empty `groupCols` builds one global row. */
  def sketch(df: DataFrame, groupCols: Seq[String], value: Column,
             lo: Long, step: Long, w: Int, outCol: String = "hist"): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    require(w >= 2, s"width must be >= 2, got $w")
    val spark = df.sparkSession
    val withV = df
      .select(groupCols.map(col) :+ value.cast("long").as("graft_h_v"): _*)
      .filter(col("graft_h_v").isNotNull)
    val nGroup = groupCols.length
    val partials = withV.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Long]]
      it.foreach { r =>
        val grid = m.getOrElseUpdate((0 until nGroup).map(r.get), new Array[Long](w))
        val x = r.getLong(nGroup)
        val b = math.min(math.max((x - lo) / step, 0L), (w - 1).toLong).toInt
        grid(b) += 1L
      }
      m.iterator.map { case (key, grid) => Row.fromSeq(key :+ grid.toSeq) }
    }
    val outSchema = StructType(
      withV.schema.fields.take(nGroup) :+
        StructField("graft_h_partial", ArrayType(LongType, containsNull = false),
          nullable = false))
    merge(spark.createDataFrame(partials, outSchema),
      groupCols, "graft_h_partial", w, outCol)
  }

  /** Merge grid ROWS per group by elementwise sum — exactly the union's
    * grid (not idempotent; see the streaming-store contract). */
  def merge(df: DataFrame, groupCols: Seq[String], histCol: String,
            w: Int, outCol: String = "hist"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(aggregate(collect_list(col(histCol)),
        array_repeat(lit(0L), w),
        (acc, x) => zip_with(acc, x, _ + _)).as(outCol))

  /** DuckDB mirror of the grid BUILD as a CTE chain (an aggregate can't
    * live inside a list lambda, so the oracle assembles the list from
    * per-bin counts the way the CountMin oracle does): emits
    * `b/cnt/g/h` CTE definitions; `h` has (groupCol, hist). */
  def sketchCtesSql(table: String, groupCol: String, c: String,
                    lo: Long, step: Long, w: Int): String =
    s"""b AS (SELECT $groupCol, ${binSql(c, lo, step, w)} AS bin FROM $table),
       |cnt AS (SELECT $groupCol, bin, count(*) AS n FROM b GROUP BY 1, 2),
       |g AS (SELECT DISTINCT $groupCol FROM $table),
       |h AS (SELECT g.$groupCol,
       |        list(CAST(coalesce(cnt.n, 0) AS BIGINT) ORDER BY t.s) AS hist
       |      FROM g CROSS JOIN range(0, $w) t(s)
       |      LEFT JOIN cnt ON cnt.$groupCol = g.$groupCol AND cnt.bin = t.s
       |      GROUP BY g.$groupCol)""".stripMargin

  /** DuckDB mirror of [[merge]]'s fold. */
  def mergeAggSql(histExpr: String, w: Int): String =
    s"""list_transform(range(0, $w),
       |  s -> CAST(list_sum(list_transform(list($histExpr), g -> g[s + 1]))
       |       AS BIGINT))""".stripMargin

  /** q-permille quantile estimate from a grid: the LOWER EDGE of the
    * first bin whose cumulative count reaches ⌈q·N/1000⌉ — within one
    * `step` of the true quantile; null for an all-empty grid. Integer
    * arithmetic end to end. */
  def quantile(hist: Column, qPermille: Int, lo: Long, step: Long): Column = {
    require(qPermille >= 1 && qPermille <= 1000,
      s"qPermille must be in 1..1000, got $qPermille")
    val n = aggregate(hist, lit(0L), _ + _)
    // cum ≥ ⌈q·N/1000⌉ ⟺ 1000·cum ≥ q·N — no division anywhere.
    // First index reaching the target via ONE (cum, found-index) struct
    // fold — O(w), no nested prefix sums.
    val folded = aggregate(
      zip_with(hist, sequence(lit(0), size(hist) - 1),
        (c, i) => struct(c.as("c"), i.as("i"))),
      struct(lit(0L).as("cum"), lit(-1).as("idx")),
      (acc, x) => struct(
        (acc.getField("cum") + x.getField("c")).as("cum"),
        when(acc.getField("idx") >= 0, acc.getField("idx"))
          .otherwise(when(
            (acc.getField("cum") + x.getField("c")) * 1000 >= n * qPermille,
            x.getField("i")).otherwise(lit(-1))).as("idx")))
    when(n === 0, lit(null).cast("long"))
      .otherwise(lit(lo) + folded.getField("idx").cast("long") * step)
  }

  /** DuckDB mirror of [[quantile]] (list_filter keeps 0-based indexes
    * whose prefix reaches the target; first survivor is the bin). */
  def quantileSql(hist: String, qPermille: Int, lo: Long, step: Long): String = {
    val n = s"list_sum($hist)"
    s"""(CASE WHEN $n = 0 THEN NULL ELSE
       |  $lo + (list_filter(range(0, len($hist)),
       |    i -> list_sum($hist[1:i + 1]) * 1000 >= $n * $qPermille))[1] * $step
       |  END)""".stripMargin
  }
}

/** Misra-Gries heavy hitters (Misra & Gries 1982; mergeable form per
  * Agarwal et al., "Mergeable Summaries") — the deterministic counter
  * sibling of [[CountMin]], plus the EXACT two-phase heavy-hitter operator
  * built on it.
  *
  * Why not a plain `groupBy(key).count().filter(cnt > n/k)`: at 100 TB
  * over a high-cardinality key (n-gram vocab, URLs, user ids) the naive
  * plan shuffles one partial-count row PER DISTINCT KEY — the shuffle is
  * domain-sized. Misra-Gries keeps k counters per partition (any key with
  * global frequency > n/(k+1) is guaranteed to survive in at least one
  * partition's counters — if Σcountₚ(x) > Σnₚ/(k+1) then some partition
  * has countₚ(x) > nₚ/(k+1), which MG retains), so the candidate set is
  * ≤ k·nPartitions rows no matter the domain. [[heavyHittersExact]] then
  * verifies candidates with an exact count restricted to them: the
  * output is EXACT (hence partition-invariant and oracle-checkable
  * against a plain HAVING query) while the only domain-sized structure
  * ever built is k counters per task.
  *
  * The summary form is MERGEABLE with bookkept error: an MG run that
  * performed d decrement rounds under-counts any key by at most d (each
  * round subtracts 1 from k counters plus the arriving item, so
  * n = Σcnt + d·(k+1) exactly — d is recoverable from the stored rows).
  * Summing per-key counts across summaries keeps `est ≤ true ≤ est + Σd`,
  * which is what [[graft.streaming.Streams.maintainHeavyHitters]] folds
  * across micro-batches. Reference scope: the reference has no sketches
  * (exact scans only, server.py) — pipeline growth per the builder brief.
  */
object MisraGries {

  /** MG summary of `df[keyCol]` (nulls ignored): one row per surviving
    * key with columns (keyCol, cnt, err, n) where `err` (the total
    * decrement mass — identical on every row) bounds the per-key
    * under-count and `n` is the total occurrence count:
    * `cnt ≤ true ≤ cnt + err` for present keys, `true ≤ err` for absent
    * ones. Phase 1 is a bounded per-partition counter fold (k live
    * counters per task); phase 2 shuffles only the ≤ k·nPart survivors
    * (per-key sums — no second pruning, so the error bound stays the sum
    * of per-partition decrement counts). */
  def summary(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val keyed = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
    // per-partition MG: rows (key, cnt, 0, 0) for survivors + one meta row
    // (null, 0, d_p, n_p) carrying the partition's decrement/total counts
    val partials = keyed.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[Any, Long]
      var dec = 0L
      var n = 0L
      it.foreach { r =>
        val x = r.get(0)
        n += 1L
        m.get(x) match {
          case Some(c) => m.update(x, c + 1L)
          case None if m.size < k => m.update(x, 1L)
          case None =>
            // decrement round: the arriving item and every counter lose 1
            dec += 1L
            val dead = m.iterator.collect { case (key, 1L) => key }.toList
            m.mapValuesInPlace((_, c) => c - 1L)
            dead.foreach(m.remove)
        }
      }
      m.iterator.map { case (key, c) => Row(key, c, 0L, 0L) } ++
        Iterator.single(Row(null, 0L, dec, n))
    }
    val schema = StructType(Seq(
      keyed.schema.fields.head.copy(nullable = true),
      StructField("cnt", LongType, nullable = false),
      StructField("graft_mg_dec", LongType, nullable = false),
      StructField("graft_mg_n", LongType, nullable = false)))
    val pdf = spark.createDataFrame(partials, schema)
    val meta = pdf.agg(sum(col("graft_mg_dec")).as("err"),
      sum(col("graft_mg_n")).as("n"))
    pdf.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(sum(col("cnt")).as("cnt"))
      .crossJoin(broadcast(meta))
  }

  /** Fold MERGED summary rows (the [[summary]] schema, possibly from many
    * summaries concatenated) into one: per-key count sums plus the sum of
    * each distinct source summary's `err`/`n`. `srcCol` distinguishes the
    * source summaries (e.g. the store's `batch` partition column). The
    * bound survives the fold: est ≤ true ≤ est + folded err. */
  def fold(summaries: DataFrame, keyCol: String, srcCol: String): DataFrame = {
    val meta = summaries.groupBy(col(srcCol))
      .agg(first(col("err")).as("e"), first(col("n")).as("bn"))
      .agg(coalesce(sum(col("e")), lit(0L)).as("err"),
        coalesce(sum(col("bn")), lit(0L)).as("n"))
    summaries.groupBy(col(keyCol)).agg(sum(col("cnt")).as("cnt"))
      .crossJoin(broadcast(meta))
  }

  /** Prune a folded summary back to ≤ k rows, Agarwal-style: subtract the
    * (k+1)-th largest count from every counter, drop the non-positive,
    * charge the subtraction to `err`. Deterministic; keeps the
    * est ≤ true ≤ est + err contract. No-op when ≤ k rows survive as-is. */
  def prune(summary: DataFrame, keyCol: String, k: Int): DataFrame = {
    val s = summary.select(col("cnt")).orderBy(col("cnt").desc)
      .limit(k + 1).collect() // ≤ k+1 longs — driver-bounded by contract
    if (s.length <= k) summary
    else {
      val sub = s.last.getLong(0)
      summary.filter(col("cnt") > sub)
        .select(col(keyCol), (col("cnt") - sub).as("cnt"),
          (col("err") + sub).as("err"), col("n"))
    }
  }

  /** EXACT heavy hitters: every key with frequency STRICTLY above n/k,
    * with its exact count — `(keyCol, cnt)`, deterministic and
    * partition-invariant. Phase 1 prunes to MG candidates (a guaranteed
    * superset of keys above n/(k+1) ⊇ above n/k); phase 2 semi-joins the
    * facts to the broadcast candidate set and counts exactly — the only
    * full-domain aggregation is restricted to ≤ k·nPart candidate keys. */
  def heavyHittersExact(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    // ONE pass over the facts for phase 1: the summary is ≤ k·nPartitions
    // rows by construction (the documented driver bound — 1000 executors
    // × k=1024 is ~1M short rows), so collecting it beats leaving the
    // lazy frame to re-scan the corpus once for the candidate join and
    // once for the total
    val s = summary(df, keyCol, k).collect()
    if (s.isEmpty) return df.sparkSession.createDataFrame(
      java.util.Collections.emptyList[Row](),
      StructType(Seq(df.schema(keyCol), StructField("cnt", LongType))))
    val n = s.head.getLong(3)
    val cand = spark.createDataFrame(
      java.util.Arrays.asList(s.map(r => Row(r.get(0))): _*),
      StructType(Seq(df.schema(keyCol))))
    df.filter(col(keyCol).isNotNull)
      .join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .select(col(keyCol), col("cnt"))
  }
}
