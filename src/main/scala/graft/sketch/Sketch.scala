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
