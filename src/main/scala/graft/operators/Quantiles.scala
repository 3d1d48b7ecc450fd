package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** EXACT distributed quantiles by iterative range selection — order
  * statistics with NO sort and NO shuffle of the data.
  *
  * Spark's exact `percentile` aggregate collects every distinct value
  * into one aggregation buffer, and a sort-based selection shuffles the
  * full column: both are memory- or network-bound at 100 TB. Selection by
  * section search on the VALUE DOMAIN is neither: each round counts
  * `v <= split` at up to 15 split points per still-open quantile — ONE
  * partial-agg scan producing a single row, no Sort, no Exchange of data
  * rows — and narrows the range 16-fold. ⌈log₁₆(max-min)⌉ rounds total
  * (≤ 16 for longs, ~6 for cent-scaled prices), executor memory O(1).
  * The classic trade
  * vs one full sort-shuffle: k cheap scans instead of one expensive
  * shuffle — at cluster scale the scans win whenever the scan is cheaper
  * than shuffling the column (it virtually always is for wide tables
  * where the scan reads ONE pruned column). All probes advance in the
  * SAME pass (one conditional-sum column each), so the pass count is the
  * max over probes, not the sum.
  *
  * Semantics: discrete lower-interpolation quantiles — the value at
  * 0-indexed rank ⌊q·(n-1)⌋ of the sorted column, i.e. an actual element
  * (numpy interpolation='lower'; ties/duplicates handled by rank
  * arithmetic). Integral values only: exact integer counting is what
  * makes the result deterministic and oracle-checkable; scale doubles to
  * cents first. Nulls are ignored like every SQL quantile.
  */
object Quantiles {

  /** (prob, value) rows for each requested quantile of `valueCol`
    * (cast to long). Empty input → empty result. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0,1]: $probs")
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      // multiple counting passes over one pruned column: cache it (spills
      // to disk; at production scale prefer a pre-cached/columnar source
      // and this persist is a cheap no-op re-mark)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
      val n = head.getLong(0)
      val schema = StructType(Seq(StructField("prob", DoubleType, nullable = false),
        StructField("value", LongType, nullable = false)))
      if (n == 0L)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
      // 1-indexed target rank per probe: ⌊q·(n-1)⌋ + 1 (same IEEE product
      // in any engine, so the rank arithmetic mirrors exactly)
      val ranks = probs.map(p => math.floor(p * (n - 1)).toLong + 1L)
      val lo = probs.map(_ => head.getLong(1)).toArray
      val hi = probs.map(_ => head.getLong(2)).toArray
      // invariant: the rank-th smallest value lies in [lo(i), hi(i)].
      // S-way section search, not bisection: each round counts at up to S
      // split points per open probe IN ONE SCAN (extra conditional sums
      // are nearly free next to the scan itself), cutting rounds from
      // log₂(range) to log_{S+1}(range) — ~6 scans for cent-scaled
      // prices. Splits are floor-spaced (floorDiv is exact toward -∞;
      // a truncating division would push splits below lo on negative
      // domains — the non-termination QuantilesSpec pins).
      val S = 15
      while (probs.indices.exists(i => lo(i) < hi(i))) {
        val open = probs.indices.filter(i => lo(i) < hi(i))
        val splits: Seq[(Int, Seq[Long])] = open.map { i =>
          val span = hi(i) - lo(i) // hi > lo ⇒ positive, no overflow at ±2^62 domains
          val pts =
            if (span <= S) (lo(i) until hi(i)).toSeq
            else (1 to S).map(j => lo(i) + Math.floorDiv(span, S + 1) * j).distinct
          (i, pts)
        }
        val cols = splits.flatMap { case (i, pts) =>
          pts.zipWithIndex.map { case (m, j) =>
            sum(when(col("v") <= m, 1L).otherwise(0L)).as(s"c${i}_$j") } }
        val row = vals.agg(cols.head, cols.tail: _*).head()
        var off = 0
        splits.foreach { case (i, pts) =>
          val counts = pts.indices.map(j => row.getLong(off + j))
          off += pts.length
          // counts are monotone in the split points: the answer sits in
          // the first bracket whose cumulative count reaches the rank
          val hit = pts.indices.find(j => counts(j) >= ranks(i))
          hit match {
            case Some(j) =>
              hi(i) = pts(j)
              if (j > 0) lo(i) = pts(j - 1) + 1L
            case None =>
              lo(i) = pts.last + 1L
          }
        }
      }
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        probs.zipWithIndex.map { case (p, i) => Row(p, lo(i)) }.asJava, schema)
    } finally vals.unpersist(blocking = false)
  }

  /** Per-GROUP exact quantiles — the "p99 latency per host" shape with
    * the same no-sort/no-data-shuffle selection: returns (groupCol, prob,
    * value) for every group × prob.
    *
    * Per round, ONE scan serves every group and probe at once: a
    * broadcast 1:1 join attaches each group's current split arrays (no
    * row amplification), a codegen HOF computes each row's bucket index
    * per probe, and a single groupBy(group) emits conditional bucket
    * counts — |groups| × (probes·(S+1)) longs to the driver, which
    * re-brackets. Driver state is O(groups·probes) longs, guarded by
    * `maxGroups` (beyond it, group-local windowed selection is the right
    * tool — this operator is for the many-rows-per-group regime).
    * Rounds = ⌈log₁₆(widest group range)⌉; groups whose every probe has
    * closed drop out of later rounds' join frame. */
  def exactQuantilesBy(df: DataFrame, groupCol: String, valueCol: String,
                       probs: Seq[Double], maxGroups: Int = 100000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0,1]: $probs")
    val spark = df.sparkSession
    val S = 15
    val vals = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = vals.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
        .limit(maxGroups + 1).collect()
      require(stats.length <= maxGroups,
        s"more than $maxGroups groups — use a windowed per-group selection " +
          "for the many-small-groups regime")
      val outSchema = StructType(Seq(
        df.schema(groupCol),
        StructField("prob", DoubleType, nullable = false),
        StructField("value", LongType, nullable = false)))
      if (stats.isEmpty)
        return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
      val groups = stats.map(_.get(0))
      val ranks = stats.map(r => probs.map(p =>
        math.floor(p * (r.getLong(1) - 1)).toLong + 1L).toArray)
      val lo = stats.map(r => probs.map(_ => r.getLong(2)).toArray)
      val hi = stats.map(r => probs.map(_ => r.getLong(3)).toArray)
      def openGroups: Seq[Int] = groups.indices.filter(gi =>
        probs.indices.exists(pi => lo(gi)(pi) < hi(gi)(pi)))
      def splitsFor(gi: Int, pi: Int): Seq[Long] = {
        val (l, h) = (lo(gi)(pi), hi(gi)(pi))
        if (l >= h) Seq.empty
        else if (h - l <= S) (l until h).toSeq
        else (1 to S).map(j => l + Math.floorDiv(h - l, S + 1) * j).distinct
      }
      while (openGroups.nonEmpty) {
        val open = openGroups
        val splitRows = open.map { gi =>
          Row.fromSeq(groups(gi) +: probs.indices.map(pi => splitsFor(gi, pi)))
        }
        val splitSchema = StructType(df.schema(groupCol).copy(name = "g") +:
          probs.indices.map(pi => StructField(s"sp$pi",
            org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
            nullable = false)))
        import scala.jdk.CollectionConverters._
        val splitsDf = spark.createDataFrame(splitRows.asJava, splitSchema)
        val joined = vals.join(broadcast(splitsDf), Seq("g"))
        // bucket index per probe = #splits STRICTLY BELOW v (0..|splits|):
        // buckets 0..j then sum to exactly count(v <= pts(j)) — a `≤ v`
        // bucket would lose the rows equal to the split. One conditional
        // count column per (probe, bucket), a single scan for everything.
        val aggCols = probs.indices.flatMap { pi =>
          val bucket = size(filter(col(s"sp$pi"), x => x < col("v")))
          (0 to S).map(b =>
            sum(when(bucket === b, 1L).otherwise(0L)).as(s"c${pi}_$b"))
        }
        val counts = joined.groupBy(col("g"))
          .agg(aggCols.head, aggCols.tail: _*).collect()
          .map(r => r.get(0) -> r).toMap
        open.foreach { gi =>
          val row = counts(groups(gi))
          probs.indices.foreach { pi =>
            val pts = splitsFor(gi, pi)
            if (pts.nonEmpty) {
              // cumulative count at split j = Σ buckets 0..j
              var cum = 0L
              val cums = pts.indices.map { j =>
                cum += row.getLong(1 + pi * (S + 1) + j); cum }
              val hit = pts.indices.find(j => cums(j) >= ranks(gi)(pi))
              hit match {
                case Some(j) =>
                  hi(gi)(pi) = pts(j)
                  if (j > 0) lo(gi)(pi) = pts(j - 1) + 1L
                case None => lo(gi)(pi) = pts.last + 1L
              }
            }
          }
        }
      }
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        groups.indices.flatMap(gi => probs.zipWithIndex.map { case (p, pi) =>
          Row(groups(gi), p, lo(gi)(pi)) }).asJava, outSchema)
    } finally vals.unpersist(blocking = false)
  }

  /** DuckDB mirror for one probe: the explicit rank formulation (no
    * dependence on any engine's quantile interpolation mode) — smallest
    * value whose 1-indexed rank reaches ⌊q·(n-1)⌋+1. */
  def exactQuantileSql(table: String, valueExpr: String, prob: Double): String =
    s"""SELECT CAST($prob AS DOUBLE) AS prob, min(v) AS value FROM (
       |  SELECT v, row_number() OVER (ORDER BY v) AS rn
       |  FROM (SELECT $valueExpr AS v FROM $table WHERE $valueExpr IS NOT NULL))
       |WHERE rn >= CAST(floor($prob * ((SELECT count($valueExpr) FROM $table) - 1))
       |              AS BIGINT) + 1""".stripMargin
}
