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
  * range refinement on the VALUE DOMAIN is neither: each round computes a
  * ≤4096-bucket HISTOGRAM of each still-open quantile's bracket — one
  * partial-agg scan whose exchange carries at most B+1 count rows per
  * probe, no Sort, no Exchange of data rows — and narrows the bracket
  * 4096-fold. ⌈log₄₀₉₆(max-min)⌉ rounds total (≤ 6 for the full long
  * domain, 2 for cent-scaled prices), executor memory O(B).
  * The classic trade
  * vs one full sort-shuffle: k cheap scans instead of one expensive
  * shuffle — at cluster scale the scans win whenever the scan is cheaper
  * than shuffling the column (it virtually always is for wide tables
  * where the scan reads ONE pruned column). All probes advance in the
  * SAME pass (a per-probe bucket-struct explode feeding one aggregation),
  * so the pass count is the max over probes, not the sum.
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
      val base = probs.map(_ => 0L).toArray // rows with v < lo(i)
      // invariant: the rank-th smallest value lies in [lo(i), hi(i)] and
      // base(i) = count(v < lo(i)) globally.
      // (round 16) HISTOGRAM rounds replace the 15-split conditional-sum
      // search: each round computes ONE narrow groupBy histogram over
      // bucket = (v − lo) div w, w sized so at most B buckets exist. The
      // shuffle moves ≤ B+1 post-aggregation rows per probe (map-side
      // combined — at any corpus scale each task emits ≤ B+1 partials),
      // the driver re-brackets on the cumulative counts, and the span
      // shrinks B-fold per SCAN instead of 16-fold: a cent-scaled 1e7
      // domain closes in 2 scans instead of 6. The per-round generated
      // code is one integer division instead of probes×15 conditional
      // sums — widening the sum fan-out instead (S=63) was measured at
      // 3.3 s → 13 s on the bench: every round recompiled a huge
      // aggregate class, so codegen width is NOT free; a narrow groupBy
      // with thousands of buckets is. All open probes ride one job: a
      // per-probe (p, bucket) struct explode feeds the same aggregation.
      val B = 4096L
      while (probs.indices.exists(i => lo(i) < hi(i))) {
        val open = probs.indices.filter(i => lo(i) < hi(i))
        val w = open.map { i =>
          val span = hi(i) - lo(i) // hi > lo ⇒ positive, no overflow at ±2^62 domains
          i -> (Math.floorDiv(span, B) + 1L) // buckets = span div w ≤ B
        }.toMap
        val pbCols = open.map { i =>
          struct(lit(i).as("p"),
            when(col("v") >= lo(i) && col("v") <= hi(i),
              expr(s"(v - (${lo(i)}L)) div ${w(i)}L")).as("b"))
        }
        val hist = vals.select(explode(array(pbCols: _*)).as("e"))
          .filter(col("e.b").isNotNull)
          .groupBy(col("e.p").as("p"), col("e.b").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
        val byProbe = hist.groupBy(_.getInt(0))
        open.foreach { i =>
          val buckets = byProbe.getOrElse(i, Array.empty[Row])
            .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
          var cum = base(i)
          var j = 0
          var done = false
          while (!done && j < buckets.length) {
            val (b, c) = buckets(j)
            if (cum + c >= ranks(i)) {
              // the rank-th value sits inside bucket b: narrow to it and
              // remember how many rows sit strictly below its low edge
              base(i) = cum
              lo(i) = lo(i) + b * w(i)
              hi(i) = math.min(hi(i), lo(i) + w(i) - 1L)
              done = true
            } else { cum += c; j += 1 }
          }
          // count(v <= hi) ≥ rank by the invariant, so a bucket always hits
          require(done, s"quantile bracket lost rank ${ranks(i)} in probe $i")
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
    * broadcast 1:1 join attaches each group's current bracket (lo, hi,
    * bucket width) per probe, each row computes its in-bracket bucket by
    * one integer division, and a single partial-agg'd
    * groupBy(group, probe, bucket) histogram returns at most
    * |groups| × probes × (B+1) count rows to the driver, which
    * re-brackets on the cumulative counts. Driver state is
    * O(groups·probes) longs, guarded by `maxGroups` (beyond it,
    * group-local windowed selection is the right tool — this operator is
    * for the many-rows-per-group regime).
    * Rounds = ⌈log_B(widest group range)⌉ with B adapted to keep the
    * collected histogram driver-bounded; groups whose every probe has
    * closed drop out of later rounds' join frame. */
  def exactQuantilesBy(df: DataFrame, groupCol: String, valueCol: String,
                       probs: Seq[Double], maxGroups: Int = 100000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0,1]: $probs")
    val spark = df.sparkSession
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
      val base = stats.map(_ => probs.map(_ => 0L).toArray) // in-group v < lo
      def openGroups: Seq[Int] = groups.indices.filter(gi =>
        probs.indices.exists(pi => lo(gi)(pi) < hi(gi)(pi)))
      // (round 16) histogram rounds, same rewrite as [[exactQuantiles]]:
      // per round ONE scan computes a ≤B-bucket in-bracket histogram per
      // (group, probe) — bucket = (v − lo) div w evaluated against the
      // broadcast per-group bracket frame, a per-probe struct explode
      // feeding one partial-agg'd groupBy(g, p, bucket). The driver
      // re-brackets on cumulative counts; brackets shrink B-fold per
      // scan (the split-array formulation shrank them 16-fold and paid a
      // probes×16-column aggregate). B adapts so the collected histogram
      // stays driver-bounded regardless of the group count.
      val B = math.max(64L, (1L << 19) / (stats.length.toLong * probs.length))
      def widthOf(gi: Int, pi: Int): Long =
        Math.floorDiv(hi(gi)(pi) - lo(gi)(pi), B) + 1L
      while (openGroups.nonEmpty) {
        val open = openGroups
        val splitRows = open.map { gi =>
          Row.fromSeq(groups(gi) +: probs.indices.flatMap[Any] { pi =>
            if (lo(gi)(pi) < hi(gi)(pi))
              Seq(lo(gi)(pi), hi(gi)(pi), widthOf(gi, pi))
            else Seq(null, null, null)
          })
        }
        val splitSchema = StructType(df.schema(groupCol).copy(name = "g") +:
          probs.indices.flatMap(pi => Seq(
            StructField(s"lo$pi", LongType, nullable = true),
            StructField(s"hi$pi", LongType, nullable = true),
            StructField(s"w$pi", LongType, nullable = true))))
        import scala.jdk.CollectionConverters._
        val splitsDf = spark.createDataFrame(splitRows.asJava, splitSchema)
        val joined = vals.join(broadcast(splitsDf), Seq("g"))
        val pbCols = probs.indices.map { pi =>
          struct(lit(pi).as("p"),
            when(col(s"lo$pi").isNotNull &&
                col("v") >= col(s"lo$pi") && col("v") <= col(s"hi$pi"),
              expr(s"(v - lo$pi) div w$pi")).as("b"))
        }
        val hist = joined
          .select(col("g"), explode(array(pbCols: _*)).as("e"))
          .filter(col("e.b").isNotNull)
          .groupBy(col("g"), col("e.p").as("p"), col("e.b").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
        val byGroup = hist.groupBy(_.get(0))
        open.foreach { gi =>
          val byProbe = byGroup.getOrElse(groups(gi), Array.empty[Row])
            .groupBy(_.getInt(1))
          probs.indices.foreach { pi =>
            if (lo(gi)(pi) < hi(gi)(pi)) {
              val wv = widthOf(gi, pi)
              val buckets = byProbe.getOrElse(pi, Array.empty[Row])
                .map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
              var cum = base(gi)(pi)
              var j = 0
              var done = false
              while (!done && j < buckets.length) {
                val (b, c) = buckets(j)
                if (cum + c >= ranks(gi)(pi)) {
                  base(gi)(pi) = cum
                  lo(gi)(pi) = lo(gi)(pi) + b * wv
                  hi(gi)(pi) = math.min(hi(gi)(pi), lo(gi)(pi) + wv - 1L)
                  done = true
                } else { cum += c; j += 1 }
              }
              require(done,
                s"quantile bracket lost rank ${ranks(gi)(pi)} in group ${groups(gi)}")
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
