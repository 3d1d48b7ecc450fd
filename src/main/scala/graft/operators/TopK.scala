package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact top-k rows per group WITHOUT a window sort.
  *
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` — the stock Spark
  * shape — shuffles every row and SORTS EVERY GROUP IN FULL to keep k of
  * them: at 100 TB the sort dominates and a hot group's sort spills. The
  * selection identity says only k rows per group per partition can ever
  * survive, so this runs two bounded folds instead: a per-partition
  * bounded heap (k rows per live group — the same shape as
  * [[graft.sketch.Kmv.sketch]]'s phase 1), then one shuffle of those
  * ≤ nPart·k survivors per group and a second bounded fold per group.
  * No Sort node, no full-group materialization, memory k·groups rows per
  * partition.
  *
  * Ordering is (ordCol, tieCol) ascending, both cast to long; the
  * REQUIRED tiebreak column is what makes "top k" a deterministic set —
  * `row_number` under ties silently returns an arbitrary one. Returns the
  * input columns plus `rank` (1-based within the group). */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[String], ordCol: String,
               tieCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val nGroup = groupCols.length
    val prepared = df.select(
      (groupCols.map(col) :+ col(ordCol).cast("long").as("graft_topk_ord")
        :+ col(tieCol).cast("long").as("graft_topk_tie")
        :+ struct(df.columns.map(col): _*).as("graft_topk_row")): _*)
    val schema = prepared.schema
    implicit val ord: Ordering[(Long, Long, Row)] =
      Ordering.by { case (o, t, _) => (o, t) }
    def boundedFold(it: Iterator[Row]): Iterator[Row] = {
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[(Long, Long, Row)]]
      it.foreach { r =>
        val key = (0 until nGroup).map(r.get)
        val q = m.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty) // max-heap on (ord, tie)
        q.enqueue((r.getLong(nGroup), r.getLong(nGroup + 1),
          r.getStruct(nGroup + 2)))
        if (q.size > k) q.dequeue() // evict the current worst
      }
      m.iterator.flatMap { case (key, q) =>
        q.iterator.map { case (o, t, row) =>
          Row.fromSeq(key ++ Seq(o, t, row)) }
      }
    }
    val phase1 = spark.createDataFrame(
      prepared.rdd.mapPartitions(boundedFold), schema)
    // phase 2: co-locate each group's ≤ nPart·k survivors, fold again —
    // now exactly the k smallest per group; rank by in-group sort of the
    // k retained rows (k elements — driver-free, trivially cheap)
    val phase2 = spark.createDataFrame(
      (if (nGroup == 0) phase1.repartition(1)
       else phase1.repartition(groupCols.map(col): _*))
        .rdd.mapPartitions(boundedFold), schema)
    phase2
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(
        struct(col("graft_topk_ord"), col("graft_topk_tie"),
          col("graft_topk_row")))).as("graft_topk_sorted"))
      .select(posexplode(col("graft_topk_sorted")).as(Seq("graft_topk_pos", "s")))
      .selectExpr("s.graft_topk_row.*",
        "CAST(graft_topk_pos + 1 AS INT) AS rank")
  }
}
