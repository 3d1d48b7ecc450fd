package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY §2.7).
  *
  * The reference's two stream-shaped behaviors — continuous ingest with
  * synchronous index/materialized-join maintenance (server.py:781-894) and
  * nothing else — map to:
  *   1. `maintainJoin`: foreachBatch incremental maintenance of a CREATE
  *      JOIN view (J5/M3) — each micro-batch joins only its delta against
  *      the dimension and appends, so view freshness tracks ingest without
  *      recomputing history.
  *   2. windowed / sessionized aggregation as new capability: the same
  *      groupBy(window(...)) plan TimeSuite checks in batch runs
  *      incrementally here with watermark-bounded state.
  *
  * Everything takes plain DataFrames, so MemoryStream drives the tests and
  * `readStream.parquet` drives production — the plans are identical.
  */
object Streams {

  /** Tumbling-window counts with watermarking: state is bounded by
    * (watermark horizon / slide) per key — safe at any ingest rate. */
  def windowedCounts(events: DataFrame, tsCol: String, windowLen: String,
                     watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  final case class SessionEvent(user_id: Long, ts_millis: Long)
  final case class SessionOut(user_id: Long, n_events: Int,
                              start_millis: Long, end_millis: Long)

  /** Gap-based sessionization via flatMapGroupsWithState — the custom-state
    * shape (KeyValueGroupedDataset) the reference has no analog for.
    *
    * State per key is one open (count, start, end) triple. A session is
    * EMITTED when it closes: either a new event lands more than `gapMillis`
    * after the session's end (gap rollover), or the event-time watermark
    * passes end + gap (EventTimeTimeout) — at which point the key's state is
    * removed, so state size is bounded by the number of keys *active within
    * one gap of the watermark*, not total key cardinality. */
  def sessionize(events: Dataset[SessionEvent], gapMillis: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("__ts", timestamp_millis(col("ts_millis")))
      .withWatermark("__ts", s"$gapMillis milliseconds")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Int, Long, Long), SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[(Int, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, s0, e0) = state.get
            state.remove()
            Iterator.single(SessionOut(uid, n, s0, e0))
          } else {
            val closed = Seq.newBuilder[SessionOut]
            var st = state.getOption
            it.toSeq.sortBy(_.ts_millis).foreach { e =>
              st = st match {
                case Some((n, s0, e0)) if e.ts_millis - e0 > gapMillis =>
                  closed += SessionOut(uid, n, s0, e0)
                  Some((1, e.ts_millis, e.ts_millis))
                case Some((n, s0, e0)) =>
                  Some((n + 1, math.min(s0, e.ts_millis), math.max(e0, e.ts_millis)))
                case None =>
                  Some((1, e.ts_millis, e.ts_millis))
              }
            }
            st.foreach { case s @ (_, _, end) =>
              state.update(s)
              // timeout must stay ahead of the current watermark
              state.setTimeoutTimestamp(
                math.max(end + gapMillis, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup — the ingest-time twin of Dedup.exactByHash:
    * keeps the first row per key (e.g. a content hash computed upstream in
    * the select) and drops later duplicates. dropDuplicatesWithinWatermark
    * bounds the dedup state to the watermark horizon, so state is
    * O(distinct keys per horizon), not O(all keys ever) — the property that
    * makes ingest-dedup runnable forever at 100 TB/day. Exactness holds for
    * duplicates arriving within the horizon; cross-horizon dups need the
    * batch pass (Dedup.exactByHash) downstream. */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** S1 continuous KV ingest (the reference's POST /set write path,
    * server.py:80-103): a stream of (pk, sk, value) rows lands in the
    * pk-bucketed layout incrementally — each micro-batch is hash-bucketed
    * on pk and appended, so the at-rest layout keeps the partition-pruning
    * property of KvStore.writeOptimized without rewriting history. The
    * reference's synchronous index maintenance becomes "derived columns
    * computed in the select before this sink" (e.g. FTS tokens). */
  def ingestKv(kvStream: DataFrame, outPath: String, checkpoint: String,
               buckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    kvStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.repartition(buckets, col("pk"))
          .sortWithinPartitions("pk", "sk")
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** J5 materialized-join maintenance: stream ⋈ dimension, appended
    * per micro-batch to a parquet-backed view. The delta-only join is the
    * insert-time reverse probe of the reference (server.py:806-894) —
    * except distributed, idempotent (checkpointed), and broadcast when the
    * dimension is small. */
  def maintainJoin(stream: DataFrame, dim: DataFrame, joinExpr: org.apache.spark.sql.Column,
                   outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    maintainJoinN(stream, Seq(dim -> joinExpr), outPath, checkpoint)

  /** n-way twin of [[maintainJoin]] for chained CREATE JOIN views (the
    * reference's own create-join is 3-way): each micro-batch's delta folds
    * through every dimension join and appends — the at-rest view is the
    * same left-deep chain `MatView` routes to at read time. */
  def maintainJoinN(stream: DataFrame,
                    dims: Seq[(DataFrame, org.apache.spark.sql.Column)],
                    outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dims.foldLeft(batch) { case (acc, (dim, expr)) =>
          acc.join(broadcast(dim), expr)
        }.write.mode("append").parquet(outPath)
      }
      .start()
}
