package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the dataset-versioning primitive a training
  * pipeline runs between crawl refreshes: which documents were added,
  * removed, or changed since the last snapshot? (The reference has no
  * versioning; this is SURVEY §2.12 growth, the operational complement to
  * dedup/decontamination.)
  *
  * Shape: each side reduces to `(id, md5(payload))` scan-side — the diff
  * join moves 16-byte digests, never documents — then ONE full-outer
  * shuffle join on the id classifies every id into
  * added/removed/changed/unchanged. At 100 TB: snapshots written with the
  * pk-bucketed layout ([[graft.kv.KvStore.writeOptimized]] pattern,
  * bucketed by id) diff with NO exchange at all — both sides are already
  * co-partitioned; otherwise it is one digest-sized shuffle. An
  * incremental twin falls out of Structured Streaming: the v2 scan as a
  * stream, `foreachBatch` anti/semi joins against v1's digest table.
  */
object Snapshot {

  /** `(id, md5)` digest projection — THE one definition of payload
    * equality, shared between [[diff]] and the streaming twin
    * ([[graft.streaming.Streams.snapshotDiffStream]]) so the two can
    * never diverge. Payload columns join with NUL (U+0000 — a code point
    * no sane text column contains, so no concat ambiguity); NULL payload
    * values encode as the separator char itself, so (NULL, 'a') and
    * ('a', NULL) digest differently, and NULL differs from ''.
    * Non-string payloads digest through their string form. */
  private[graft] def digests(d: DataFrame, idCol: String,
                             payloadCols: Seq[String], as: String): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    d.select(col(idCol), md5(concat_ws("\u0000",
      payloadCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(as))
  }

  /** Classify every id across two snapshot versions ([[digests]] defines
    * payload equality).
    *
    * Ids must be unique within each snapshot (they are the snapshot's
    * primary key); a duplicated id would fan out through the full-outer
    * join like any keyed join.
    *
    * @return one row per id in either version: (idCol, status) with
    *         status ∈ added | removed | changed | unchanged — "added"
    *         means present only in v2. */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String,
           payloadCols: Seq[String]): DataFrame = {
    def digest(d: DataFrame, as: String): DataFrame =
      digests(d, idCol, payloadCols, as)
    digest(v1, "h1").join(digest(v2, "h2"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** One-row summary of [[diff]] — the number a refresh report leads
    * with. Same plan plus a final single-partition count rollup. */
  def diffStats(v1: DataFrame, v2: DataFrame, idCol: String,
                payloadCols: Seq[String]): DataFrame =
    diff(v1, v2, idCol, payloadCols).agg(
      sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
      sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
      sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
      sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
}
