package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mutable session catalog with the reference's dynamic-schema semantics
  * (SURVEY §1.3, §2.10): tables exist because an INSERT mentioned them, a
  * table's columns are the union of every insert's fields
  * (/root/reference/server.py:718-723), each insert synthesizes a monotonic
  * `id` (server.py:725-728,757-771), and values are `Long` when the literal
  * is numeric else `String` (server.py:477-478,500-502).
  *
  * Row-at-a-time writes union small DataFrames — matching the reference's
  * per-request ingest. Bulk ingest (`register`) is the scale path: any
  * DataFrame becomes a table, and appends to parquet-backed tables stay
  * appends. UPDATE/DELETE are copy-on-write plan rewrites; at 100 TB those
  * rewrite only affected partitions of a partitioned table.
  */
final class GraftCatalog(val spark: SparkSession) {

  private var tables = Map.empty[String, DataFrame]
  private var counters = Map.empty[String, Long]

  def register(name: String, df: DataFrame): Unit = tables += name -> df

  def table(name: String): DataFrame =
    tables.getOrElse(name, throw new IllegalArgumentException(s"no such table: $name"))

  def exists(name: String): Boolean = tables.contains(name)
  def names: Seq[String] = tables.keys.toSeq.sorted

  /** M1 INSERT: dynamic-schema append with synthesized id. */
  def insert(name: String, values: Seq[(String, Any)]): Long = {
    val id = counters.getOrElse(name, 0L) + 1
    counters += name -> id
    val fields = ("id" -> (id: Any)) +: values
    val schema = StructType(fields.map { case (f, v) =>
      StructField(f, v match {
        case _: Long | _: Int => LongType
        case _ => StringType
      })
    })
    val row = Row.fromSeq(fields.map {
      case (_, v: Int) => v.toLong
      case (_, v) => v
    })
    val rowDf = spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
    tables += name -> (tables.get(name) match {
      case Some(existing) => existing.unionByName(rowDf, allowMissingColumns = true)
      case None => rowDf
    })
    id
  }

  /** M2 UPDATE … SET … WHERE (copy-on-write `when` projection). */
  def update(name: String, setField: String, setValue: Any,
             where: org.apache.spark.sql.Column): Unit = {
    val df = table(name)
    val v = setValue match { case i: Int => lit(i.toLong); case x => lit(x) }
    tables += name -> df.withColumn(setField,
      when(where, v).otherwise(if (df.columns.contains(setField)) col(setField)
      else lit(null)))
  }

  /** S3 DELETE as anti-filter. Only rows where the predicate is TRUE are
    * deleted: a NULL predicate (dynamic-schema row missing the WHERE
    * field) keeps the row, as SQL DELETE does — a bare `!where` would
    * silently drop those rows too, because Filter discards NULL. */
  def delete(name: String, where: org.apache.spark.sql.Column): Unit =
    tables += name -> table(name).filter(!coalesce(where, lit(false)))

  /** Checkpoint a table's accumulated plan (row-at-a-time inserts build a
    * union per row; updates stack projections) to parquet and re-register
    * the scan — plan depth returns to 1, results unchanged. The analog of
    * log compaction for the copy-on-write surfaces; at scale run it on a
    * cadence (or via Streams ingest, which lands in parquet directly).
    *
    * Safe to run REPEATEDLY against the same path: the write lands in a
    * tmp dir and swaps in via [[graft.sources.Sources.swapDir]] (a direct
    * overwrite would throw "cannot overwrite a path that is also being
    * read from" on the second call, because the registered scan reads the
    * path being rewritten), and a crash mid-swap auto-recovers on the
    * next invocation. */
  def compact(name: String, path: String): Unit = {
    val df = table(name)
    graft.sources.Sources.swapDir(spark, path) { tmp =>
      df.write.mode("overwrite").parquet(tmp)
    }
    tables += name -> spark.read.parquet(path)
  }
}
