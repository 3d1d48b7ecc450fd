package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain suites under [[graft.queries]];
  * each entry pairs a Spark implementation with (where expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  private val suites: Seq[Suite] = Seq(
    RelationalSuite, KvSuite, FtsSuite, TimeSuite, DocSuite, GraphSuite,
    LlmSuite, HashqlSuite, SketchSuite)

  private lazy val all: Map[String, Q] =
    suites.foldLeft(Map.empty[String, Q]) { (acc, s) =>
      val dup = acc.keySet.intersect(s.defs.keySet)
      require(dup.isEmpty, s"duplicate query names across suites: $dup")
      acc ++ s.defs
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
