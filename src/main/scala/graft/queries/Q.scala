package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One t2-checkable query: a Spark implementation plus (where the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL. Column names
  * MUST match between the two — the driver sorts columns by name before
  * hashing values (builder contract).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait Suite {
  def defs: Map[String, Q]
}
