package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.kv.KvStore

/** KV surface t2 coverage: the five DynamoDB-style query shapes (SURVEY
  * §2.9 D1-D5) plus the put/get/delete write path (§2.1 S1-S3), exercised
  * over the events table mapped to (pk, sk, value) — see
  * [[KvStore.fromEvents]]. Every oracle shares the same mapping CTE so the
  * Spark and DuckDB sides cannot drift.
  */
object KvSuite extends Suite {

  private def kv(s: org.apache.spark.sql.SparkSession, d: String): KvStore =
    KvStore.fromEvents(Tables.t(s, d, "events"))

  private def withKv(sql: String): String =
    s"WITH kv AS (${KvStore.fromEventsOracleSql})\n$sql"

  def defs: Map[String, Q] = Map(

    // S1+S2+S3 composed: put two rows, delete one, read the survivor back.
    "kv_put_get_delete" -> Q(
      (s, d) => kv(s, d)
        .put("user-x", "test#0000000001", "v1")
        .put("user-x", "test#0000000002", "v2")
        .delete("user-x", "test#0000000002")
        .queryBegins("user-x", "test"),
      Some("SELECT 'user-x' AS pk, 'test#0000000001' AS sk, 'v1' AS value")),

    // S7 full-node dump (reference GET /dump, client.py:214-216).
    "kv_dump" -> Q(
      (s, d) => kv(s, d).dump(),
      Some(withKv("SELECT pk, sk, value FROM kv"))),

    // D1 query_begins: pk exact + sk prefix, ascending.
    "kv_d1_begins" -> Q(
      (s, d) => kv(s, d).queryBegins("user-0013", "click"),
      Some(withKv(
        """SELECT pk, sk, value FROM kv
          |WHERE pk = 'user-0013' AND sk LIKE 'click%' ORDER BY sk""".stripMargin))),

    // D2 query_pk_sk_begins: both prefixes, descending.
    "kv_d2_pk_sk_begins" -> Q(
      (s, d) => kv(s, d).queryPkSkBegins("user-001", "purchase", desc = true),
      Some(withKv(
        """SELECT pk, sk, value FROM kv
          |WHERE pk LIKE 'user-001%' AND sk LIKE 'purchase%' ORDER BY sk DESC""".stripMargin))),

    // D3 query_between: pk exact + sk inclusive range.
    "kv_d3_between" -> Q(
      (s, d) => kv(s, d).queryBetween("user-0020",
        "click#0000000000", "click#0000005000"),
      Some(withKv(
        """SELECT pk, sk, value FROM kv
          |WHERE pk = 'user-0020'
          |  AND sk BETWEEN 'click#0000000000' AND 'click#0000005000'
          |ORDER BY sk""".stripMargin))),

    // D4 both_between: pk range × sk range.
    "kv_d4_both_between" -> Q(
      (s, d) => kv(s, d).bothBetween(
        "user-0010", "user-0019", "error#", "error#9999999999"),
      Some(withKv(
        """SELECT pk, sk, value FROM kv
          |WHERE pk BETWEEN 'user-0010' AND 'user-0019'
          |  AND sk BETWEEN 'error#' AND 'error#9999999999'
          |ORDER BY sk""".stripMargin))),

    // D5 query_greater_than: pk exact + sk prefix + sk > bound.
    "kv_d5_greater_than" -> Q(
      (s, d) => kv(s, d).queryGreaterThan("user-0005", "view", "view#0000002000"),
      Some(withKv(
        """SELECT pk, sk, value FROM kv
          |WHERE pk = 'user-0005' AND sk LIKE 'view%' AND sk > 'view#0000002000'
          |ORDER BY sk""".stripMargin))),

    // S8 bootstrap re-shard: write the pk-hash-bucketed / (pk,sk)-sorted
    // layout (the reference's consistent-hash ring at rest), read it back,
    // and answer a D3 range query from the re-sharded copy — same oracle as
    // kv_d3_between, so the layout provably preserves query semantics.
    "kv_optimized_between" -> Q(
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_kvopt").toString
        kv(s, d).writeOptimized(tmp, buckets = 32)
        KvStore(s.read.parquet(tmp)).queryBetween("user-0020",
          "click#0000000000", "click#0000005000")
      },
      Some(withKv(
        """SELECT pk, sk, value FROM kv
          |WHERE pk = 'user-0020'
          |  AND sk BETWEEN 'click#0000000000' AND 'click#0000005000'
          |ORDER BY sk""".stripMargin))),

    // D5 query_before_than: pk exact + sk prefix + sk < bound.
    "kv_d5_before_than" -> Q(
      (s, d) => kv(s, d).queryBeforeThan("user-0005", "view", "view#0000005000"),
      Some(withKv(
        """SELECT pk, sk, value FROM kv
          |WHERE pk = 'user-0005' AND sk LIKE 'view%' AND sk < 'view#0000005000'
          |ORDER BY sk""".stripMargin)))
  )
}
