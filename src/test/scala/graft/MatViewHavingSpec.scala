package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.matview.MatView

/** HAVING containment: a Filter ABOVE the re-aggregation that references
  * only re-aggregated outputs is containment-safe (it filters the FINAL
  * groups, after the summary fold) — the route must survive it.
  * A HAVING over a non-derivable aggregate (countDistinct) must still
  * fall back to fact rows. */
class MatViewHavingSpec extends SparkSpec {
  import spark.implicits._

  private def base = Tables.t(spark, sf, "customer")
    .join(Tables.t(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
    .join(Tables.t(spark, sf, "region"), col("n_regionkey") === col("r_regionkey"))

  test("HAVING over re-aggregated outputs keeps the summary route; non-derivable falls back") {
    val agg = base.groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), min(col("c_custkey")).as("mn"))
    val out = java.nio.file.Files.createTempDirectory("mv_having").toString
    MatView.materializeAggregate(spark, "cn_having", agg, out)
    try {
      // GROUP BY subset HAVING count(*) > k — filter over the FINAL
      // re-aggregated groups, served from the summary with zero fact rows
      val q = base.groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"), min(col("c_custkey")).as("mn"))
        .filter(col("cnt") > 5)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(out.split("/").last), s"no summary scan in:\n$plan")
      assert(!plan.contains("Join"), s"HAVING containment read fact rows:\n$plan")
      val routed = q.as[(String, Long, Long)].collect().toSet
      // HAVING over a NON-derivable aggregate must fall back to facts
      val qBad = base.groupBy(col("n_name"))
        .agg(countDistinct(col("c_mktsegment")).as("nseg"))
        .filter(col("nseg") > 1)
      assert(qBad.queryExecution.executedPlan.toString.contains("Join"),
        "countDistinct HAVING should not route")
      MatView.drop(spark, "cn_having")
      val raw = q.as[(String, Long, Long)].collect().toSet
      assert(routed == raw, s"routed=$routed raw=$raw")
    } finally MatView.drop(spark, "cn_having")
  }

  test("SQL HAVING (incl. an agg NOT in the select list) keeps the summary route") {
    val agg = base.groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), min(col("c_custkey")).as("mn"))
    val out = java.nio.file.Files.createTempDirectory("mv_having_sql").toString
    MatView.materializeAggregate(spark, "cn_having_sql", agg, out)
    base.createOrReplaceTempView("cnr_having")
    try {
      // the analyzer plans HAVING over an agg absent from the select list
      // by ADDING a hidden aggregate output — that output must re-derive
      // from the summary too, or the route dies
      val q = spark.sql(
        """SELECT n_name, count(1) AS cnt FROM cnr_having
          |GROUP BY n_name HAVING min(c_custkey) < 500""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(out.split("/").last), s"no summary scan in:\n$plan")
      assert(!plan.contains("Join"), s"SQL HAVING containment read fact rows:\n$plan")
      val routed = q.as[(String, Long)].collect().toSet
      MatView.drop(spark, "cn_having_sql")
      val raw = q.as[(String, Long)].collect().toSet
      assert(routed == raw, s"routed=$routed raw=$raw")
    } finally {
      MatView.drop(spark, "cn_having_sql")
      spark.catalog.dropTempView("cnr_having")
    }
  }
}
