package graft

import java.nio.file.Files
import graft.core.Tables
import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().sorted.toSeq

  test("parquet round-trip with partitioning") {
    val out = Files.createTempDirectory("src_pq").toString
    val orders = Tables.t(spark, sf, "orders")
    Sources.writeParquet(orders, out, partitionBy = Seq("o_orderstatus"))
    val back = Sources.readParquet(spark, out).select(orders.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(canon(back) == canon(orders))
  }

  test("jsonl round-trip preserves timestamps") {
    val out = Files.createTempDirectory("src_jl").toString
    val orders = Tables.t(spark, sf, "orders")
    Sources.writeJsonl(orders, out)
    val back = Sources.readJsonl(spark, out, orders.schema)
    assert(canon(back) == canon(orders))
  }

  test("csv round-trip with explicit schema") {
    val out = Files.createTempDirectory("src_csv").toString
    val nation = Tables.t(spark, sf, "nation")
    Sources.writeCsv(nation, out)
    val back = Sources.readCsv(spark, out, nation.schema)
    assert(canon(back) == canon(nation))
  }

  test("dump emits one JSON string per row") {
    val region = Tables.t(spark, sf, "region")
    val dumped = Sources.toJsonStrings(region)
    assert(dumped.count() == region.count())
    assert(dumped.columns.toSeq == Seq("json"))
  }
}
