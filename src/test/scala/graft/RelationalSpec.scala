package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.kv.KvStore

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.t(spark, sf, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05,
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("writeOptimized layout answers point lookups from one bucket") {
    val out = java.nio.file.Files.createTempDirectory("kv_opt").toString
    val store = KvStore.fromEvents(Tables.t(spark, sf, "events"))
    store.writeOptimized(out, buckets = 8)
    val reread = KvStore(spark.read.parquet(out))
    // same answer as the in-memory store for a D1 query
    val a = store.queryBegins("user-0013", "click").collect().map(_.toSeq)
    val b = reread.queryBegins("user-0013", "click").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("rolling_hash registers as a SQL function (codegen + interpreted agree)") {
    graft.functions.RollingHash.register(spark)
    val h = spark.sql("SELECT rolling_hash('hello world') AS h").as[Long].head()
    // reference value independently computed by the DuckDB list_reduce fold
    assert(h == 285884129L)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
