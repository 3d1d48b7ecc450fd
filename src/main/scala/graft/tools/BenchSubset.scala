package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only: time a subset of SparkEntry.queries (args = query names;
  * prefix match when a name ends with '*'). Mirrors Bench's discipline —
  * one warmup pass, clearCache before each timed run. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-subset")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // dev-only conf A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (args.isEmpty) all
      else all.filter(n => args.exists(a =>
        if (a.endsWith("*")) n.startsWith(a.dropRight(1)) else n == a))
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[subset] warmup $n failed: ${e.getMessage}") }
    }
    // median + min of 3 inside ONE warmed JVM — mirrors Bench exactly, so
    // A/B deltas on this tool transfer to the tracked bench
    var totalMed = 0.0
    var totalMin = 0.0
    names.foreach { name =>
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[subset] $name FAILED: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      totalMed += runs(1); totalMin += runs(0)
      println(f"[subset] $name%-28s med ${runs(1)}%7.2f s  min ${runs(0)}%7.2f s")
    }
    println(f"[subset] TOTAL med ${totalMed}%.2f s  min ${totalMin}%.2f s over ${names.length} queries")
    spark.stop()
  }
}
