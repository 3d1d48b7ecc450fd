package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: phase-by-phase timing of the kTruss pipeline over the
  * BUYS-enriched TPC-H graph (the bench's graph_ktruss shape), to locate
  * where its wall-clock goes before optimizing it. */
object ProfileKtruss {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val base = graft.graph.PropertyGraph.fromTpch(
      Tables.t(spark, d, "customer"), Tables.t(spark, d, "nation"),
      Tables.t(spark, d, "region"), Tables.t(spark, d, "supplier"))
    val buys = Tables.t(spark, d, "orders")
      .join(Tables.t(spark, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("customer:"), col("o_custkey")).as("src"),
        concat(lit("supplier:"), col("l_suppkey")).as("dst"))
      .distinct()
      .select(col("src"), col("dst"), lit("BUYS").as("rel"),
        typedLit(Map.empty[String, String]).as("eattrs"))
    val gB = time("build gBuys + checkpoint") {
      graft.graph.PropertyGraph(base.vertices, base.edges.unionByName(buys))
        .checkpointLocal()
    }
    // warm run
    time("kTruss warm") { gB.kTruss(k = 3).count() }

    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val edges = gB.edges
      val e0 = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
      val n0 = time(s"run$i e0 distinct count") { e0.count() }
      println(s"[prof] |e0| = $n0")
      val sup = time(s"run$i wedge+close join") {
        val w = e0.select(col("u"), col("v").as("x"))
          .join(e0.select(col("u"), col("v").as("y")), Seq("u"))
          .filter(col("x") < col("y"))
          .join(e0.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
        w.count()
      }
      println(s"[prof] |tris| = $sup")
      spark.catalog.clearCache()
      time(s"run$i kTruss full") { gB.kTruss(k = 3).count() }
      spark.catalog.clearCache()
      time(s"run$i kCore full") { gB.kCore(k = 10).count() }
    }
    spark.stop()
  }
}
