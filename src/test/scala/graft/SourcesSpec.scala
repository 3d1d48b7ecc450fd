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

  test("compactParquet consolidates many small files, preserves rows, rejects partitioned dirs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("src_compact").toString + "/t"
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    // simulate per-micro-batch appends: many tiny file sets
    (0 until 8).foreach { i =>
      docs.filter(col("doc_id") % 8 === i).repartition(4)
        .write.mode("append").parquet(dir)
    }
    def parquetFiles =
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    val before = parquetFiles
    val beforeRows = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    Sources.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(parquetFiles < before, s"no consolidation: $before -> $parquetFiles")
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == beforeRows)
    assert(!new java.io.File(dir + ".compact.tmp").exists)
    assert(!new java.io.File(dir + ".compact.old").exists)
    // partitioned layout is rejected, not silently flattened
    val pdir = Files.createTempDirectory("src_compact_p").toString + "/p"
    docs.withColumn("b", col("doc_id") % 2)
      .write.partitionBy("b").parquet(pdir)
    intercept[IllegalArgumentException](Sources.compactParquet(spark, pdir))
  }

  test("compactParquet auto-recovers a stranded swap (crash between the two renames)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("src_recover").toString + "/t"
    val rows = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
    rows.repartition(6).write.parquet(dir)
    val expected = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    // simulate the crash window: old contents renamed aside, nothing live
    val f = new java.io.File(dir)
    assert(f.renameTo(new java.io.File(dir + ".compact.old")))
    // next invocation recovers the old dir, then compacts normally
    Sources.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == expected)
    assert(!new java.io.File(dir + ".compact.old").exists)
  }

  test("zValue interleaves bits exactly; z-ordered layout prunes on BOTH dims") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // golden: reference interleave computed in plain Scala
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (4095L, 4095L), (2897L, 1034L))
    val got = samples.toDF("x", "y")
      .select(Sources.zValue(col("x"), col("y"), 12)).as[Long].collect().toSeq
    assert(got == samples.map { case (x, y) => ref(x, y, 12) })

    // layout property on real events: z-order on (user_id, ts) vs a plain
    // ts sort. A narrow user_id slice must SKIP most z-ordered files by
    // min/max alone, while the ts-sorted layout spans all users in every
    // file (zero skipping on that dimension).
    val events = Tables.t(spark, sf, "events")
      .select(col("user_id").cast("long"), col("ts").cast("long"))
    val zDir = Files.createTempDirectory("zord").toString + "/z"
    val sDir = Files.createTempDirectory("zord").toString + "/s"
    Sources.writeZOrdered(events, zDir, "user_id", "ts", bits = 12, files = 8)
    events.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.parquet(sDir)
    def fileBoxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("nu"), max("user_id").as("xu"))
      .as[(String, Long, Long)].collect()
    val zBoxes = fileBoxes(zDir)
    val sBoxes = fileBoxes(sDir)
    assert(zBoxes.length >= 4 && sBoxes.length >= 4, "not enough files to compare")
    // the probe: users in the bottom ~eighth of the id range
    val (uMin, uMax) = events.agg(min("user_id"), max("user_id"))
      .as[(Long, Long)].head()
    val cut = uMin + (uMax - uMin) / 8
    def hit(boxes: Array[(String, Long, Long)]) =
      boxes.count { case (_, nu, _) => nu <= cut } // file overlaps [uMin, cut]
    assert(hit(sBoxes) == sBoxes.length,
      s"ts-sorted layout unexpectedly skips user files: ${hit(sBoxes)}/${sBoxes.length}")
    assert(hit(zBoxes) <= zBoxes.length / 2,
      s"z-order skipped too few files: ${hit(zBoxes)}/${zBoxes.length} hit")
    // layout-only: contents and schema survive the rewrite
    assert(spark.read.parquet(zDir).count() == events.count())
    assert(spark.read.parquet(zDir).columns.toSeq == Seq("user_id", "ts"))
  }

  test("writeShards: every doc lands once, shards are id-contiguous and token-balanced") {
    import graft.llm.TextAnalysis
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Files.createTempDirectory("src_shards").toString
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val budget = 2000L
    val manifest = Sources.writeShards(docs, "text", "doc_id", out, budget)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val back = spark.read.parquet(out)
    // exactly once, text preserved
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // id ranges per shard don't interleave (concat-and-chunk order)
    val ranges = back.groupBy("shard")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // token balance: every shard but the last holds >= budget - (straddler
    // slack) and none exceeds budget + the largest single document
    val maxDoc = docs.select(TextAnalysis.tokenCount(col("text")).cast("long"))
      .as[Long].collect().max
    manifest.init.foreach { case (s, _, toks) =>
      assert(toks >= budget - maxDoc && toks <= budget + maxDoc,
        s"shard $s holds $toks tokens (budget $budget, maxDoc $maxDoc)")
    }
    // manifest totals equal the corpus totals
    assert(manifest.map(_._2).sum == docs.count())
  }
}
