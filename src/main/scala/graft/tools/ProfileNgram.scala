package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Dedup

/** Dev-only stage profiler for the ngram-jaccard pipeline. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.t(spark, d, "documents")
    val base = docs.select(col("doc_id"), col("text"))
    val aug = base.unionByName(base.select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))
    aug.cache().count()

    val docSh = aug.select(col("doc_id"),
      graft.functions.TextKernels.shingle_hashes(col("text")).as("sh"))
    time("shingle+hash")(docSh.count())
    time("shingle+hash again")(docSh.count())

    val exploded = docSh.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode")(exploded.count())
    val freq = exploded.groupBy(col("s")).agg(count(lit(1)).as("f"))
    time("freq")(freq.count())
    val ranked = exploded.join(freq, "s")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("f"), col("s")))).as("fs"))
      .select(col("doc_id"), transform(col("fs"), e => e.getField("s")).as("sh"))
    time("ranked")(ranked.count())
    val prefixed = ranked.withColumn("n", size(col("sh")))
      .withColumn("plen", (col("n") - ceil(col("n") * 0.6) + 1).cast("int"))
      .select(col("doc_id"), col("n"), slice(col("sh"), lit(1), col("plen")).as("prefix"))
    val posting = prefixed.select(col("doc_id"), col("n"), explode(col("prefix")).as("s"))
    time("posting")(posting.count())
    val cand = posting.alias("x")
      .join(posting.alias("y"), col("x.s") === col("y.s"))
      .filter(col("x.doc_id") < col("y.doc_id") &&
        col("y.n") >= ceil(col("x.n") * 0.6) && col("y.n") <= floor(col("x.n") / 0.6))
      .select(col("x.doc_id").cast("long").as("a"), col("y.doc_id").cast("long").as("b"))
      .distinct()
    time("candidates")(println("  n_cand=" + cand.count()))
    time("full pipeline")(Dedup.ngramJaccardPairs(aug, "text", "doc_id", 0.6).count())
    spark.stop()
  }
}
