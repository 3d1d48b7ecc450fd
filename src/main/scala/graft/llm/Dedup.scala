package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2.12).
  *
  * Four families, each with the partition story that survives 100 TB:
  *  - exact:   hash-groupBy on the content (or its md5) — one shuffle keyed
  *             by content hash; no skew beyond true duplicate groups.
  *  - minhash: shingle → k minhashes → banded LSH — candidate generation is
  *             a self-join on (band, bandHash), i.e. a shuffle keyed by tiny
  *             band signatures; exact-jaccard verification touches only
  *             candidate pairs, never the n² cross product.
  *  - simhash: 64-bit signature; pigeonhole banding (hamming ≤ k ⇒ one of
  *             k+1 chunks equal) makes candidate generation another
  *             small-key self-join; verification is one xor+popcount.
  *  - ngram:   exact jaccard over shingle sets for pairs sharing a shingle
  *             (posting-list join) — exact but pruned by co-occurrence.
  *
  * All hashing is Spark's xxhash64 — deterministic, codegen'd, seedable.
  */
object Dedup {

  /** 3-word shingles of an FTS-style token array, as a distinct array. */
  def shingles(tokens: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(tokens) - n, lit(0))),
      i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))

  /** Exact dedup: keep the minimum id per identical content value. */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup on md5(content) — the shuffle key is 16 bytes instead of
    * the document; this is the variant that scales to long documents. */
  def exactByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature matrix: k minhashes per doc, via one explode +
    * k partial-min aggregations (single shuffle, map-side combine). */
  private def minhashSigs(docShingles: DataFrame, idCol: String, k: Int): DataFrame = {
    val p = 2147483647L // 2^31-1, Mersenne prime
    // deterministic per-i affine hash params (splitmix-style mixing)
    def a(i: Int): Long = math.abs((i * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L) % (p - 1)) + 1
    def b(i: Int): Long = math.abs((i * 0xD6E8FEB86659FD93L + 0x2545F4914F6CDD1DL) % p)
    val exploded = docShingles
      .select(col(idCol), explode(col("sh")).as("s"))
      .withColumn("h", pmod(xxhash64(col("s")), lit(p)))
    exploded.groupBy(col(idCol))
      .agg(min(pmod(col("h") * a(0) + b(0), lit(p))).as("m0"),
        (1 until k).map(i => min(pmod(col("h") * a(i) + b(i), lit(p))).as(s"m$i")): _*)
  }

  /** MinHash+LSH near-dup pairs with exact-jaccard verification.
    * bands×rowsPerBand minhashes; candidates = docs sharing any band
    * signature; output pairs (a < b) with verified jaccard ≥ threshold. */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 threshold: Double, bands: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val docSh = df.select(col(idCol),
      shingles(graft.fts.Fts.tokens(col(textCol))).as("sh"))
    val sigs = minhashSigs(docSh, idCol, k)
    // band signature = xxhash64 over the band's minhash columns
    val banded = sigs.select(col(idCol), posexplode(array(
      (0 until bands).map(bi => xxhash64(
        (bi * rowsPerBand until (bi + 1) * rowsPerBand).map(i => col(s"m$i")): _*)): _*
    )).as(Seq("band", "bandHash")))
    val l = banded.select(col(idCol).as("a"), col("band"), col("bandHash"))
    val r = banded.select(col(idCol).as("b"), col("band"), col("bandHash"))
    val cand = l.join(r, Seq("band", "bandHash")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // verify candidates with exact jaccard over the shingle sets
    val withSets = cand
      .join(docSh.select(col(idCol).as("a"), col("sh").as("shA")), "a")
      .join(docSh.select(col(idCol).as("b"), col("sh").as("shB")), "b")
    withSets
      .withColumn("inter", size(array_intersect(col("shA"), col("shB"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("shA")) + size(col("shB")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 64-bit SimHash per doc: explode token hashes, per-bit signed vote. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(graft.fts.Fts.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitVotes = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"v$i")
    }
    toks.groupBy(col(idCol)).agg(bitVotes.head, bitVotes.tail: _*)
      .select(col(idCol), (0 until 64).map { i =>
        when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs: hamming(simhash) ≤ maxDist. Pigeonhole banding
    * into maxDist+1 chunks bounds candidate generation to equal-chunk
    * self-joins. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val sigs = simhash(df, textCol, idCol)
    val banded = sigs.select(col(idCol), col("simhash"), posexplode(array(
      (0 until chunks).map(ci => shiftright(col("simhash"), ci * width)
        .bitwiseAND(lit((1L << width) - 1))): _*
    )).as(Seq("chunk", "chunkVal")))
    val l = banded.select(col(idCol).as("a"), col("simhash").as("sa"), col("chunk"), col("chunkVal"))
    val r = banded.select(col(idCol).as("b"), col("simhash").as("sb"), col("chunk"), col("chunkVal"))
    l.join(r, Seq("chunk", "chunkVal")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Exact n-gram jaccard for pairs sharing ≥1 shingle (posting-list join —
    * never materializes the n² cross product). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double): DataFrame = {
    val docSh = df.select(col(idCol),
      shingles(graft.fts.Fts.tokens(col(textCol))).as("sh"))
    val posting = docSh.select(col(idCol), explode(col("sh")).as("s"))
    val pairInter = posting.alias("x")
      .join(posting.alias("y"), col("x.s") === col("y.s"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .agg(count(lit(1)).cast("double").as("inter"))
    pairInter
      .join(docSh.select(col(idCol).as("a"), size(col("sh")).as("na")), "a")
      .join(docSh.select(col(idCol).as("b"), size(col("sh")).as("nb")), "b")
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }
}
