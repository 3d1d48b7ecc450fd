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
                 threshold: Double, bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    // recall at j ≥ 0.6 with 32×2 banding: 1-(1-0.36)^32 ≈ 1 - 6e-7
    val k = bands * rowsPerBand
    // cache: the shingle HOF chain is interpreted (not codegen'd) and this
    // frame is read by both the signature and the verification branch —
    // without the cache Spark recomputes it per branch.
    val docSh = df.select(col(idCol),
      shingles(graft.fts.Fts.tokens(col(textCol))).as("sh")).cache()
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
    val out = withSets
      .withColumn("inter", size(array_intersect(col("shA"), col("shB"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("shA")) + size(col("shB")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
    materializeThenRelease(out, docSh)
  }

  /** Cache lifetime helper: eagerly materialize `out` (pairs — tiny next to
    * the corpus), then release the big cached intermediate so repeated
    * operator invocations in one JVM don't accumulate storage blocks. The
    * returned frame stays cached; callers running further actions read it
    * back instead of recomputing the released lineage. */
  private def materializeThenRelease(out: DataFrame, intermediate: DataFrame): DataFrame = {
    val cached = out.cache()
    cached.count()
    intermediate.unpersist()
    cached
  }

  /** 64-bit SimHash per doc: explode token hashes, per-bit majority vote.
    *
    * The per-bit set-counts are aggregated PACKED — 8 longs each holding
    * eight 8-bit counters (`packed_j = Σ_b ((h>>(8j+b))&1) << 8b`) — so the
    * aggregation evaluates 8 sum expressions instead of 64. Sound while
    * every per-doc token count stays < 256 per counter (documents here are
    * ~50-100 tokens; for longer docs widen to 16-bit counters / 16 longs).
    * bit_i is set when setCount_i > n/2 (strict majority — identical to the
    * signed-vote formulation `sum(±1) > 0`). */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(graft.fts.Fts.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val packedSums = (0 until 8).map { j =>
      sum((0 until 8).map { b =>
        shiftleft(shiftright(col("h"), 8 * j + b).bitwiseAND(lit(1L)), 8 * b)
      }.reduce(_ + _)).as(s"p$j")
    }
    toks.groupBy(col(idCol))
      .agg(packedSums.head, (packedSums.tail :+ count(lit(1)).as("n")): _*)
      .select(col(idCol), (0 until 64).map { i =>
        val (j, b) = (i / 8, i % 8)
        val setCount = shiftright(col(s"p$j"), 8 * b).bitwiseAND(lit(0xffL))
        when(setCount * 2 > col("n"), lit(1L << i)).otherwise(lit(0L))
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

  /** Exact n-gram jaccard via PREFIX FILTERING (PPJoin-style, Xiao et al.):
    * with shingles in a consistent total order (lexicographic via
    * array_sort), any pair with jaccard ≥ t must share an element inside
    * each side's first `n - ⌈t·n⌉ + 1` shingles — so only prefixes are
    * posted and joined, shrinking the posting list ~(1-t)× and the
    * candidate pairs ~(1-t)²×. Candidates are then verified with the exact
    * array_intersect jaccard. Exact answer, never the n² cross product,
    * and the heavy join only sees prefixes. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double): DataFrame = {
    // shingles hashed to 64-bit once: every downstream compare/intersect
    // runs on longs, not strings (set semantics preserved whp — ~100
    // shingles/doc against a 2^64 space).
    // cache: shingle hashing is an interpreted HOF chain read by three
    // branches (freq, rank join, verify) — compute once.
    val docSh = df.select(col(idCol),
      array_distinct(transform(
        shingles(graft.fts.Fts.tokens(col(textCol))), s => xxhash64(s))).as("sh"))
      .cache()
    // global rarity order (ties by hash): prefixes then hold each doc's
    // RAREST shingles, keeping prefix posting lists as short as the corpus
    // allows.
    val exploded = docSh.select(col(idCol), explode(col("sh")).as("s"))
    val freq = exploded.groupBy(col("s")).agg(count(lit(1)).as("f"))
    val ranked = exploded.join(freq, "s")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("f"), col("s")))).as("fs"))
      .select(col(idCol), transform(col("fs"), e => e.getField("s")).as("sh"))
    val prefixed = ranked.withColumn("n", size(col("sh")))
      .withColumn("plen",
        (col("n") - ceil(col("n") * threshold) + 1).cast("int"))
      .select(col(idCol), col("n"),
        slice(col("sh"), lit(1), col("plen")).as("prefix"))
    val posting = prefixed.select(col(idCol), col("n"), explode(col("prefix")).as("s"))
    // size-ratio pruning: jaccard ≥ t forces t·|A| ≤ |B| ≤ |A|/t — applied
    // during candidate generation, before the distinct.
    val cand = posting.alias("x")
      .join(posting.alias("y"), col("x.s") === col("y.s"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol") &&
        col("y.n") >= ceil(col("x.n") * threshold) &&
        col("y.n") <= floor(col("x.n") / threshold))
      .select(col(s"x.$idCol").cast("long").as("a"), col(s"y.$idCol").cast("long").as("b"))
      .distinct()
    // verify: broadcast the id → sorted-shingle-hash table (longs; megabytes
    // per million docs) and two-pointer-merge per candidate — no array
    // shuffles, no per-pair hash-set allocation. For corpora too large to
    // broadcast, join the arrays in and use array_intersect instead.
    val spark = df.sparkSession
    import spark.implicits._
    val shMap = docSh.select(col(idCol).cast("long"), array_sort(col("sh")))
      .as[(Long, Array[Long])].collect().toMap
    val bc = spark.sparkContext.broadcast(shMap)
    val out = cand.as[(Long, Long)].mapPartitions { it =>
      val m = bc.value
      it.flatMap { case (a, b) =>
        val (sa, sb) = (m(a), m(b))
        var i = 0; var j = 0; var inter = 0
        while (i < sa.length && j < sb.length) {
          if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
          else if (sa(i) < sb(j)) i += 1
          else j += 1
        }
        val jac = math.floor(inter.toDouble / (sa.length + sb.length - inter) * 1e4 + 0.5) / 1e4
        if (jac >= threshold) Some((a, b, jac)) else None
      }
    }.toDF("a", "b", "jaccard")
    materializeThenRelease(out, docSh)
  }
}
