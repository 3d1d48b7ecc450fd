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
  * Per-document signatures (shingle hashes, minhash bands, simhash) are
  * computed by the codegen'd kernels in [[graft.functions.TextKernels]] —
  * scan-side, zero shuffles, inside WholeStageCodegen. All hashing is
  * xxhash64 (seed 42), bit-identical to Spark's `xxhash64` column function.
  */
object Dedup {
  import graft.functions.TextKernels.{minhash_band_hashes, shingle_hashes, simhash_64}

  /** 3-word shingles of an FTS-style token array, as a distinct array
    * (Column-HOF formulation — kept as the executable spec that the
    * [[graft.functions.TextKernels.shingleHashes]] kernel mirrors). */
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

  /** Duplication profile — the report every dedup run prints: for each
    * exact-duplicate cluster size, how many clusters have that size and
    * how many rows they cover (cluster_size=1 rows are the unique tail;
    * Σ rows = corpus size). Piggybacks on [[exactByHash]]'s 16-byte
    * shuffle; the second aggregation's input is one row per cluster and
    * its output is at most the largest cluster size — driver-safe to
    * collect at any corpus scale. */
  def duplicationProfile(df: DataFrame, contentCol: String,
                         idCol: String): DataFrame =
    exactByHash(df, contentCol, idCol)
      .groupBy(col("dup_count").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("dup_count")).as("n_rows"))

  /** MinHash+LSH near-dup pairs with exact-jaccard verification.
    * bands×rowsPerBand minhashes; candidates = docs sharing any band
    * signature; output pairs (a < b) with verified jaccard ≥ threshold.
    *
    * Returns an EAGER, CACHED frame (see materializeThenRelease) —
    * `.unpersist()` it when done if you call this repeatedly in one session.
    *
    * Signatures and band hashes come out of one codegen'd scan-side kernel
    * — the first shuffle anything sees is the (band, bandHash) self-join,
    * whose keys are 16 bytes/doc/band regardless of document size. */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 threshold: Double, bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    // recall at j ≥ 0.6 with 32×2 banding: 1-(1-0.36)^32 ≈ 1 - 6e-7
    // cache: read by the banding branch and twice by verification.
    val docSh = df.select(col(idCol), shingle_hashes(col(textCol)).as("sh")).cache()
    val banded = docSh.select(col(idCol),
      posexplode(minhash_band_hashes(col("sh"), bands, rowsPerBand))
        .as(Seq("band", "bandHash")))
    val l = banded.select(col(idCol).as("a"), col("band"), col("bandHash"))
    val r = banded.select(col(idCol).as("b"), col("band"), col("bandHash"))
    val cand = l.join(r, Seq("band", "bandHash")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // verify candidates with exact jaccard over the shingle-hash sets
    val out = verifyJaccard(cand,
      docSh.select(col(idCol).as("a"), col("sh").as("shA")),
      docSh.select(col(idCol).as("b"), col("sh").as("shB")), threshold)
    materializeThenRelease(out, docSh)
  }

  /** Exact-jaccard verification of candidate pairs (a, b) against shingle
    * frames shaped (a, shA) / (b, shB) — the ONE implementation
    * [[minhashLsh]] and [[crossNearDup]] share: the DuckDB oracles mirror
    * this arithmetic (array_intersect sizes, HALF_UP at 4 decimals), so it
    * must stay bit-identical across every caller. */
  private def verifyJaccard(cand: DataFrame, shA: DataFrame, shB: DataFrame,
                            threshold: Double): DataFrame =
    cand.join(shA, "a").join(shB, "b")
      .withColumn("inter", size(array_intersect(col("shA"), col("shB"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("shA")) + size(col("shB")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))

  /** Near-dup pairs → connected components: every document joined (directly
    * or transitively) by a pair lands in one cluster, labeled by the
    * cluster's minimum doc id (`rep`). The pipeline's final step: `rep` is
    * the document to KEEP; every other member is the dedup drop-list.
    *
    * Iterative min-label propagation: labels start as self; each round every
    * node takes the min label in its neighborhood; converges in
    * O(component diameter) rounds — near-dup graphs are overwhelmingly tiny
    * star/chain components, so 2-4 rounds in practice. Each round is one
    * shuffle (join + groupBy on node id); `localCheckpoint` truncates the
    * growing lineage so round N doesn't replay rounds 1..N-1. For
    * adversarially long chains at 100 TB scale, swap the propagation loop
    * for the alternating large-star/small-star algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — same per-round
    * shuffle shape, provably O(log n) rounds.
    *
    * @param pairs near-dup pairs (two long id columns, e.g. minhashLsh
    *              output); direction/duplication-insensitive
    * @return (doc_id, rep) — one row per distinct id in `pairs`
    */
  def clusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame =
    clusters(pairs, aCol, bCol, broadcastMaxPairs = 2000000L)

  /** QUALITY-based representative selection (round-7 growth — production
    * curation keeps each near-dup cluster's BEST member, not its
    * lowest-id one): given [[clusters]]' (doc_id, rep) table and a
    * per-doc score frame, return (rep, keep_id) with keep_id = the
    * highest-scoring member, ties to the LOWER doc_id so the choice is
    * total and engine-reproducible. One equi-join plus one max_by
    * aggregate — cluster-table-sized work, the corpus is never re-read
    * (pass `length(text)`, a model quality score, or any other
    * precomputed signal as the score). */
  def keepBest(clusters: DataFrame, scores: DataFrame,
               idCol: String = "doc_id", scoreCol: String = "score"): DataFrame =
    clusters
      // LEFT join: a member missing from the score frame must not vanish
      // (dropping it could delete a whole cluster from the keep-list) —
      // its NULL score sorts below every scored member in the struct
      // ordering, so unscored members only win when the entire cluster
      // is unscored, and then the lowest id keeps (the classic rule)
      .join(scores.select(col(idCol).as("doc_id"), col(scoreCol).as("__s")),
        Seq("doc_id"), "left")
      .groupBy(col("rep"))
      // lexicographic struct max: highest score, then highest -doc_id
      // (= lowest doc_id) — the deterministic argmax
      .agg(max_by(col("doc_id"),
        struct(col("__s"), (lit(0L) - col("doc_id")).as("__nid"))).as("keep_id"))
      .select(col("rep"), col("keep_id"))

  /** @param broadcastMaxPairs pair sets at or below this row count run
    *        union-find on the driver (pairs are the operator's OUTPUT —
    *        orders of magnitude smaller than the corpus — and 2M edges of
    *        boxed ids ≈ low hundreds of MB of driver heap, the same
    *        bounded-driver pattern as [[ngramJaccardPairs]]'s verify
    *        table); larger sets use the distributed min-label propagation
    *        loop. Same representatives, different physical plan. Null ids
    *        are dropped on both paths; both id columns must share a type. */
  def clusters(pairs: DataFrame, aCol: String, bCol: String,
               broadcastMaxPairs: Long): DataFrame = {
    val e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .na.drop("any", Seq("u", "v"))
    require(e.schema("u").dataType == e.schema("v").dataType,
      s"clusters needs matching id types, got ${e.schema("u").dataType.sql} " +
        s"and ${e.schema("v").dataType.sql}")
    // route with ONE action: collect up to ceiling+1 rows — at or below the
    // ceiling the collected rows ARE the driver path's input (no recompute
    // of an uncached pairs lineage); above it, fall through to the loop.
    val lim = math.min(broadcastMaxPairs + 1, (Int.MaxValue - 1).toLong).toInt
    val head = e.limit(lim).collect()
    if (head.length <= broadcastMaxPairs)
      return clustersDriver(e.sparkSession, head, e.schema("u").dataType)
    // symmetric edge set incl. self-loops, so isolated-after-dedup nodes and
    // single-direction input both work
    val edges = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .unionByName(e.select(col("u"), col("u").as("v")))
      .unionByName(e.select(col("v").as("u"), col("v"))).distinct()
      .localCheckpoint()
    var labels = edges.groupBy(col("u")).agg(min(col("v")).as("rep"))
      .localCheckpoint()
    // convergence witness, numeric ids: per-node labels only ever DECREASE
    // under min-propagation, so the label sum is strictly monotone until
    // fixpoint — one cheap agg over the just-checkpointed frame per round
    // instead of a join against the previous labels (saves a shuffle per
    // round). decimal(38,0) keeps the sum exact at any node-count ×
    // id-range this engine can hold (a long sum could wrap at ~1e10 nodes
    // × 1e12 ids). Non-numeric ids (e.g. string doc ids) have no monotone
    // sum — they fall back to the join-based changed-row check.
    val numericIds = labels.schema("rep").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("rep").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = if (numericIds) labelSum(labels) else null
    var converged = false
    while (!converged) {
      val next = edges
        .join(labels.withColumnRenamed("u", "v"), "v")
        .groupBy(col("u")).agg(min(col("rep")).as("rep"))
        .localCheckpoint()
      if (numericIds) {
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
      } else {
        converged = next.join(labels.withColumnRenamed("rep", "prev"), "u")
          .filter(col("rep") =!= col("prev")).isEmpty
      }
      labels = next
    }
    labels.select(col("u").as("doc_id"), col("rep"))
  }

  /** Bounded-size path: classic union-find with path compression, roots
    * kept at the component MINIMUM under the SAME ordering Spark's `min()`
    * uses — natural numeric order for numbers, unsigned UTF-8 byte order
    * for strings (Java's String.compareTo sorts UTF-16 code units, which
    * diverges for supplementary characters) — so representatives are
    * identical to the propagation loop's. */
  private def clustersDriver(spark: org.apache.spark.sql.SparkSession,
                             edges: Array[org.apache.spark.sql.Row],
                             idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x // path compression
      while (parent.getOrElse(cur, cur) != cur) {
        val nxt = parent(cur); parent(cur) = root; cur = nxt
      }
      root
    }
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        // Spark min() on strings = UTF8String binary order = unsigned
        // byte-wise UTF-8 comparison
        val xb = x.getBytes("UTF-8"); val yb = y.getBytes("UTF-8")
        var i = 0
        val n = math.min(xb.length, yb.length)
        while (i < n) {
          val c = (xb(i) & 0xff) - (yb(i) & 0xff)
          if (c != 0) return c < 0
          i += 1
        }
        xb.length < yb.length
      case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    edges.foreach { row =>
      val (u, v) = (row.get(0), row.get(1))
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) {
        if (lt(ru, rv)) parent(rv) = ru else parent(ru) = rv
      }
    }
    val rows = parent.keys.toSeq.map(n => org.apache.spark.sql.Row(n, find(n)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", idType),
      org.apache.spark.sql.types.StructField("rep", idType)))
    // slice across default parallelism: one giant slice would ship the
    // whole result in a single over-sized task
    spark.createDataFrame(spark.sparkContext.parallelize(rows,
      math.max(1, math.min(spark.sparkContext.defaultParallelism,
        rows.length / 10000 + 1))), schema)
  }

  /** Cache lifetime helper: eagerly materialize `out` (pairs — tiny next to
    * the corpus), then release the big cached intermediate so repeated
    * operator invocations in one JVM don't accumulate storage blocks. The
    * returned frame stays cached; callers running further actions read it
    * back instead of recomputing the released lineage.
    *
    * CONTRACT (also stated on the public entry points): the returned frame
    * is eager (a job has already run) and CACHED — callers that invoke the
    * operator repeatedly in a long-lived session should `.unpersist()` the
    * result when done with it, or storage blocks accumulate. Pairs frames
    * are tiny next to the corpus, so the default is acceptable for
    * interactive use; pipelines release explicitly (see
    * [[graft.llm.Pipeline.cleanCorpus]]). */
  private def materializeThenRelease(out: DataFrame, intermediates: DataFrame*): DataFrame = {
    val cached = out.cache()
    cached.count()
    intermediates.foreach(_.unpersist())
    cached
  }

  /** minhashLsh → clusters → drop-non-representatives → anti-join, as ONE
    * implementation: THE near-dup "keep one per cluster" step shared by
    * [[graft.llm.Pipeline.cleanCorpus]]/`cleanCorpusFull` and the
    * streaming within-batch pass
    * ([[graft.streaming.Streams.nearDupIngest]]), so the representative
    * semantics and the pairs-cache lifetime (released here, before
    * returning) cannot drift between call sites. Returns the kept rows of
    * `df`, original schema, LAZY — callers that re-read `df` expensively
    * should cache it around this call. */
  def keepRepresentatives(df: DataFrame, textCol: String, idCol: String,
                          threshold: Double, bands: Int = 32,
                          rowsPerBand: Int = 2): DataFrame = {
    val pairs = minhashLsh(df, textCol, idCol, threshold, bands, rowsPerBand)
    val drops = clusters(pairs)
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as(idCol))
    // clusters() materialized eagerly (driver union-find or checkpointed
    // propagation), so the pairs cache releases before returning
    pairs.unpersist()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Quality-aware variant of [[keepRepresentatives]]: per near-dup
    * cluster keep the member with the HIGHEST `scoreCol` (ties broken by
    * min id) instead of the lowest id — the selection production cleaning
    * pipelines actually want (among near-identical crawls, keep the
    * best-quality copy, e.g. [[TextAnalysis.qualityScore]] or a
    * classifier logit). Docs in no cluster are always kept.
    *
    * Same plan as keepRepresentatives plus two cluster-membership-sized
    * aggregations (max score per component, then min id among the
    * maximizers — id-type-agnostic, no negation tricks), so the extra
    * cost is proportional to the DUPLICATED subset, not the corpus. */
  def keepBestRepresentatives(df: DataFrame, textCol: String, idCol: String,
                              scoreCol: String, threshold: Double,
                              bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    val pairs = minhashLsh(df, textCol, idCol, threshold, bands, rowsPerBand)
    val comp = clusters(pairs) // (doc_id, rep), clustered docs only
    pairs.unpersist()
    // the argmax rule (max score, ties to the lower id) lives in ONE
    // place — [[keepBest]]; here it selects the per-cluster winner and
    // everything else in a cluster drops
    val winners = keepBest(comp,
      df.select(col(idCol).as("doc_id"), col(scoreCol).as("score")))
      .select(col("keep_id").as("doc_id"))
    val drops = comp.select(col("doc_id"))
      .join(winners, Seq("doc_id"), "left_anti")
      .select(col("doc_id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Approximate has-seen filter for INCREMENTAL ingest: fold the entire
    * history's content hashes into one Bloom filter (a single aggregation
    * — the 100-TB history is scanned, never joined against the batch, and
    * the filter is the only thing shipped: ~1.2 GB for 10⁹ items at 1%
    * fpp), then drop batch rows the filter might contain.
    *
    * Guarantees: NO false negatives — every row that survives is
    * definitely absent from the history (a true duplicate can never slip
    * through); ~fpp of genuinely-new rows are falsely dropped (the
    * standard ingest trade — tune fpp to batch economics, or route
    * "might contain" rows to an exact check against a keyed store
    * instead of dropping). Contents are pre-hashed with xxhash64, so the
    * filter holds fixed-width longs regardless of document size.
    *
    * The exact counterpart is [[graft.streaming.Streams.nearDupIngest]]'s
    * store-backed admission; this is the cheap front gate a pipeline puts
    * BEFORE it. */
  /** @param expectedItems Bloom capacity. fpp only holds while
    *        expectedItems ≥ |history| — an UNDERestimate saturates the
    *        filter and the false-positive rate climbs toward 1 (most of
    *        every batch silently dropped as "seen"). Pass the known
    *        cardinality, or leave at 0 to have the operator count the
    *        history itself — note that default scans the history TWICE
    *        (the count action plus the bloomFilter aggregation); at 100 TB
    *        pass the cardinality you already track (or a safe
    *        overestimate) to keep it one pass. The batch-side probe is a
    *        boxed-Long UDF (Spark has no mightContain expression), which
    *        fences whole-stage codegen at the filter — acceptable because
    *        the probe is O(batch), never O(history). */
  def seenFilter(batch: DataFrame, history: DataFrame, contentCol: String,
                 expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"need fpp in (0,1), got $fpp")
    val n = if (expectedItems > 0) expectedItems
      else math.max(1L, history.count())
    val bloom = history.select(xxhash64(col(contentCol)).as("h"))
      .stat.bloomFilter("h", n, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
    batch.filter(!mightContain(xxhash64(col(contentCol))))
  }

  /** Line-level boilerplate removal (RefinedWeb/CCNet-style): drop every
    * LINE that occurs in at least `minDocs` distinct documents (headers,
    * footers, nav chrome, license banners), then reassemble each document
    * from its surviving lines in original order. Documents whose lines are
    * all boilerplate survive with empty text (the caller decides whether
    * to drop empties — that's a quality filter, not dedup).
    *
    * RETURN SCHEMA IS (idCol, textCol) ONLY — the rebuild replaces the
    * text; other input columns are not carried through (join the ids back
    * to recover them). Same contract as [[stripDuplicateSpans]] and
    * [[Pipeline.cleanCorpusFull]].
    *
    * Scale shape: one shuffle keyed by line content to count distinct
    * containing docs (partial agg map-side), one anti-join of the lines
    * against the frequent set — which is small by construction (at most
    * totalLines/minDocs distinct values), so AQE turns it into a broadcast
    * — and one groupBy(doc) to reassemble. Nothing is ever driver-side.
    * Lines join by exact content, not a hash of it: a hash key would
    * shrink shuffle width for long lines but a collision would silently
    * drop a good line — wrong trade for a lossy-by-design operator. */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
                minDocs: Long, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val boilerplate = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs).select(col("line"))
    val kept = lines.join(boilerplate, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        e => e.getField("line")), sep).as("rebuilt"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("rebuilt"), lit("")).as(textCol))
  }

  /** Exact duplicated-span removal (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" ExactSubstr pass, at
    * token-window granularity): every window of `width` consecutive tokens
    * that occurs TWICE OR MORE anywhere in the corpus (across documents or
    * within one) is boilerplate/quotation — strip every token covered by
    * any duplicated window and reassemble each document from the
    * survivors, order preserved.
    *
    * RETURN SCHEMA IS (idCol, textCol) ONLY — the rebuild replaces the
    * text; other input columns are not carried through (join the ids back
    * to recover them). Same contract as [[lineDedup]] and
    * [[Pipeline.cleanCorpusFull]].
    *
    * Scale shape: one posexplode (windows are (doc, pos, string) rows —
    * never a per-pair product), one count shuffle keyed by the window,
    * a semi-join of windows against the duplicated set, one groupBy(doc)
    * to gather duplicated starts, and a scan-side HOF rebuild. The
    * shuffle key here is the window STRING for oracle bit-parity
    * (`hashKeys = false`); at 100 TB pass `hashKeys = true` to key the
    * count shuffle and semi-join by xxhash64(win) instead — identical
    * plan shape, 8-byte keys regardless of window length, collision odds
    * ~(windows²/2^64) (property-tested equal on random corpora) — the
    * reference-count threshold, window width, and rebuild are unchanged. */
  def stripDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                          width: Int, hashKeys: Boolean = false): DataFrame = {
    require(width >= 2, s"span width must be >= 2 tokens, got $width")
    val toks = split(col(textCol), " ")
    val nw = size(toks) - width + 1
    // sequence(1, nw) DESCENDS for nw < 1 — short docs get an empty window
    // list explicitly
    val winsExpr = when(nw < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), nw),
        i => concat_ws(" ", slice(toks, i, lit(width)))))
    val key = if (hashKeys) xxhash64(col("win")) else col("win")
    val wins = df.select(col(idCol), posexplode(winsExpr).as(Seq("wpos", "win")))
      .select(col(idCol), col("wpos"), key.as("wkey"))
    val dupWins = wins.groupBy(col("wkey")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("wkey"))
    val dupStarts = wins.join(dupWins, Seq("wkey"), "left_semi")
      .groupBy(col(idCol)).agg(collect_list(col("wpos")).as("dup_starts"))
    // a token at 0-based position p survives iff NO duplicated window
    // [s, s+width) covers it — dup_starts is a per-doc set, order unused
    df.join(dupStarts, Seq(idCol), "left")
      .select(col(idCol), array_join(filter(toks, (t, p) =>
        !exists(coalesce(col("dup_starts"), array().cast("array<int>")),
          s => s <= p && p < s + width)), " ").as(textCol))
  }

  /** CROSS-corpus near-dup pairs (train/benchmark contamination check):
    * MinHash-LSH candidates between two DIFFERENT corpora — the banded
    * equi-join runs corpusA-bands ⋈ corpusB-bands instead of a self-join,
    * then candidates verify with exact jaccard. The decontamination
    * primitive every training pipeline needs before shipping a model:
    * find corpus documents that near-duplicate an eval benchmark. Same
    * scale shape as [[minhashLsh]]: scan-side codegen signatures, 16-byte
    * join keys, verification O(candidates), never |A|×|B|.
    *
    * Returns an EAGER, CACHED frame (a, b, jaccard) — `a` from corpusA,
    * `b` from corpusB, every verified pair at or above the threshold
    * (no a < b constraint: the corpora are distinct id spaces). */
  def crossNearDup(corpusA: DataFrame, corpusB: DataFrame,
                   textCol: String, idCol: String, threshold: Double,
                   bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    def sigs(df: DataFrame, as: String): (DataFrame, DataFrame) = {
      val sh = df.select(col(idCol).as(as), shingle_hashes(col(textCol)).as(s"sh_$as")).cache()
      val banded = sh.select(col(as),
        posexplode(minhash_band_hashes(col(s"sh_$as"), bands, rowsPerBand))
          .as(Seq("band", "bandHash")))
      (sh, banded)
    }
    val (shA, bandedA) = sigs(corpusA, "a")
    val (shB, bandedB) = sigs(corpusB, "b")
    val cand = bandedA.join(bandedB, Seq("band", "bandHash"))
      .select("a", "b").distinct()
    val out = verifyJaccard(cand,
      shA.select(col("a"), col("sh_a").as("shA")),
      shB.select(col("b"), col("sh_b").as("shB")), threshold)
    materializeThenRelease(out, shA, shB)
  }

  // (round-16) the string-gram HOF formulation
  // (array_distinct(transform(sequence…, concat_ws(' ', slice(toks,i,n)))))
  // was replaced by the codegen'd TextKernels.ngramHashes kernel below:
  // HOF lambdas are interpreted and the concat_ws built one gram string
  // per window, so the corpus pass allocated O(len·n) characters per doc.
  // The kernel hashes each token once and chain-hashes windows — same
  // distinct-gram identities (token sequences can't straddle the space
  // separator), same accepted 2⁻⁶⁴-collision equivalence as the
  // shingle-hash jaccard family.

  /** Exact n-gram collision decontamination — the eval-overlap check of
    * GPT-3 appendix C / Llama 2 (13-gram collisions against the benchmark
    * text): a corpus document is contaminated when ANY of its word
    * n-grams also occurs anywhere in the evaluation set. Complements
    * [[crossNearDup]] (whole-document near-dup): a verbatim eval QUOTE
    * embedded in an otherwise-unrelated long document sits far below any
    * jaccard threshold, but shares an n-gram exactly.
    *
    * Returns (idCol, hits): contaminated corpus ids with the number of
    * their distinct n-grams that collide.
    *
    * 100 TB story: the eval side is benchmark-sized (thousands of docs →
    * at most a few million distinct n-grams), deduplicated and BROADCAST;
    * the corpus side computes its distinct n-gram HASHES scan-side in one
    * whole-stage-codegen kernel pass ([[graft.functions.TextKernels
    * .ngramHashes]] — 8-byte gram identities, no gram strings built or
    * compared; round 16) and probes the broadcast relation inside the
    * scan stage — corpus text is never shuffled; the only exchange
    * carries per-doc (id, partial count) rows for the already-filtered
    * hits. Both sides hash through the same kernel, so collision identity
    * matches the string formulation up to the 2⁻⁶⁴ xxhash64 collision
    * equivalence the shingle-hash jaccard family already accepts. */
  def ngramCollisions(corpus: DataFrame, evalSet: DataFrame,
                      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    import graft.functions.TextKernels.ngram_hashes
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol),
        explode(ngram_hashes(col(textCol), n)).as("gram"))
    val evalGrams = broadcast(grams(evalSet).select("gram").distinct())
    grams(corpus).join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
  }

  /** 64-bit SimHash per doc: per-token xxhash64, per-bit strict majority
    * vote — one codegen'd kernel ([[graft.functions.SimHash64]]) evaluated
    * scan-side. No explode, no groupBy: the round-1 formulation bought a
    * full shuffle (and an 8-bit counter cap) for a per-row computation. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), simhash_64(col(textCol)).as("simhash"))

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
    * and the heavy join only sees prefixes.
    *
    * Returns an EAGER, CACHED frame (see materializeThenRelease) —
    * `.unpersist()` it when done if you call this repeatedly in one
    * session. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double): DataFrame =
    ngramJaccardPairs(df, textCol, idCol, threshold,
      broadcastVerifyMaxDocs = 2000000L, rarityOrderMinDocs = 1L << 22)

  /** @param broadcastVerifyMaxDocs corpora at or below this row count verify
    *        candidates against a broadcast id→shingle-hash map (two-pointer
    *        merges, no shuffle); larger corpora switch to the distributed
    *        verify — join the shingle arrays onto the candidate pairs and
    *        intersect per row. Same rounding, same output, different
    *        physical plan. ~2M docs × ~100 shingles × 8B ≈ 1.6 GB broadcast,
    *        the practical executor-memory ceiling.
    * @param rarityOrderMinDocs corpora BELOW this row count skip the global
    *        rarity ordering and take prefixes in the kernel's native
    *        ascending-hash order — also a consistent global total order, so
    *        PPJoin's prefix-filter guarantee holds unchanged (any pair with
    *        jaccard ≥ t shares a prefix element under ANY agreed total
    *        order). Rarity ordering pays two extra shuffles (shingle-freq
    *        groupBy + per-doc rank groupBy) to make prefix POSTING LISTS as
    *        short as the corpus allows — the right trade once posting lists
    *        are long (big corpora), pure overhead when the corpus is small
    *        enough that candidate verification is cheap anyway. Same exact
    *        output either way; only candidate-generation cost differs. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double, broadcastVerifyMaxDocs: Long,
                        rarityOrderMinDocs: Long = 1L << 22): DataFrame = {
    // shingles hashed to 64-bit once: every downstream compare/intersect
    // runs on longs, not strings (set semantics preserved whp — ~100
    // shingles/doc against a 2^64 space).
    // cache: read by three branches (freq, rank join, verify) — compute once.
    val docSh = df.select(col(idCol), shingle_hashes(col(textCol)).as("sh")).cache()
    val nDocs = docSh.count() // one action: routes rarity AND verify paths
    // global rarity order (ties by hash): prefixes then hold each doc's
    // RAREST shingles, keeping prefix posting lists as short as the corpus
    // allows. Below the threshold the kernel's ascending-hash order is used
    // as-is (see @param rarityOrderMinDocs).
    val ranked = if (nDocs >= rarityOrderMinDocs) {
      val exploded = docSh.select(col(idCol), explode(col("sh")).as("s"))
      val freq = exploded.groupBy(col("s")).agg(count(lit(1)).as("f"))
      exploded.join(freq, "s")
        .groupBy(col(idCol))
        .agg(sort_array(collect_list(struct(col("f"), col("s")))).as("fs"))
        .select(col(idCol), transform(col("fs"), e => e.getField("s")).as("sh"))
    } else docSh
    val prefixed = ranked.withColumn("n", size(col("sh")))
      .withColumn("plen",
        (col("n") - ceil(col("n") * threshold) + 1).cast("int"))
      .select(col(idCol), col("n"),
        slice(col("sh"), lit(1), col("plen")).as("prefix"))
    val posting = prefixed.select(col(idCol), col("n"), explode(col("prefix")).as("s"))
    // size-ratio pruning: jaccard ≥ t forces t·|A| ≤ |B| ≤ |A|/t — applied
    // during candidate generation, before the distinct. (PPJoin's
    // positional filter was measured here and pruned ~nothing: the rarity
    // ordering puts each candidate's shared rare token at EARLY prefix
    // positions, exactly where the positional bound passes — so it only
    // added per-row filter cost.)
    val cand = posting.alias("x")
      .join(posting.alias("y"), col("x.s") === col("y.s"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol") &&
        col("y.n") >= ceil(col("x.n") * threshold) &&
        col("y.n") <= floor(col("x.n") / threshold))
      .select(col(s"x.$idCol").cast("long").as("a"), col(s"y.$idCol").cast("long").as("b"))
      .distinct()
    // verify: small corpora broadcast the id → sorted-shingle-hash table
    // (longs; megabytes per million docs) and two-pointer-merge per
    // candidate — no array shuffles, no per-pair hash-set allocation.
    // Beyond the broadcast ceiling, join the shingle arrays onto the
    // candidate pairs (two hash joins keyed by doc id — candidates are a
    // small fraction of the corpus after prefix + size-ratio pruning) and
    // intersect per row. Both paths round HALF_UP at 4 decimals.
    val spark = df.sparkSession
    import spark.implicits._
    val out = if (nDocs <= broadcastVerifyMaxDocs) {
      // kernel output is already sorted — two-pointer merge needs no re-sort
      val shMap = docSh.select(col(idCol).cast("long"), col("sh"))
        .as[(Long, Array[Long])].collect().toMap
      val bc = spark.sparkContext.broadcast(shMap)
      cand.as[(Long, Long)].mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (a, b) =>
          val (sa, sb) = (m(a), m(b))
          var i = 0; var j = 0; var inter = 0
          while (i < sa.length && j < sb.length) {
            if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
            else if (sa(i) < sb(j)) i += 1
            else j += 1
          }
          // literally Spark round(_, 4)'s computation (NaN/Inf pass-through,
          // BigDecimal.valueOf → HALF_UP), so this branch and the
          // distributed branch agree at every representation boundary —
          // same output, different plan. Two empty-shingle docs give 0/0 =
          // NaN, which must fail the threshold, not throw.
          val raw = inter.toDouble / (sa.length + sb.length - inter)
          val jac = if (raw.isNaN || raw.isInfinite) raw
            else java.math.BigDecimal.valueOf(raw)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          if (jac >= threshold) Some((a, b, jac)) else None
        }
      }.toDF("a", "b", "jaccard")
    } else {
      cand
        .join(docSh.select(col(idCol).cast("long").as("a"), col("sh").as("shA")), "a")
        .join(docSh.select(col(idCol).cast("long").as("b"), col("sh").as("shB")), "b")
        .withColumn("inter", size(array_intersect(col("shA"), col("shB"))).cast("double"))
        .withColumn("jaccard", round(col("inter") /
          (size(col("shA")) + size(col("shB")) - col("inter")), 4))
        .filter(col("jaccard") >= threshold)
        .select(col("a"), col("b"), col("jaccard"))
    }
    materializeThenRelease(out, docSh)
  }
}
