package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Dedup, Multimodal, Sampling, Similarity, Snapshot, TextAnalysis}

/** Properties the oracles can't express: SimHash recall on planted
  * near-dups, LSH-ANN recall vs brute force, multimodal decode features. */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.t(spark, sf, "documents")
  private lazy val emb = Tables.t(spark, sf, "embeddings")

  private lazy val augmented = {
    val base = docs.select(col("doc_id"), col("text"))
    base.unionByName(base.select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))
  }

  test("simhash finds most planted near-dup pairs at hamming<=3") {
    val pairs = Dedup.simhashPairs(augmented, "text", "doc_id", maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val planted = (0L until 500L).map(i => (i, i + 10000)).toSet
    val recall = planted.count(pairs.contains).toDouble / planted.size
    // one-token-removal flips a handful of signature bits; hamming<=3
    // catches most but not all planted pairs (measured ~0.74)
    assert(recall > 0.6, s"simhash recall $recall")
  }

  test("crossNearDup finds every planted contamination; decontaminate drops them") {
    val corpus = docs.select(col("doc_id"), col("text"))
    val bench = augmented.filter(col("doc_id") >= 10000 && col("doc_id") < 10050)
    val pairs = Dedup.crossNearDup(corpus, bench, "text", "doc_id", 0.6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // every benchmark doc (i+10000) must hit its source doc i
    val planted = (0L until 50L).map(i => (i, i + 10000)).toSet
    assert(planted.subsetOf(pairs), s"missed: ${planted -- pairs}")
    val clean = graft.llm.Pipeline.decontaminate(
      corpus, bench, "text", "doc_id", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert((0L until 50L).forall(!clean.contains(_)), "contaminated doc survived")
    assert(clean.size >= 440, s"over-dropped: ${clean.size}") // 450 minus natural dups, if any
  }

  test("ngramCollisions: planted copies hit sources, eval side broadcast") {
    val corpus = docs.select(col("doc_id"), col("text"))
    val bench = augmented.filter(col("doc_id") >= 10000 && col("doc_id") < 10050)
    val hits = Dedup.ngramCollisions(corpus, bench, "text", "doc_id", n = 8)
    val hitIds = hits.select("doc_id").as[Long].collect().toSet
    // each first-token-dropped copy shares all-but-one 8-gram with source
    assert((0L until 50L).forall(hitIds.contains), "missed a planted source")
    // the eval gram set is benchmark-bounded and must be BROADCAST: the
    // corpus text probes it scan-side, never shuffling the corpus
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$plan")
    val clean = graft.llm.Pipeline.decontaminateNgram(
      corpus, bench, "text", "doc_id", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert((0L until 50L).forall(!clean.contains(_)), "contaminated doc survived")
    assert(clean.size == 500 - hitIds.size, "drop set != hit set")
    // report+decontaminate with the SHARED probe: identical to running
    // each separately, with the 8-gram scan paid once (the pinned id set
    // feeds both halves)
    val (report, cleaned) = graft.llm.Pipeline.reportAndDecontaminate(
      corpus, bench, "text", "doc_id", n = 8)
    val (nDocs, nCont, permille) =
      report.as[(Long, Long, Long)].collect().head
    assert(nDocs == 500L && nCont == hitIds.size.toLong)
    assert(permille == 1000L * nCont / nDocs)
    assert(cleaned.select("doc_id").as[Long].collect().toSet == clean,
      "shared-probe decontaminate drifted from the direct pass")
    val sepReport = graft.llm.Pipeline.contaminationReport(
      corpus, bench, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().head
    assert(sepReport == ((nDocs, nCont, permille)))
  }

  test("hashSample is deterministic, nested across rates, near target rate") {
    import graft.llm.Sampling
    val s100 = Sampling.hashSample(docs, "doc_id", 100)
      .select("doc_id").as[Long].collect().toSet
    val again = Sampling.hashSample(docs, "doc_id", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s100 == again, "hash sample not reproducible")
    val s500 = Sampling.hashSample(docs, "doc_id", 500)
      .select("doc_id").as[Long].collect().toSet
    assert(s100.subsetOf(s500), "samples not nested across rates")
    // 500 docs at 10%: expect ~50, binomial 4σ ≈ ±27
    assert(s100.size > 20 && s100.size < 80, s"rate off: ${s100.size}/500")
    // arith mixer obeys the same laws
    val a100 = Sampling.arithSample(docs, "doc_id", 100)
      .select("doc_id").as[Long].collect().toSet
    val a500 = Sampling.arithSample(docs, "doc_id", 500)
      .select("doc_id").as[Long].collect().toSet
    assert(a100.subsetOf(a500))
    assert(a100.size > 20 && a100.size < 80, s"arith rate off: ${a100.size}/500")
  }

  test("splitAssign partitions the table; train = arithSample's keep set") {
    import graft.llm.Sampling
    val split = Sampling.splitAssign(docs, "doc_id", 800, 100)
      .select(col("doc_id").cast("long"), col("split"))
      .as[(Long, String)].collect()
    // exhaustive + disjoint: every row labeled exactly once
    assert(split.length == docs.count())
    assert(split.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the train set IS the 800‰ arith sample (shared bucket function)
    val train = split.filter(_._2 == "train").map(_._1).toSet
    val a800 = Sampling.arithSample(docs, "doc_id", 800)
      .select(col("doc_id").cast("long")).as[Long].collect().toSet
    assert(train == a800)
    // nested-subset across configs: shrinking train only moves rows out
    val train500 = Sampling.splitAssign(docs, "doc_id", 500, 100)
      .filter(col("split") === "train")
      .select(col("doc_id").cast("long")).as[Long].collect().toSet
    assert(train500.subsetOf(train))
    // degenerate configs still partition
    intercept[IllegalArgumentException](
      Sampling.splitAssign(docs, "doc_id", 900, 200))
  }

  test("packChunks equals the global-window formulation") {
    import graft.llm.{Packing, TextAnalysis}
    import org.apache.spark.sql.expressions.Window
    val got = Packing.packChunks(docs, "text", "doc_id", budget = 512)
    val win = docs.select(col("doc_id").cast("long").as("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("before", coalesce(sum(col("n_tokens")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        (col("before") / lit(512L)).cast("long").as("chunk_id"))
    // both directions of exceptAll — its physical Union fuses packChunks'
    // final pass into a multi-subtree stage, the exact composition that a
    // stage-id-based partition lookup gets wrong (see Packing scaladoc)
    val extra = got.exceptAll(win).collect().toSeq
    val missing = win.exceptAll(got).collect().toSeq
    assert(extra.isEmpty && missing.isEmpty,
      s"extra=${extra.take(5)} missing=${missing.take(5)}")
    // chunks are contiguous in id order and chunk ids start at 0
    val ids = got.select("chunk_id").distinct().as[Long].collect().sorted
    assert(ids.head == 0L && ids.toSeq == (ids.head to ids.last))
  }

  test("ngram jaccard: rarity-ordered and hash-ordered prefixes agree exactly") {
    // the bench/verify corpora sit below rarityOrderMinDocs, so the rarity
    // path (the 100-TB plan) is exercised here: forcing it must yield the
    // identical pair set — PPJoin's guarantee holds under any total order.
    val fast = Dedup.ngramJaccardPairs(augmented, "text", "doc_id", 0.6)
    val rarity = Dedup.ngramJaccardPairs(augmented, "text", "doc_id", 0.6,
      broadcastVerifyMaxDocs = 2000000L, rarityOrderMinDocs = 0L)
    assert(fast.exceptAll(rarity).isEmpty && rarity.exceptAll(fast).isEmpty)
    fast.unpersist(); rarity.unpersist()
  }

  test("simhash pigeonhole banding is EXACT vs brute-force hamming join") {
    val banded = Dedup.simhashPairs(augmented, "text", "doc_id", maxDist = 3)
    val sigs = Dedup.simhash(augmented, "text", "doc_id")
    val l = sigs.select(col("doc_id").as("a"), col("simhash").as("sa"))
    val r = sigs.select(col("doc_id").as("b"), col("simhash").as("sb"))
    val brute = l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .filter(col("hamming") <= 3)
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
  }

  test("minhash-LSH finds every planted pair at j>=0.6") {
    val pairs = Dedup.minhashLsh(augmented, "text", "doc_id", 0.6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val planted = (0L until 500L).map(i => (i, i + 10000)).toSet
    // docs long enough that dropping one token keeps jaccard >= 0.6
    assert(planted.subsetOf(pairs), s"missing ${planted.diff(pairs).take(5)}")
  }

  test("clusters: chains and stars collapse to min-id components (both paths)") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), // chain 1-2-3-4, mixed order
      (10L, 11L), (10L, 12L), (10L, 13L),         // star around 10
      (20L, 21L))                                 // plain pair
      .toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L)
    // default: bounded driver union-find
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == expected)
    // forced distributed min-label propagation — identical representatives
    val dist = Dedup.clusters(pairs, "a", "b", broadcastMaxPairs = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == expected)
  }

  test("clusters handles non-numeric ids on both paths") {
    // string ids have no monotone label sum; a 3-hop chain forces multiple
    // propagation rounds, which the join-based fallback check must survive
    val pairs = Seq(("d-b", "d-a"), ("d-b", "d-c"), ("d-c", "d-d"))
      .toDF("a", "b")
    val expected = Map("d-a" -> "d-a", "d-b" -> "d-a",
      "d-c" -> "d-a", "d-d" -> "d-a")
    val driver = Dedup.clusters(pairs).as[(String, String)].collect().toMap
    assert(driver == expected)
    // forced distributed path: exercises the string-id join-based witness
    val dist = Dedup.clusters(pairs, "a", "b", broadcastMaxPairs = 0L)
      .as[(String, String)].collect().toMap
    assert(dist == expected)
  }

  test("LSH-ANN recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, 5, dims = 64, planes = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // theory: random 64-d neighbors sit at ~60-70 deg; P[same half-space]
    // ~= 0.63 per plane => ~0.4 expected at 2 planes (vs ~0.25 corpus probed)
    assert(recall > 0.2, s"lsh recall $recall")
  }

  test("multi-probe LSH beats single-bucket recall and subsumes its hits") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val single = Similarity.lshTopK(emb, queries, 5, dims = 64, planes = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshMultiProbeTopK(emb, queries, 5, dims = 64, planes = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val rSingle = exact.count(single.contains).toDouble / exact.size
    val rMulti = exact.count(multi.contains).toDouble / exact.size
    // the multi-probe CANDIDATE set is a superset of the single-bucket
    // set; after ranking, rounded-cosine ties broken by nid can in
    // principle displace a hit, so the recall comparison carries a small
    // tolerance rather than claiming strict dominance
    assert(rMulti >= rSingle - 0.05, s"multi $rMulti < single $rSingle")
    assert(rMulti > 0.3, s"multi-probe recall $rMulti")
  }

  test("int8 quantization: reconstruction error bounded, top-k recall high") {
    val q = Similarity.quantizeInt8(emb)
    // every element within half a quantization step of the original
    val bad = q.join(emb, "vec_id")
      .select(explode(arrays_zip(col("embedding"), col("qvec"))).as("z"), col("scale"))
      .filter(abs(col("z.embedding").cast("double") -
        col("z.qvec") * col("scale")) > col("scale") * 0.5 + 1e-12)
      .count()
    assert(bad == 0, s"$bad elements outside half-step error bound")
    // quantized ranking stays close to exact ranking
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(quant.contains).toDouble / exact.size
    assert(recall > 0.8, s"quantized top-k recall $recall")
  }

  test("PQ-ANN: trained recall clears the bar, more code bits help, rerank recovers") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recallOf(m: Int, ksub: Int): Double = {
      val pq = Similarity.pqTopK(emb, queries, 5, m = m, ksub = ksub, iters = 2)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
      exact.count(pq.contains).toDouble / exact.size
    }
    // the synthetic embeddings are near-isotropic — PQ's worst case (no
    // cluster structure to exploit); measured ~0.14 at 16-bit codes,
    // ~0.4 at 64-bit. The bars sit under the measured values with margin.
    val coarse = recallOf(4, 16)  // 4×4 = 16-bit codes
    val fine = recallOf(16, 16)   // 16×4 = 64-bit codes
    assert(fine > 0.25, s"pq recall $fine at 64-bit codes")
    assert(fine >= coarse - 0.05, s"more code bits hurt: $fine < $coarse")
    // the production posture: PQ shortlists from the coded scan, exact
    // cosine reranks the shortlist — tiny shortlists recover most recall
    val short = Similarity.pqTopK(emb, queries, 50, m = 8, ksub = 32, iters = 2)
      .select(col("qid"), col("nid"))
    val rer = short.join(emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")), "nid")
      .join(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))), "qid")
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qvec"), col("nvec")), 5))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val rRerank = exact.count(rer.contains).toDouble / exact.size
    assert(rRerank > 0.6, s"pq+rerank recall $rRerank")
  }

  test("IVF-PQ: full probe ≡ flat PQ bit-for-bit; pruned probe recall holds up") {
    val queries = emb.filter(col("vec_id") < 20)
    // nprobe = nlist makes the candidate set everything-but-self, so the
    // composed operator must reproduce flat pqTopK EXACTLY — coarse
    // routing cancels out, ADC scoring is shared
    val full = Similarity.ivfPqTopK(emb, queries, 5, nlist = 16, nprobe = 16,
      m = 8, ksub = 16, iters = 2).collect().map(_.toString).sorted
    val flat = Similarity.pqTopK(emb, queries, 5, m = 8, ksub = 16, iters = 2)
      .collect().map(_.toString).sorted
    assert(full.sameElements(flat), "full-probe ivfPqTopK != flat pqTopK")
    // pruned probing loses some of PQ's hits but keeps most — the double
    // approximation still finds real neighbors (vs exact top-5)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pruned = Similarity.ivfPqTopK(emb, queries, 5, nlist = 16, nprobe = 4,
      m = 16, ksub = 16, iters = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(pruned.contains).toDouble / exact.size
    assert(recall > 0.15, s"ivfpq recall $recall")
    // empty corpus answers the empty frame
    val none = emb.filter(col("vec_id") < 0)
    assert(Similarity.ivfPqTopK(none, none, k = 3).count() == 0)
  }

  test("PQ-ANN: reconstruction-cosine error bounded, deterministic across partitionings") {
    val queries = emb.filter(col("vec_id") < 10)
    // |cos(q, reconstruction) - cos(q, x)| stays small on average —
    // measured avg ~0.07 on the isotropic fixture at 8×5-bit codes
    val pq = Similarity.pqTopK(emb, queries, 500, m = 8, ksub = 32, iters = 2)
      .select(col("qid"), col("nid"), col("cos").as("pcos"))
    val ex = Similarity.bruteForceTopK(emb, queries, 500)
      .select(col("qid"), col("nid"), col("cos").as("ecos"))
    val err = pq.join(ex, Seq("qid", "nid"))
      .select(avg(abs(col("pcos") - col("ecos")))).as[Double].collect()(0)
    assert(err < 0.15, s"pq avg cosine error $err")
    // same answer from a different physical layout (training sample,
    // encoding, and ranking are all order-independent by construction)
    val a = Similarity.pqTopK(emb, queries, 5, m = 4, ksub = 16, iters = 2)
      .collect().map(_.toString).sorted
    val b = Similarity.pqTopK(emb.repartition(13), queries, 5, m = 4, ksub = 16, iters = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "pqTopK not partition-invariant")
    // empty corpus answers the empty frame, never throws
    val empty = emb.filter(col("vec_id") < 0)
    assert(Similarity.pqTopK(empty, empty, k = 3, m = 4, ksub = 8).count() == 0)
  }

  test("IVF-ANN recall beats LSH at similar probe cost") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // nprobe/nlist = 4/16 → ~25% of corpus probed per query
    val ivf = Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // IVF probes the lists nearest the query (not a fixed hash cell), so
    // recall should clear the LSH ~0.4 at the same probed fraction
    assert(recall > 0.45, s"ivf recall $recall")
  }

  test("persisted IVF index serves identically to the live path and prunes partitions") {
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString + "/idx"
    Similarity.writeIvfIndex(emb, dir, nlist = 16, iters = 2)
    val served = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 4)
    // bit-identical to the live train+assign+rank path at the same params
    val live = Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 4, iters = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served.as[(Long, Long, Double, Int)].collect().toSet == live)
    // the at-rest layout is one directory per list, and the serving scan
    // is statically pruned to the probed lists only
    val listDirs = new java.io.File(s"$dir/lists").listFiles()
      .filter(_.getName.startsWith("list=")).map(_.getName).toSet
    assert(listDirs.nonEmpty && listDirs.subsetOf(
      (0 until 16).map(i => s"list=$i").toSet), s"bad layout: $listDirs")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list"),
      s"list scan not partition-pruned:\n$plan")
    // an empty query batch answers the empty contract frame
    val none = Similarity.ivfTopKFromIndex(spark, dir,
      emb.filter(col("vec_id") < 0), k = 5, nprobe = 4)
    assert(none.columns.toSeq == Seq("qid", "nid", "cos", "rn") && none.isEmpty)
    // the guard fails fast BEFORE the driver tries to hold the batch
    val tooBig = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 4,
        maxQueryRows = 3)
    }
    assert(tooBig.getMessage.contains("maxQueryRows"))
  }

  test("appendToIvfIndex grows the index in place; full-probe serving stays exact") {
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_app").toString + "/idx"
    Similarity.writeIvfIndex(half, dir, nlist = 16, iters = 2)
    Similarity.appendToIvfIndex(spark, dir, rest)
    // every vector is in the lists exactly once, inside list= partitions
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.count() == emb.count())
    assert(lists.select("nid").distinct().count() == emb.count())
    // probing ALL lists is an exact full scan: equals brute force over the
    // grown corpus, appended vectors included
    val queries = emb.filter(col("vec_id") < 10)
    val full = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == brute)
    // an appended vector is immediately servable: a query AT an appended
    // vector probes that vector's own nearest list first and finds it at
    // rank 1 with cosine 1
    val probe1 = rest.limit(1)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val target = rest.limit(1).select("vec_id").as[Long].head()
    val hit = Similarity.ivfTopKFromIndex(spark, dir, probe1, k = 1, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(hit.length == 1 && hit.head._2 == target && hit.head._3 == 1.0,
      s"appended vector not served: ${hit.mkString(",")}")
    // a replayed append duplicates; compactIvfIndex restores exactly-once
    // and serving stays exact
    Similarity.appendToIvfIndex(spark, dir, rest) // double-append
    assert(spark.read.parquet(s"$dir/lists").count() > emb.count())
    Similarity.compactIvfIndex(spark, dir)
    val compacted = spark.read.parquet(s"$dir/lists")
    assert(compacted.count() == emb.count())
    assert(compacted.select("nid").distinct().count() == emb.count())
    val full2 = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full2 == brute)
  }

  test("deleteFromIvfIndex hides ids on both serving paths; compact drops them physically") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_del").toString + "/idx"
    Similarity.writeIvfIndex(emb, dir, nlist = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 8)
    val deleted = emb.filter(col("vec_id") % 3 === 0)
    val deletedIds = deleted.select("vec_id").as[Long].collect().toSet
    Similarity.deleteFromIvfIndex(spark, dir, deleted)
    // logical delete: the lists still hold the rows, serving hides them
    assert(spark.read.parquet(s"$dir/lists").count() == emb.count())
    val served = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 16)
      .as[(Long, Long, Double, Int)].collect()
    assert(served.nonEmpty && served.forall(r => !deletedIds.contains(r._2)),
      "tombstoned id served (collected path)")
    val dist = Similarity.ivfTopKFromIndexDistributed(spark, dir, queries,
      k = 5, nprobe = 16).as[(Long, Long, Double, Int)].collect()
    assert(dist.toSet == served.toSet, "distributed path diverged under tombstones")
    // compact: rows physically gone, tombstone store cleared, serving same
    Similarity.compactIvfIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/lists").count() ==
      emb.count() - deletedIds.size)
    assert(!new java.io.File(s"$dir/tombstones").exists(), "tombstones not cleared")
    val after = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 16)
      .as[(Long, Long, Double, Int)].collect()
    assert(after.toSet == served.toSet, "compaction changed served answers")
    // re-add AFTER compaction restores the ids to serving
    Similarity.appendToIvfIndex(spark, dir, deleted)
    val back = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 16)
      .as[(Long, Long, Double, Int)].collect()
    assert(back.exists(r => deletedIds.contains(r._2)),
      "re-added ids still hidden after compaction")
    // delete of an absent id is a no-op
    Similarity.deleteFromIvfIndex(spark, dir,
      Seq(99999999L).toDF("vec_id"))
    val noop = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 16)
      .as[(Long, Long, Double, Int)].collect()
    assert(noop.toSet == back.toSet)
  }

  test("filtered IVF serving: full probe ≡ brute force over the allowed subset") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_filt").toString + "/idx"
    Similarity.writeIvfIndex(emb, dir, nlist = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 8)
    val allowed = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    // full probe (nprobe = nlist): the filtered serve must be the exact
    // brute-force answer over the allowed corpus
    val served = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5,
        nprobe = 16, allowed = Some(allowed))
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") % 3 === 0), queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == brute, "filtered full-probe serve != filtered brute force")
    assert(served.forall(_._2 % 3 == 0), "disallowed neighbor served")
    // pruned probes stay inside the allowed subset and keep decent recall
    val pruned = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5,
        nprobe = 4, allowed = Some(allowed))
      .as[(Long, Long, Double, Int)].collect()
    assert(pruned.forall(_._2 % 3 == 0))
    val recall = pruned.map(r => (r._1, r._2)).toSet
      .intersect(brute.map(r => (r._1, r._2)).toSet).size.toDouble /
      brute.size
    assert(recall > 0.5, s"filtered pruned recall $recall")
    // a wide allowed frame is rejected
    intercept[IllegalArgumentException](
      Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 4,
        allowed = Some(emb.select(col("vec_id"), col("embedding")))))
  }

  test("distributed IVF probe assignment matches the collected path with no driver collect of queries") {
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf_dist").toString + "/idx"
    Similarity.writeIvfIndex(emb, dir, nlist = 16, iters = 2)
    val collected = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 5, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val dist = Similarity.ivfTopKFromIndexDistributed(spark, dir, queries, k = 5, nprobe = 4)
    assert(dist.as[(Long, Long, Double, Int)].collect().toSet == collected)
    // the query frame stays distributed: its parquet scan must appear in
    // the executed plan (the collected path replaces it with a local
    // relation of driver-collected probe rows)
    val plan = dist.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
      s"probe assignment not executor-side:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"query batch was collected to the driver:\n$plan")
  }

  test("LSH-blocked embeddingNearDup: exact-scored subset with usable recall") {
    val exact = Similarity.embeddingNearDup(emb, 0.4)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // force the distributed blocked path (ceiling 0): candidates come from
    // banded LSH, scores from the codegen kernel — every found pair must
    // carry the exact path's score bit-for-bit.
    val blocked = Similarity.embeddingNearDup(emb, 0.4, "vec_id", "embedding",
      broadcastMaxRows = 0L, bands = 32, planesPerBand = 8)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(blocked.keySet.subsetOf(exact.keySet),
      s"blocked path invented pairs: ${blocked.keySet.diff(exact.keySet).take(5)}")
    blocked.foreach { case (pair, c) =>
      assert(exact(pair) == c, s"score drift at $pair: ${exact(pair)} vs $c") }
    // 32 bands × 8 planes at cosine ~0.4-0.6 → theory ≈ 0.6+; this corpus
    // measured ~0.8. Anything above half is a working blocker.
    val recall = blocked.size.toDouble / exact.size
    assert(recall > 0.5, s"blocked recall $recall (${blocked.size}/${exact.size})")
  }

  test("zero-norm embeddings yield NaN cosine that is dropped, not thrown") {
    val zeroed = Seq(
      (1L, Array.fill(4)(0.0f)), (2L, Array.fill(4)(0.0f)),
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (4L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    // broadcast path: the 0/0 pairs must fail the threshold silently
    val exact = Similarity.embeddingNearDup(zeroed, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact == Set((3L, 4L, 1.0)))
    // blocked path: Spark round() has the same NaN pass-through
    val blocked = Similarity.embeddingNearDup(zeroed, 0.5, "vec_id", "embedding",
      broadcastMaxRows = 0L, bands = 4, planesPerBand = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked.subsetOf(exact))
  }

  test("IVF trained on a hash-mod sample still beats the recall bar") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // maxTrainRows below the corpus size → mod > 1 → Lloyd's sees only the
    // deterministic hash-mod sample; assignment stays corpus-wide.
    val ivf = Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 4,
      iters = 5, idCol = "vec_id", vecCol = "embedding", maxTrainRows = 128)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall > 0.4, s"sampled-training ivf recall $recall")
  }

  test("repetition signals: known fractions on hand-built documents") {
    import graft.llm.TextAnalysis
    val df = Seq(
      (1L, "a a a"),             // 1 distinct of 3; bigrams: "a a"×2 → 1.0
      (2L, "a b a b a"),         // 2 distinct of 5; bigrams a b,b a,a b,b a → 0.5
      (3L, "x"),                 // shorter than any n-gram → 0.0
      (4L, "p q r s")            // all unique; every bigram unique → 1/3
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.dupTokenFrac(col("text")).as("d"),
      TextAnalysis.topNgramFrac(col("text"), 2).as("b"),
      TextAnalysis.topNgramFrac(col("text"), 3).as("t"))
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 0.6667, 1.0, 1.0)))
    assert(got(1) == ((2L, 0.6, 0.5, 0.6667)))
    assert(got(2) == ((3L, 0.0, 0.0, 0.0)))
    assert(got(3) == ((4L, 0.0, 0.3333, 0.5)))
  }

  test("semanticDedup: exact components on a hand-built space; monotone in threshold") {
    // nlist=2, iters=0 → centroids are v0=(1,0) and v1=(0,1). Cluster 0
    // holds {v0, v2≈v0, v3=v0} → one component, rep 0. Cluster 1 holds
    // {v1, v4≈v1, v5} with cos(v5, v1) ≈ 0.447 < 0.9 → v5 survives.
    val fix = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.99f, 0.1f)), (3L, Array(1f, 0f)),
      (4L, Array(0.1f, 0.99f)), (5L, Array(-1f, 0.5f))
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(fix, threshold = 0.9, nlist = 2, iters = 0)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 5L), s"got $kept")

    // real embeddings, trained path: output is a subset, and a stricter
    // threshold never keeps fewer
    val all = emb.select("vec_id").as[Long].collect().toSet
    val loose = Similarity.semanticDedup(emb, threshold = 0.4, nlist = 16, iters = 3)
      .select("vec_id").as[Long].collect().toSet
    val strict = Similarity.semanticDedup(emb, threshold = 0.9, nlist = 16, iters = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(loose.subsetOf(all) && loose.nonEmpty)
    assert(strict.size >= loose.size)
  }

  test("lineDedup drops frequent lines, keeps order, empties all-boilerplate docs") {
    val df = Seq(
      (1L, "HEADER\nalpha\nFOOTER"),
      (2L, "HEADER\nbeta\ngamma\nFOOTER"),
      (3L, "HEADER\nFOOTER"),      // nothing survives → empty text
      (4L, "delta\nHEADER\nepsilon") // boilerplate mid-doc, order preserved
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(df, "text", "doc_id", minDocs = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    // HEADER in 4 docs, FOOTER in 3 → both dropped; all else unique → kept
    assert(got.toSeq == Seq(
      (1L, "alpha"), (2L, "beta\ngamma"), (3L, ""), (4L, "delta\nepsilon")))
  }

  test("seenFilter: zero false negatives, bounded false-positive drops") {
    val history = docs.select(col("doc_id"), col("text"))
    val seen = docs.limit(250).select(col("doc_id") + 20000, col("text"))
      .toDF("doc_id", "text")
    val novel = docs.select(col("doc_id") + 40000,
      concat(col("text"), lit(" entirely novel suffix "), col("doc_id")))
      .toDF("doc_id", "text")
    val batch = seen.unionByName(novel)
    val kept = Dedup.seenFilter(batch, history, "text",
      expectedItems = 1000, fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    // every history duplicate is gone — bloom has no false negatives
    assert(kept.forall(_ >= 40000), "a seen document slipped through")
    // and nearly all novel rows survive (fpp 1% on 500 rows)
    val novelCount = novel.count()
    assert(kept.size >= novelCount - 15,
      s"too many novel rows dropped: ${novelCount - kept.size}")
  }

  test("semanticDedup and ivfTopK survive an empty corpus (trained and flat)") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semanticDedup(empty, 0.5, nlist = 4, iters = 3).count() == 0)
    assert(Similarity.ivfTopK(empty, empty, k = 3, nlist = 4, nprobe = 2,
      iters = 2).count() == 0)
  }

  test("tokenBudgetSample: budget respected, nested across budgets, partition-invariant") {
    import graft.llm.{Sampling, TextAnalysis}
    val base = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
    def run(df: org.apache.spark.sql.DataFrame, budgets: Map[String, Long]) =
      Sampling.tokenBudgetSample(df, "lang", "doc_id", "n", budgets)
        .select("doc_id", "lang", "n").as[(Long, String, Long)].collect()
    val budgets = Map("en" -> 3000L, "fr" -> 1000L, "de" -> 500L)
    val kept = run(base, budgets)
    // per-stratum totals stay within budget
    kept.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum <= budgets(lang), s"$lang over budget")
    }
    // bigger budgets only ever add documents
    val bigger = run(base, budgets.view.mapValues(_ * 2).toMap).map(_._1).toSet
    assert(kept.map(_._1).toSet.subsetOf(bigger))
    // admission is independent of physical partitioning
    val reshuffled = run(base.repartition(7, col("n")), budgets).map(_._1).toSet
    assert(reshuffled == kept.map(_._1).toSet)
  }

  test("stripDuplicateSpans: cross-doc, within-doc, and overlapping coverage") {
    val df = Seq(
      (1L, "z a b c d z"),       // shares "a b c","b c d" with doc 2
      (2L, "y a b c d y"),
      (3L, "q r s t u v"),       // fully unique → unchanged
      (4L, "m n o m n o m")      // within-doc repeats cover everything
    ).toDF("doc_id", "text")
    val got = Dedup.stripDuplicateSpans(df, "text", "doc_id", width = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "z z"), (2L, "y y"), (3L, "q r s t u v"), (4L, "")))
  }

  test("pii scrub redacts planted pii and counts every hit") {
    import graft.llm.TextAnalysis
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "from 192.168.0.1 to 10.0.0.255 dial 555-123-4567"),
      (3L, "no pii here, just words and 1234 numbers")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.scrubPii(col("text")).as("s"),
      TextAnalysis.piiCount(col("text")).as("n"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "mail <EMAIL> now", 1L)))
    assert(got(1) == ((2L, "from <IP> to <IP> dial <PHONE>", 3L)))
    assert(got(2) == ((3L, "no pii here, just words and 1234 numbers", 0L)))
  }

  test("decode stub emits 4 features per media row, deterministic") {
    val media = Multimodal.ingestAsMedia(docs.limit(10), "doc_id", "text", "source")
    val f1 = Multimodal.decodeStub(media).orderBy("media_id").collect()
    val f2 = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(_.getAs[Seq[Double]]("feature").size == 4))
    // byte_len matches the declared metadata
    val declared = media.select("media_id", "meta.declared_bytes")
      .as[(Long, Long)].collect().toMap
    f1.foreach(r => assert(r.getAs[Long]("byte_len") == declared(r.getAs[Long]("media_id"))))
  }

  test("resize stub bounds output size and stays deterministic") {
    val media = Multimodal.ingestAsMedia(docs.limit(10), "doc_id", "text", "source")
    val resized = Multimodal.resizeStub(media, targetBytes = 64).collect()
    resized.foreach { r =>
      val out = r.getAs[Array[Byte]]("content")
      assert(out.length <= 128, s"resize overshoot: ${out.length}")
      assert(out.nonEmpty)
    }
    val again = Multimodal.resizeStub(media, targetBytes = 64).collect()
    assert(resized.map(_.getAs[Array[Byte]]("content").toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]]("content").toSeq).toSeq)
  }

  test("frame sampling covers all bytes at stride 1") {
    val media = Multimodal.ingestAsMedia(docs.limit(5), "doc_id", "text", "source")
    val frames = Multimodal.frameSample(media, stride = 1)
    val reassembled = frames.groupBy("media_id")
      .agg(sum(octet_length(col("frame_bytes"))).as("n"))
      .join(media, "media_id")
      .filter(col("n") =!= octet_length(col("content")))
    assert(reassembled.count() == 0)
  }

  test("fixText: NFC-composes, strips controls, collapses whitespace; ASCII is identity") {
    val in = Seq(
      (1L, "cafe\u0301 plain"),           // decomposed -> composed
      (2L, "a\u0007b\u0000c"),            // control chars dropped
      (3L, "  x \t y\n\nz  "),            // ws runs collapse, ends trim
      (4L, "already clean ascii")
    ).toDF("id", "t")
    val out = in.select(col("id"), TextAnalysis.fixText(col("t")).as("f"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "café plain")
    assert(out(2L) == "abc")
    assert(out(3L) == "x y z")
    assert(out(4L) == "already clean ascii")
    // and the fixed text is byte-identical to the NFC of the input
    assert(out(1L).codePointAt(3) == 0xE9)
  }

  test("keepBestRepresentatives keeps the highest-scoring cluster member, min-id on ties") {
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val corpus = Seq(
      (1L, a, 0.3),                                  // near-dup cluster {1,2,4}
      (2L, a.substring(a.indexOf(' ') + 1), 0.9),    // highest quality -> kept
      (4L, a.substring(a.indexOf(' ') + 1) + " x", 0.9), // tie -> id 2 wins
      (7L, "completely different words describing an unrelated subject entirely", 0.1)
    ).toDF("doc_id", "text", "q")
    val kept = Dedup.keepBestRepresentatives(corpus, "text", "doc_id", "q", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 7L), s"kept $kept")
    // min-id semantics would have kept 1 — quality selection differs
    val minId = Dedup.keepRepresentatives(corpus, "text", "doc_id", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 7L), s"min-id kept $minId")
  }

  test("dedup over fixText collapses NFC/NFD twins that byte-exact dedup misses") {
    val base = docs.limit(50).select(col("doc_id"), col("text"))
    val planted = base
      .select(col("doc_id"), concat(col("text"), lit(" caf\u00e9")).as("text"))
      .unionByName(base.select((col("doc_id") + 40000).as("doc_id"),
        concat(col("text"), lit(" cafe\u0301")).as("text")))
    // byte-exact dedup: every twin is its own group
    assert(graft.llm.Dedup.exact(planted, "text", "doc_id").count() == 100)
    // normalize first: twins collapse onto the lower id, dup_count 2
    val fixed = graft.llm.Dedup.exact(planted.select(col("doc_id"),
      TextAnalysis.fixText(col("text")).as("text")), "text", "doc_id")
    val rows = fixed.select("keep_id", "dup_count").as[(Long, Long)].collect()
    assert(rows.length == 50)
    assert(rows.forall { case (id, n) => id < 40000 && n == 2 })
  }

  test("unigramSurprisal: rare tokens cost more bits; totals are consistent") {
    val in = Seq((1L, "common common common rare"), (2L, "common common common common"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(in, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("surprisal_bits"), r.getAs[Long]("n_tokens"))).toMap
    // N=8 tokens -> floor(log2 8)=3; 'common' cnt=7 -> 2; 'rare' cnt=1 -> 0
    assert(out(1L) == (3 * (3 - 2) + (3 - 0), 4L)) // 3 commons + 1 rare = 6 bits
    assert(out(2L) == (4 * (3 - 2), 4L))           // 4 commons = 4 bits
  }

  test("blocklistHits: word boundaries only, case-insensitive; term syntax enforced") {
    val in = Seq((1L, "FRAK and smeg twice smeg"), (2L, "frakking is a non-hit"),
      (3L, "clean")).toDF("id", "t")
    val hits = in.select(col("id"),
      TextAnalysis.blocklistHits(col("t"), Seq("frak", "smeg")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistHits(col("t"), Seq("bad.regex("))
    }
  }

  test("classifierLogit: exact integer arithmetic on hand-built features") {
    val m = TextAnalysis.LinearModel(
      bias = 10L, wTokens = 100L, wStop = 500L, wDupFp = -1L, wPii = -2000L)
    // "the cat sat" -> 3 tokens, 1 stopword hit, dup frac 0, no pii
    // logit = 10 + 300 + 500 - 0 - 0 = 810
    val in = Seq((1L, "the cat sat"),
      (2L, "spam spam spam spam reach x@y.io")).toDF("id", "t")
    val out = in.select(col("id"),
      TextAnalysis.classifierLogit(col("t"), m).as("l"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 810L)
    // doc 2: 6 tokens (3 distinct), 0 stop hits, dup frac 0.5 -> 5000 fp,
    // 1 email: 10 + 600 + 0 - 5000 - 2000 = -6390
    assert(out(2L) == -6390L)
  }

  test("snapshot diff classifies all four statuses; diffStats sums them") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val v2 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("id", "t")
    val d = Snapshot.diff(v1, v2, "id", Seq("t"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    val stats = Snapshot.diffStats(v1, v2, "id", Seq("t")).collect().head
    assert((stats.getAs[Long]("n_added"), stats.getAs[Long]("n_removed"),
      stats.getAs[Long]("n_changed"), stats.getAs[Long]("n_unchanged")) == (1L, 1L, 1L, 1L))
    // NULL placement and NULL-vs-empty must classify as 'changed', and
    // NULL payloads on both sides as 'unchanged' (digest NULL-encoding)
    val n1 = Seq((1L, Option("a"), Option.empty[String]),
      (2L, Option.empty[String], Option("b")),
      (3L, Option.empty[String], Option.empty[String])).toDF("id", "t", "u")
    val n2 = Seq((1L, Option.empty[String], Option("a")),
      (2L, Option(""), Option("b")),
      (3L, Option.empty[String], Option.empty[String])).toDF("id", "t", "u")
    val nd = Snapshot.diff(n1, n2, "id", Seq("t", "u"))
      .as[(Long, String)].collect().toMap
    assert(nd == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"), nd.toString)
  }

  test("temperatureSample: targets follow sqrt weights, admission budget-monotone and partition-invariant") {
    val in = docs.select(col("doc_id"), col("lang"))
    val k200 = Sampling.temperatureSample(in, "lang", "doc_id", 200L)
      .as[(String, Long)].collect().toSet
    // per-stratum targets = floor(200 * floor(sqrt(n_s)) / sum_w)
    val counts = in.groupBy("lang").count().as[(String, Long)].collect().toMap
    val w = counts.view.mapValues(n => math.floor(math.sqrt(n.toDouble)).toLong).toMap
    val tw = w.values.sum
    val byLang = k200.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    w.foreach { case (lang, ws) =>
      assert(byLang.getOrElse(lang, 0L) == 200L * ws / tw,
        s"stratum $lang got ${byLang.getOrElse(lang, 0L)} slots, want ${200L * ws / tw}")
    }
    // head stratum is downweighted relative to its raw share
    val (headLang, headN) = counts.maxBy(_._2)
    assert(byLang(headLang).toDouble / k200.size < headN.toDouble / counts.values.sum)
    // budget-monotone: smaller budget admits a subset
    val k100 = Sampling.temperatureSample(in, "lang", "doc_id", 100L)
      .as[(String, Long)].collect().toSet
    assert(k100.subsetOf(k200))
    // partition-invariant
    val reparted = Sampling.temperatureSample(in.repartition(13), "lang", "doc_id", 200L)
      .as[(String, Long)].collect().toSet
    assert(reparted == k200)
    // NULL strata neither admit nor deflate the denominator: admissions
    // are identical with a large NULL-lang block mixed in
    val withNulls = in.unionByName(
      docs.select((col("doc_id") + 90000).as("doc_id"),
        lit(null.asInstanceOf[String]).as("lang")))
    val kNull = Sampling.temperatureSample(withNulls, "lang", "doc_id", 200L)
      .as[(String, Long)].collect().toSet
    assert(kNull == k200, "NULL stratum changed the admitted set")
  }

  test("capPerStratum: caps every stratum, cap-monotone, partition-invariant, no Window") {
    val in = docs.select(col("doc_id"), col("lang"))
    val counts = in.groupBy("lang").count().as[(String, Long)].collect().toMap
    val k40 = Sampling.capPerStratum(in, "lang", "doc_id", 40L)
      .as[(Long, String)].collect().toSet
    val byLang = k40.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    counts.foreach { case (lang, n) =>
      assert(byLang.getOrElse(lang, 0L) == math.min(n, 40L),
        s"stratum $lang kept ${byLang.getOrElse(lang, 0L)} of $n, cap 40") }
    // a larger cap only ever ADDS rows
    val k80 = Sampling.capPerStratum(in, "lang", "doc_id", 80L)
      .as[(Long, String)].collect().toSet
    assert(k40.subsetOf(k80))
    // partition-invariant, and never a per-stratum Window
    val reparted = Sampling.capPerStratum(in.repartition(13), "lang", "doc_id", 40L)
    assert(reparted.as[(Long, String)].collect().toSet == k40)
    val plan = reparted.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-stratum window survived:\n$plan")
  }

  test("weightedSystematicSample: interval-cover counts, certainty rows, partition-invariant, no Window") {
    import graft.llm.Sampling
    val in = docs.select(col("doc_id"), col("lang"),
      col("n_chars").cast("long").as("w"))
    val stride = 1500L
    val kept = Sampling.weightedSystematicSample(in, "lang", "doc_id", "w", stride)
      .as[(Long, String, Long)].collect().toSet
    // per-stratum kept count: ≤ ⌊total/stride⌋, and ≥ that minus the rows
    // whose interval covers 2+ multiples (only weights > stride can)
    val rows = in.as[(Long, String, Long)].collect()
    val keptBy = kept.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val total = rs.map(_._3).sum
      val big = rs.count(_._3 > stride)
      val n = keptBy.getOrElse(lang, 0L)
      assert(n <= total / stride, s"$lang kept $n > ${total / stride}")
      assert(n >= total / stride - big,
        s"$lang kept $n < ${total / stride} - $big")
    }
    // certainty: every row with weight ≥ stride is kept
    val heavy = rows.filter(_._3 >= stride).map(_._1).toSet
    assert(heavy.subsetOf(kept.map(_._1)),
      s"certainty rows missing: ${(heavy -- kept.map(_._1)).take(5)}")
    // zero/NULL weights never keep
    val zeroed = Sampling.weightedSystematicSample(
      Seq((1L, "x", 0L), (2L, "x", 5L)).toDF("doc_id", "lang", "w"),
      "lang", "doc_id", "w", 1L).as[(Long, String, Long)].collect()
    assert(zeroed.map(_._1).toSet == Set(2L), "zero-weight row admitted")
    // partition-invariant, no per-stratum Window
    val reparted = Sampling.weightedSystematicSample(
      in.repartition(13), "lang", "doc_id", "w", stride)
    assert(reparted.as[(Long, String, Long)].collect().toSet == kept)
    val plan = reparted.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-stratum window survived:\n$plan")
  }

  test("chunkTexts: full coverage, exact overlap, short/empty/null docs") {
    val in = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz"), // 26 chars: 3 windows at stride 8
      (2L, "short"),                      // shorter than one chunk
      (3L, ""),                           // empty: one empty chunk
      (4L, null.asInstanceOf[String])     // null: no rows
    ).toDF("doc_id", "text")
    val chunks = graft.llm.Packing.chunkTexts(in, "text", "doc_id", 10, 2)
      .as[(Long, Long, String)].collect().sortBy(t => (t._1, t._2))
    val byDoc = chunks.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byDoc(1L) == Seq("abcdefghij", "ijklmnopqr", "qrstuvwxyz"))
    // consecutive windows share exactly the overlap
    byDoc(1L).sliding(2).foreach { case Seq(a, b) =>
      assert(a.takeRight(2) == b.take(2)) }
    // stripping each window's leading overlap reconstructs the text
    assert(byDoc(1L).head + byDoc(1L).tail.map(_.drop(2)).mkString == "abcdefghijklmnopqrstuvwxyz")
    assert(byDoc(2L) == Seq("short") && byDoc(3L) == Seq(""))
    assert(!byDoc.contains(4L))
    // degenerate params rejected
    intercept[IllegalArgumentException](
      graft.llm.Packing.chunkTexts(in, "text", "doc_id", 10, 10))
  }

  test("trainPerceptron: separable data converges, exact across partitionings") {
    // y = sign(2·x1 − x2 − 1) with a margin — linearly separable
    val rows = for (x1 <- 0L to 20L; x2 <- 0L to 20L
                    if (2 * x1 - x2 - 1).abs >= 2)
      yield (x1, x2, if (2 * x1 - x2 - 1 > 0) 1L else -1L)
    val df = rows.toDF("x1", "x2", "y").cache()
    val w = TextAnalysis.trainPerceptron(df, Seq("x1", "x2"), "y", epochs = 12)
      .collect().head
    val (w1, w2, b) = (w.getLong(0), w.getLong(1), w.getLong(2))
    val acc = rows.count { case (x1, x2, y) =>
      y * (w1 * x1 + w2 * x2 + b) > 0 }.toDouble / rows.size
    assert(acc > 0.95, s"perceptron accuracy $acc with w=($w1,$w2,$b)")
    // integer batch updates: bit-identical from any partitioning
    val w13 = TextAnalysis.trainPerceptron(df.repartition(13),
      Seq("x1", "x2"), "y", epochs = 12).collect().head
    assert(w13.toSeq == w.toSeq, "weights changed under repartition")
  }

  test("curriculumOrder: exact 3:1 interleave, partition-invariant, no Window") {
    val in = ((1 to 30).map(i => (i.toLong, "a")) ++
      (101 to 110).map(i => (i.toLong, "b"))).toDF("doc_id", "lang")
    def positions(df: org.apache.spark.sql.DataFrame) =
      Sampling.curriculumOrder(df, "lang", "doc_id", Map("a" -> 3L, "b" -> 1L))
        .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    val pos = positions(in)
    // stride math: the k-th b doc runs at vtime k·S, preceded by exactly
    // the 3k a docs with vtime ⌊j·S/3⌋ ≤ k·S (tie at j=3k goes to 'a') —
    // so b lands at every 4th position exactly, start to finish
    (1 to 10).foreach(k => assert(pos(100L + k) == 4L * k,
      s"b#$k at ${pos(100L + k)}, expected ${4 * k}"))
    assert(pos.values.toSeq.sorted == (1L to 40L), "positions not a permutation")
    assert(positions(in.repartition(7)) == pos, "not partition-invariant")
    val plan = Sampling.curriculumOrder(in, "lang", "doc_id", Map("a" -> 3L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into curriculum plan")
  }

  test("BPE train/encode: hand-checked merges, greedy fold, early stop") {
    import graft.llm.Bpe
    // corpus "aa aa ab": round 1 ties (a,a) vs (a,</w>) at 2 — lex break
    // picks (a,</w>) ('<' < 'a'); then (a,a</w>), (a,b), (ab,</w>), dry.
    val df = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", nMerges = 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "a", "</w>", "a</w>", 2L),
      (2, "a", "a</w>", "aa</w>", 2L),
      (3, "a", "b", "ab", 1L),
      (4, "ab", "</w>", "ab</w>", 1L)), s"merges: $merges")

    val toks = Bpe.encode(df, "text", "doc_id",
        merges.map(m => (m._2, m._3)))
      .as[(Long, Seq[String])].collect().head._2
    assert(toks == Seq("aa</w>", "aa</w>", "ab</w>"), s"tokens: $toks")

    // greedy left-to-right on odd runs: "aaa" under (a,a) → [aa, a]
    val run = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val runToks = Bpe.encode(run, "text", "doc_id", Seq(("a", "a")))
      .as[(Long, Seq[String])].collect().head._2
    assert(runToks == Seq("aa", "a", "</w>", "aa", "aa", "</w>"),
      s"greedy runs: $runToks")

    // partition-invariance: merge table identical from a 13-way layout
    val docs13 = Tables.t(spark, sf, "documents").repartition(13)
    val m1 = Bpe.train(Tables.t(spark, sf, "documents"), "text", 4).collect().toSet
    val m2 = Bpe.train(docs13, "text", 4).collect().toSet
    assert(m1 == m2, "BPE merges changed under repartition")
  }

  test("randomProject preserves cosine structure (JL) and stays exact-integer") {
    val rp = Similarity.randomProject(emb, inDim = 64, outDim = 16)
    val joined = emb.select(col("vec_id"), col("embedding"))
      .join(rp, "vec_id")
      .as[(Long, Seq[Float], Seq[Long])].collect().sortBy(_._1)
    def cos[T](a: Seq[T], b: Seq[T])(implicit n: Numeric[T]): Double = {
      val ad = a.map(n.toDouble); val bd = b.map(n.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      d / math.sqrt(ad.map(x => x * x).sum * bd.map(x => x * x).sum)
    }
    // deviation between original-space and projected-space cosine over
    // consecutive pairs: ±1 JL at outDim=16 has stderr ~1/√16 = 0.25
    val devs = joined.sliding(2).map { case Array(a, b) =>
      math.abs(cos(a._2, b._2) - cos(a._3, b._3)) }.toSeq
    val meanDev = devs.sum / devs.size
    assert(meanDev < 0.25, s"mean cosine deviation $meanDev")
    // exactness: re-projection under a different partitioning is
    // bit-identical (integer arithmetic — no float order hazard)
    val again = Similarity.randomProject(emb.repartition(13), 64, 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(joined.forall { case (id, _, v) => again(id) == v })
  }

  test("bigramSurprisal: branch semantics on a hand-checked corpus") {
    // train = docs 1,2 ("a b", "a b"); held-out doc 3 = "a b c a"
    //   N=4; c(a)=2, c(b)=2; bigram c(a,b)=2
    val in = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(in, "text", "doc_id",
        col("doc_id") =!= 3L)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 'a' first-token uni = ⌊lg 4⌋−⌊lg 2⌋ = 1; 'b' after 'a' bigram
    //   = ⌊lg c(a)⌋−⌊lg c(ab)⌋ = 0 → bits 1, no backoff
    assert(out(1L) == ((1L, 1L, 2L, 0L, 0.5)), s"${out(1L)}")
    // doc 3 "a b c a": a→1; (a,b) seen→0; (b,c): bigram unseen, c OOV →
    //   1 + length(bin(4)) = 4; (c,a): bigram unseen, a in-vocab →
    //   1 + (⌊lg4⌋−⌊lg2⌋) = 2 → bits 7, two backoffs
    assert(out(3L)._2 == 7L && out(3L)._4 == 2L,
      s"held-out scoring: ${out(3L)}")
    // partition-invariance: exact integers can't drift with layout
    val reparted = TextAnalysis.bigramSurprisal(in.repartition(7), "text",
        "doc_id", col("doc_id") =!= 3L)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(reparted == out.values.toSet)
  }

  test("IVF drift-triggered retrain: frozen centroids sag on drifted ingest, retrain recovers recall") {
    // base cluster along e1 (internal spread on coord 2); the drifted
    // batch lives along e3 with a ±1 first coordinate that SPLITS it
    // across both frozen lists — the recall-sag shape the retrain fixes
    val base = (0L until 8L).map(i => (i, Array(100f, i.toFloat, 0f, 0f)))
    val fresh = (100L until 108L).map { i =>
      val s = if (i % 2 == 0) 1f else -1f
      (i, Array(s, 0f, 100f, (i - 100).toFloat))
    }
    val baseDf = base.toDF("vec_id", "embedding")
    val freshDf = fresh.toDF("vec_id", "embedding")
    val q = Seq((999L, Array(0f, 0f, 100f, 1.5f))).toDF("vec_id", "embedding")
    val all = baseDf.unionByName(freshDf)
    val brute = Similarity.bruteForceTopK(all, q, 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet

    // WITHOUT retrain: the drifted batch splits across the frozen lists,
    // so a 1-probe query at the new cluster misses half its neighbors
    val frozen = java.nio.file.Files.createTempDirectory("ivf_frozen").toString + "/idx"
    Similarity.writeIvfIndex(baseDf, frozen, nlist = 2, iters = 3)
    Similarity.appendToIvfIndex(spark, frozen, freshDf)
    val sagged = Similarity.ivfTopKFromIndex(spark, frozen, q, k = 4, nprobe = 1)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(sagged != brute, "fixture should demonstrate frozen-centroid recall sag")

    // WITH the drift trigger: an in-distribution batch measures ≈ 1 and
    // leaves the centroids alone; the drifted batch measures far below
    // the threshold, fires the retrain, and the same 1-probe query is
    // exact again
    val dir = java.nio.file.Files.createTempDirectory("ivf_retrain").toString + "/idx"
    Similarity.writeIvfIndex(baseDf, dir, nlist = 2, iters = 3)
    def centroidSnapshot(): Set[(Int, Seq[Double])] =
      spark.read.parquet(s"$dir/centroids")
        .as[(Int, Array[Double])].collect()
        .map { case (i, a) => (i, a.toSeq) }.toSet
    val centroidsBefore = centroidSnapshot()
    val inDist = Seq((50L, Array(100f, 3.5f, 0f, 0f))).toDF("vec_id", "embedding")
    val d1 = Similarity.appendToIvfIndexWithRetrain(spark, dir, inDist,
      retrainBelow = 0.9, nlist = 2, iters = 3)
    assert(d1 > 0.95, s"in-distribution drift should be ≈ 1, got $d1")
    assert(centroidSnapshot() == centroidsBefore,
      "in-distribution append must not retrain")
    val d2 = Similarity.appendToIvfIndexWithRetrain(spark, dir, freshDf,
      retrainBelow = 0.9, nlist = 2, iters = 3)
    assert(d2 < 0.5, s"orthogonal ingest should measure heavy drift, got $d2")
    assert(centroidSnapshot() != centroidsBefore,
      "drifted append must retrain")
    val bruteAll = Similarity.bruteForceTopK(all.unionByName(inDist), q, 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recovered = Similarity.ivfTopKFromIndex(spark, dir, q, k = 4, nprobe = 1)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(recovered == bruteAll, s"post-retrain 1-probe: $recovered != $bruteAll")
    // an index written before the stats file existed measures neutral
    val legacy = java.nio.file.Files.createTempDirectory("ivf_legacy").toString + "/idx"
    Similarity.writeIvfIndex(baseDf, legacy, nlist = 2, iters = 3)
    val fs = new org.apache.hadoop.fs.Path(s"$legacy/stats")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$legacy/stats"), true)
    assert(Similarity.ivfAssignDrift(spark, legacy, freshDf) == 1.0)
  }
}
