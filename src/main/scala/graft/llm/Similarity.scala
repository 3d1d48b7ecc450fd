package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2.12).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact; broadcast the (small) query set and
  *    scan the corpus once — the right baseline at any corpus size when the
  *    query set is small.
  *  - random-hyperplane LSH buckets: the scale path — bucket id is a
  *    scan-side expression, so candidate generation is a bucket equi-join;
  *    recall tunes with plane count / multi-probe.
  *
  * All arithmetic in double (embeddings are float32 on disk) with a single
  * left-fold summation order so results are reproducible across runs and
  * comparable to the DuckDB oracle.
  */
object Similarity {

  /** dot(a, b) as a left-fold over zip_with products (deterministic order).
    * HOF formulation kept as the executable spec; the hot paths use the
    * codegen'd [[graft.functions.VectorKernels.cosine_sim]], which runs the
    * identical ascending-index fold in one fused loop. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed random projection to `outDim` dimensions in EXACT integer
    * arithmetic (Achlioptas 2003's ±1 database-friendly JL projections,
    * made hash-exact): each input component quantizes to fixed point
    * (`round(v_i · scale)` as long — the [[quantizeInt8]] idea at higher
    * precision), and output component j is the ±1-signed integer sum
    * Σ_i q_i · s(i,j), with s(i,j) = ±1 from the parity of the repo's
    * SQL-mirrorable mult-mod permutation hash over i·outDim + j
    * ([[graft.sketch.Kmv]]'s arithmetic). Integer sums commute, so the
    * projected vectors are bit-identical across engines, partitionings,
    * and runs — no float summation-order hazard — while keeping the JL
    * distance-preservation property of ±1 projections (up to the
    * quantization error, ≤ 0.5/scale per component).
    *
    * Output: (idCol, outCol: array<long>). Cosine in the projected space
    * approximates cosine in the original: the scale cancels, so only the
    * ±1 mixing matters — use for cheap pre-filtering before an exact
    * rerank, the standard dim-reduction serving shape.
    *
    * 100 TB story: a pure scan-side codegen'd HOF expression — zero
    * shuffles, zero state; downstream ANN then pays outDim ≪ inDim per
    * distance. */
  def randomProject(df: DataFrame, inDim: Int, outDim: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    scale: Int = 10000, outCol: String = "rp"): DataFrame = {
    require(inDim >= 1 && outDim >= 1, s"dims must be >= 1: $inDim → $outDim")
    val P = graft.sketch.Kmv.P
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(sequence(lit(0), lit(inDim - 1)), lit(0L), (acc, i) => {
        val q = round(element_at(col(vecCol), (i + 1).cast("int"))
          .cast("double") * scale, 0).cast("long")
        // a single mult-mod parity carries linear structure in (i, j) —
        // measurably WORSE JL behavior than random signs — so a second
        // round with an xor-shift between the multiplies decorrelates
        // (mean cosine deviation ~0.20 vs ~0.44 on the fixture, with
        // true-random at ~0.18)
        val h1 = (i * outDim + j) % P * RpK1 % P
        val h2 = h1.bitwiseXOR(shiftright(h1, 15)) * RpK2 % P
        acc + q * (lit(1L) - lit(2L) * (h2 % 2))
      }))
    df.select(col(idCol), proj.as(outCol))
  }

  private val RpK1 = 2654435761L
  private val RpK2 = 2246822519L

  /** DuckDB mirror of [[randomProject]]'s projection expression. */
  def randomProjectSql(vec: String, inDim: Int, outDim: Int,
                       scale: Int = 10000): String = {
    val P = graft.sketch.Kmv.P
    val h1 = s"(((i * $outDim + j) % $P) * $RpK1 % $P)"
    s"""list_transform(range(0, $outDim), j ->
       |  list_sum(list_transform(range(0, $inDim), i ->
       |    CAST(round($vec[i + 1]::DOUBLE * $scale) AS BIGINT)
       |      * (1 - 2 * (xor($h1, $h1 >> 15) * $RpK2 % $P % 2)))))"""
      .stripMargin
  }

  /** Exact top-k neighbors for each query vector. Cosine is rounded before
    * ranking (ties broken by neighbor id) so ranking is stable under float
    * noise. queries is expected to be small → broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")))
    val scored = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .join(q, col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qvec"), col("nvec")), 5))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** One (query, candidate) pool row for [[mmrRerank]]'s per-query greedy:
    * `rel` = relevance quantized to an integer (1e5·cos) so selection is
    * exact arithmetic. */
  final case class MmrCand(qid: Long, nid: Long, rel: Long)
  /** One candidate-pair similarity (both directions materialized). */
  final case class MmrSim(qid: Long, a: Long, b: Long, s: Long)

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein '98): from
    * each query's top-`poolK` cosine candidates, greedily select `k` that
    * trade relevance against redundancy —
    * `argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — the standard
    * diversification pass between ANN retrieval and a context window.
    *
    * Determinism: relevance and pairwise similarity are quantized to
    * integers (1e5 × cosine rounded to 5 decimals, the ann_topk contract),
    * λ is an integer percent, and every argmax tie-breaks on the smaller
    * candidate id — so the greedy is exact integer arithmetic, bit-equal
    * across partitionings and engines.
    *
    * Scale posture: candidate pools come from [[bruteForceTopK]] (swap in
    * any ANN front — LSH/IVF — upstream); the poolK² pairwise-sim join and
    * the greedy are both per-query and poolK-bounded (poolK ≤ 1024
    * enforced), so the whole rerank is |queries|·poolK² work distributed
    * by query — never corpus-quadratic. The greedy itself runs in one
    * cogroup (two shuffles keyed on qid), O(k·poolK) per query. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, poolK: Int, k: Int,
                lambdaPct: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(poolK > 0 && poolK <= 1024, s"poolK must be in 1..1024, got $poolK")
    require(k > 0 && k <= poolK, s"k must be in 1..poolK, got $k")
    require(lambdaPct >= 0 && lambdaPct <= 100,
      s"lambdaPct must be in 0..100, got $lambdaPct")
    val spark = corpus.sparkSession
    import spark.implicits._
    val pool = bruteForceTopK(corpus, queries, poolK, idCol, vecCol)
      .select(col("qid"), col("nid"),
        round(col("cos") * 100000, 0).cast("long").as("rel"))
    val vecs = corpus.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val withVec = pool.join(vecs, col("nid") === col("vid"))
      .select(col("qid"), col("nid"), col("rel"), col("vec"))
    val half = withVec.as("a").join(withVec.as("b"),
        col("a.qid") === col("b.qid") && col("a.nid") < col("b.nid"))
      .select(col("a.qid").as("qid"), col("a.nid").as("a"), col("b.nid").as("b"),
        round(round(graft.functions.VectorKernels.cosine_sim(
          col("a.vec"), col("b.vec")), 5) * 100000, 0).cast("long").as("s"))
    val sims = half.unionByName(
      half.select(col("qid"), col("b").as("a"), col("a").as("b"), col("s")))
    pool.as[MmrCand].groupByKey(_.qid)
      .cogroup(sims.as[MmrSim].groupByKey(_.qid)) { (qid, cs, ss) =>
        val cand = cs.toArray
        val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
        ss.foreach(r => sim((r.a, r.b)) = r.s)
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val remaining = scala.collection.mutable.Map(
          cand.map(c => c.nid -> c.rel): _*)
        val maxSim = scala.collection.mutable.HashMap.empty[Long, Long]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var rank = 1L
        while (rank <= k && remaining.nonEmpty) {
          // rank 1 = pure relevance (no selected set yet); later ranks =
          // λ·rel − (1−λ)·maxsim. Ties on score → smaller nid.
          val pick = remaining.keys.minBy { nid =>
            // rank 1 ranks by bare rel (not λ·rel) so λ=0 still selects
            // the most relevant seed, matching the oracle's first step
            val score =
              if (selected.isEmpty) remaining(nid)
              else lambdaPct * remaining(nid) -
                (100L - lambdaPct) * maxSim.getOrElse(nid, 0L)
            (-score, nid)
          }
          out += ((qid, pick, rank))
          remaining -= pick
          selected += pick
          remaining.keys.foreach { nid =>
            val s = sim.getOrElse((nid, pick), 0L)
            if (!maxSim.contains(nid) || s > maxSim(nid)) maxSim(nid) = s
          }
          rank += 1
        }
        out.iterator
      }.toDF("qid", "nid", "mmr_rank")
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim) —
    * splitmix64-style integer mix folded to [-1, 1). No RNG state, so every
    * executor computes identical planes — and an oracle can inline the very
    * same values as SQL literals (graft-private for that purpose). */
  private[graft] def coeff(plane: Int, d: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane LSH bucket id: one bit per plane = sign of the dot
    * product with a deterministic plane. HOF formulation kept as the
    * executable spec; hot paths use the codegen'd
    * [[graft.functions.VectorKernels.lsh_bucket]], which runs the identical
    * fold in one fused loop (KernelParitySpec proves bucket equality). Pure
    * expression → computed during the scan; the bucket column can also be
    * written at ingest and used as a partition key for ANN at rest. */
  def lshBucket(vec: Column, dims: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val planeVec = array((0 until dims).map(d => lit(coeff(p, d))): _*)
      when(dot(vec, planeVec) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k via LSH buckets: candidates = corpus rows in the query's
    * bucket (equi-join on bucket id), ranked by exact cosine. Trades recall
    * for touching ~corpus/2^planes rows per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
              planes: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val bucket = graft.functions.VectorKernels.lsh_bucket(col(vecCol), planes, dims = dims)
    val bucketed = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      bucket.as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      bucket.as("bucket")))
    bucketed.join(q, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qvec"), col("nvec")), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** Scalar int8 quantization of an embedding column: per-vector scale =
    * maxAbs/127, elements rounded to [-127, 127]. 4× smaller at rest than
    * float32 (8× than float64) — at 100 TB of embeddings that is the
    * difference between fitting the ANN working set in cluster memory or
    * not. Zero vectors quantize to zeros (scale 0 kept for reconstruction).
    * Dequantization is `element × scale`; COSINE never needs it — the
    * per-vector scale cancels, so [[quantizedTopK]] ranks on the int
    * arrays directly. Rounding is Spark `round` (HALF_UP), mirrored
    * exactly by the oracle. Non-finite elements (NaN/±Inf from upstream
    * model bugs) quantize to 0 — under ANSI mode a raw `cast(NaN as int)`
    * would otherwise abort the whole corpus-wide job for one bad row. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val xd = transform(col(vecCol), x => {
      val d = x.cast("double")
      when(isnan(d) || d === lit(Double.PositiveInfinity) ||
        d === lit(Double.NegativeInfinity), lit(0.0)).otherwise(d)
    })
    val maxAbs = array_max(transform(xd, x => abs(x)))
    df.select(col(idCol), (maxAbs / lit(127.0)).as("scale"),
      when(maxAbs === lit(0.0), transform(xd, _ => lit(0)))
        .otherwise(transform(xd,
          x => round(x / (maxAbs / lit(127.0)), 0).cast("int"))).as("qvec"))
  }

  /** Exact top-k over the QUANTIZED vectors: same plan as
    * [[bruteForceTopK]] (broadcast query batch, one scan, codegen'd cosine
    * kernel — it widens int arrays exactly), but the scan reads 4× fewer
    * bytes. The int8 rounding error moves cosine by O(1e-2), so top-k
    * agrees with exact for most queries (recall asserted in ScalaTest);
    * rank on the quantized score then rerank survivors with full-precision
    * vectors when exactness matters. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qz = quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol).as("nid"), col("qvec").as("nq"))
    val qq = broadcast(quantizeInt8(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("qvec").as("qq")))
    qz.join(qq, col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qq"), col("nq")), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** Product-quantization ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011 — the FAISS `PQ` codec): each
    * corpus vector is encoded as `m` small codes — per subspace, the
    * L2-nearest codeword from a `ksub`-entry codebook — and queries rank
    * candidates by cosine against the RECONSTRUCTION via asymmetric
    * distance computation: the query stays full-precision, and its dot
    * product with any codeword is one lookup in an m×ksub table computed
    * once per query. At m=4/ksub=256 the at-rest representation is
    * 4 bytes/vector vs 256 for float32×64 — a 64× memory reduction, the
    * arithmetic that lets a 100 TB embedding corpus serve ANN from RAM.
    *
    * Scale shape: codebooks are tiny (m·ksub·subdim doubles) and broadcast;
    * encoding is ONE distributed scan; scoring per (query, code-row) is
    * m table lookups — no per-pair float vector math at all. The query set
    * is the broadcast request-batch contract shared with
    * [[bruteForceTopK]]; candidates are the full coded corpus (flat ADC
    * scan — compose with the IVF list routing of [[ivfTopK]] for the
    * probed-subset variant).
    *
    * Deterministic, and at iters=0 SQL-expressible end to end: codebook j
    * is the j-th subvector slice of the first `ksub` vectors by id,
    * refinement is per-subspace L2 Lloyd's over the hash-mod sample
    * (ties → lower codeword id), ranking ties → lower neighbor id. The
    * ann_pq oracle hash-checks codebook construction, encoding, the ADC
    * lookup sums, and ranking bit-for-bit. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
             ksub: Int = 16, iters: Int = 0,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxTrainRows: Long = 1L << 18): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    val books = trainPqCodebooks(ds, idCol, m, ksub, iters, maxTrainRows)
    if (books.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("qid", "nid", "cos", "rn")
    val subdim = books(0)(0).length
    val bcBooks = spark.sparkContext.broadcast(books)
    // encode: one distributed scan → m codes per row (the at-rest shape)
    val coded = ds.mapPartitions { it =>
      val bs = bcBooks.value
      it.map { case (id, vf) => (id, pqEncode(bs, vf)) }
    }
    // query batch: the broadcast request-batch contract of bruteForceTopK
    val qRows = queries.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])].collect()
    // ADC tables. lut(j)(c) = dot(query subspace j, codeword c); rnorm² of
    // a code row = Σ_j ‖codeword‖² (exact — the reconstruction IS the
    // codewords). Ascending-j folds mirror the oracle's ORDER BY j sums.
    val qLuts = qRows.map { case (qid, vf) =>
      val v = vf.map(_.toDouble)
      val lut = Array.tabulate(books.length, books(0).length) { (j, c) =>
        dotOf(v.slice(j * subdim, (j + 1) * subdim), books(j)(c))
      }
      (qid, lut, normOf(v))
    }
    val normTab = books.map(_.map(cw => dotOf(cw, cw)))
    val bcQ = spark.sparkContext.broadcast(qLuts)
    val bcN = spark.sparkContext.broadcast(normTab)
    coded.flatMap { case (nid, codes) =>
      val nt = bcN.value
      var rn2 = 0.0
      var j = 0; while (j < codes.length) { rn2 += nt(j)(codes(j)); j += 1 }
      val rnorm = math.sqrt(rn2)
      bcQ.value.iterator.filter(_._1 != nid).map { case (qid, lut, qn) =>
        var adot = 0.0
        var jj = 0; while (jj < codes.length) { adot += lut(jj)(codes(jj)); jj += 1 }
        (qid, nid, adot / (qn * rnorm))
      }
    }.toDF("qid", "nid", "raw")
      .withColumn("cos", round(col("raw"), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** IVF-PQ ANN — the FAISS `IndexIVFPQ` serving shape: [[ivfTopK]]'s
    * coarse quantizer routes each query to its `nprobe` nearest lists,
    * and candidates INSIDE the probed lists are scored with [[pqTopK]]'s
    * ADC lookup tables over the m-code rows. The two reductions multiply:
    * per query the scan touches ~nprobe/nlist of the corpus and reads
    * codes, not vectors — at m=4/nlist=16/nprobe=4 that is 1/4 of the
    * rows at 1/64 of the bytes, the 100 TB serving posture. Rerank the
    * survivors against full-precision vectors when exactness matters
    * (the shortlist pattern LlmSpec demonstrates for pqTopK).
    *
    * Simplification vs FAISS: codes quantize the RAW vectors, not the
    * per-list residuals — one shared codebook set across lists, and the
    * iters=0 path stays SQL-expressible end to end: ann_ivfpq composes
    * the ann_ivf_flat (coarse assignment/probing) and ann_pq (codebooks/
    * ADC) oracle conventions and hash-checks the whole pipeline. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 4,
                ksub: Int = 16, iters: Int = 0,
                idCol: String = "vec_id", vecCol: String = "embedding",
                maxTrainRows: Long = 1L << 18): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    val centroids = trainCentroids(ds, idCol, nlist, iters, maxTrainRows)
    val books = trainPqCodebooks(ds, idCol, m, ksub, iters, maxTrainRows)
    if (centroids.isEmpty || books.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("qid", "nid", "cos", "rn")
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcB = spark.sparkContext.broadcast(books)
    // ONE scan → (coarse list, m codes) per row: the at-rest shape
    val coded = ds.mapPartitions { it =>
      val cs = bcC.value; val bs = bcB.value
      it.map { case (id, vf) =>
        (id, nearest(cs, vf.map(_.toDouble)), pqEncode(bs, vf)) }
    }.toDF("nid", "list", "codes")
    // query batch: broadcast request-batch contract (ivfTopK/bruteForce)
    val qRows = queries.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])].collect()
    val subdim = books(0)(0).length
    val qLuts = qRows.map { case (qid, vf) =>
      val v = vf.map(_.toDouble)
      val lut = Array.tabulate(books.length, books(0).length) { (j, c) =>
        dotOf(v.slice(j * subdim, (j + 1) * subdim), books(j)(c))
      }
      qid -> (lut, normOf(v))
    }.toMap
    val normTab = books.map(_.map(cw => dotOf(cw, cw)))
    val probes = qRows.toSeq.flatMap { case (qid, vf) =>
      probeLists(centroids, vf, nprobe).map(list => (qid, list)) }
    val bcQ = spark.sparkContext.broadcast(qLuts)
    val bcN = spark.sparkContext.broadcast(normTab)
    coded.join(broadcast(probes.toDF("qid", "list")), Seq("list"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("codes"))
      .as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bcQ.value; val nt = bcN.value
        it.map { case (qid, nid, codes) =>
          val (lut, qn) = qs(qid)
          var adot = 0.0; var rn2 = 0.0
          var j = 0
          while (j < codes.length) {
            adot += lut(j)(codes(j)); rn2 += nt(j)(codes(j)); j += 1
          }
          (qid, nid, adot / (qn * math.sqrt(rn2)))
        }
      }.toDF("qid", "nid", "raw")
      .withColumn("cos", round(col("raw"), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** Per-subspace codebooks for [[pqTopK]], shape [m][≤ksub][dims/m].
    * Same training contract as [[trainCentroids]]: iters=0 → the first
    * `ksub` vectors by id, sliced (no corpus-sized work at any scale);
    * otherwise per-subspace L2 Lloyd's on the driver over the
    * deterministic xxhash64-mod sample capped at `maxTrainRows`. */
  private[llm] def trainPqCodebooks(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])], idCol: String,
      m: Int, ksub: Int, iters: Int, maxTrainRows: Long): Array[Array[Array[Double]]] = {
    require(m > 0 && ksub > 0, "m and ksub must be positive")
    require(maxTrainRows > 0, "maxTrainRows must be positive")
    def slices(vs: Array[Array[Double]]): Array[Array[Array[Double]]] = {
      val dims = vs.head.length
      require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
      val sub = dims / m
      Array.tabulate(m)(j => vs.map(_.slice(j * sub, (j + 1) * sub)))
    }
    if (iters == 0) {
      val seeds = ds.orderBy(col(idCol)).limit(ksub).collect()
        .sortBy(_._1).map(_._2.map(_.toDouble))
      return if (seeds.isEmpty) Array.empty else slices(seeds)
    }
    val total = ds.count()
    val mod = math.max(1L, (total + maxTrainRows - 1) / maxTrainRows)
    val train = if (mod == 1L) ds
      else ds.filter(pmod(xxhash64(col(idCol)), lit(mod)) === 0)
    val all = train.collect().sortBy(_._1).map(_._2.map(_.toDouble))
    if (all.isEmpty) return Array.empty
    slices(all).map { sub =>
      var cb = sub.take(ksub).map(_.clone())
      (0 until iters).foreach { _ =>
        val sums = Array.fill(cb.length)(new Array[Double](sub.head.length))
        val counts = new Array[Int](cb.length)
        sub.foreach { v =>
          val c = nearestL2(cb, v)
          counts(c) += 1
          var i = 0; while (i < v.length) { sums(c)(i) += v(i); i += 1 }
        }
        cb = Array.tabulate(cb.length)(c =>
          if (counts(c) == 0) cb(c) else sums(c).map(_ / counts(c)))
      }
      cb
    }
  }

  /** Encode one vector as its m per-subspace nearest-codeword ids. */
  private def pqEncode(books: Array[Array[Array[Double]]],
                       vf: Array[Float]): Array[Int] = {
    val subdim = books(0)(0).length
    val v = vf.map(_.toDouble)
    Array.tabulate(books.length)(j =>
      nearestL2(books(j), v.slice(j * subdim, (j + 1) * subdim)))
  }

  /** argmin over codewords by squared L2 (ties → lower index — matches the
    * oracle's ORDER BY dist, cid). NaN distances never beat a real one. */
  private def nearestL2(cb: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cb.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cb(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Multi-probe LSH ANN: each query probes its own bucket PLUS every
    * Hamming-1 neighbor bucket (one plane's sign flipped) — the standard
    * recall fix for query points that sit close to a hyperplane, bought
    * with (planes+1)× candidate volume instead of more tables. The probe
    * set is a pure function of the bucket id (no margin ordering, no RNG),
    * so the operator stays deterministic and exactly SQL-expressible —
    * same codegen'd bucket kernel, candidates still one equi-join. */
  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
                        planes: Int = 8, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val bucket = graft.functions.VectorKernels.lsh_bucket(col(vecCol), planes, dims = dims)
    val bucketed = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      bucket.as("bucket"))
    val qb = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      bucket.as("qbucket"))
    // probe masks: 0 (own bucket) + one per flipped plane — all distinct,
    // so a (qid, nid) pair can match through at most one probe (no dedup)
    val masks = lit(0L) +: (0 until planes).map(p => lit(1L << p))
    val probes = broadcast(qb.select(col("qid"), col("qvec"),
      explode(array(masks.map(m => col("qbucket").bitwiseXOR(m)): _*)).as("bucket")))
    bucketed.join(probes, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qvec"), col("nvec")), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** Embedding near-dup pairs: all (a < b) with cosine ≥ threshold.
    *
    * Two physical paths, chosen by corpus size (the same two-path pattern as
    * [[Dedup.ngramJaccardPairs]]):
    *
    *  - at or below `broadcastMaxRows` (default 2M — ~1 GB of doubles at
    *    dim 64, the practical executor-memory ceiling): EXACT all-pairs.
    *    Per-pair Column HOFs interpret (never codegen) — 40× slower than
    *    primitive loops — so the corpus is broadcast as primitive double
    *    arrays and partitions stream against it with tight `while` loops.
    *  - above the ceiling: banded random-hyperplane LSH blocking — per doc,
    *    `bands` bucket ids of `planesPerBand` sign bits each, computed in
    *    one distributed pass; candidates = pairs sharing any (band, bucket),
    *    an equi-join on small keys; candidates are verified with the exact
    *    codegen'd cosine kernel. Nothing corpus-sized ever reaches the
    *    driver. Recall for a pair at angle θ is 1-(1-p^r)^b with
    *    p = 1-θ/π — ≈0.996 at cosine 0.8 for the 32×8 default; tune bands
    *    up (cost: shuffle volume) for lower thresholds.
    *
    * Both paths round cosine HALF_UP at 5 decimals (identical
    * implementation) before thresholding, so the pairs the blocked path
    * finds carry bit-identical scores to the exact path.
    *
    * Returns an EAGER, CACHED pairs frame (tiny next to the corpus): the
    * corpus projection is cached for the duration of the call — it feeds
    * the size probe plus 2-4 downstream scans — then released once the
    * pairs are materialized. `.unpersist()` the result when done if you
    * call this repeatedly in one session. */
  def embeddingNearDup(corpus: DataFrame, threshold: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddingNearDup(corpus, threshold, idCol, vecCol,
      broadcastMaxRows = 2000000L, bands = 32, planesPerBand = 8)

  def embeddingNearDup(corpus: DataFrame, threshold: Double,
                       idCol: String, vecCol: String, broadcastMaxRows: Long,
                       bands: Int, planesPerBand: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])].cache()
    // (round 16) ONE bounded limit-probe decides the path AND supplies the
    // broadcast copy — the old separate count() job decided nothing the
    // collect wasn't about to discover, and driver memory is bounded by
    // the same ceiling either way (an over-ceiling corpus collects at most
    // cap+1 rows here before taking the blocked path).
    val probe = ds.limit(
      math.min(broadcastMaxRows + 1, Int.MaxValue.toLong).toInt).collect()
    val out = if (probe.length <= broadcastMaxRows) {
      val all = probe.sortBy(_._1)
      val ids = all.map(_._1)
      val vecs = all.map(_._2.map(_.toDouble))
      val norms = vecs.map(normOf)
      val bc = spark.sparkContext.broadcast((ids, vecs, norms))
      ds.mapPartitions { it =>
        val (bIds, bVecs, bNorms) = bc.value
        it.flatMap { case (aId, aVecF) =>
          val aVec = aVecF.map(_.toDouble)
          val aNorm = normOf(aVec)
          Iterator.range(0, bIds.length)
            .filter(j => bIds(j) > aId)
            .flatMap { j =>
              val c = round5(dotOf(aVec, bVecs(j)) / (aNorm * bNorms(j)))
              if (c >= threshold) Some((aId, bIds(j), c)) else None
            }
        }
      }.toDF("a", "b", "cos")
    } else {
      // banded LSH blocking. Band buckets are computed with primitive loops
      // in one scan (one plane-matrix dot per band×plane), not Column HOFs.
      val nPlanes = bands * planesPerBand
      val banded = ds.mapPartitions { it =>
        var planes: Array[Array[Double]] = null // built lazily from row dims
        it.flatMap { case (id, vecF) =>
          if (planes == null)
            planes = Array.tabulate(nPlanes, vecF.length)((p, d) => coeff(p, d))
          val v = vecF.map(_.toDouble)
          Iterator.range(0, bands).map { band =>
            var bucket = 0L
            var p = 0
            while (p < planesPerBand) {
              if (dotOf(v, planes(band * planesPerBand + p)) >= 0)
                bucket |= 1L << p
              p += 1
            }
            (id, band, bucket)
          }
        }
      }.toDF("id", "band", "bucket")
      val l = banded.select(col("id").as("a"), col("band"), col("bucket"))
      val r = banded.select(col("id").as("b"), col("band"), col("bucket"))
      val cand = l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
        .select("a", "b").distinct()
      // exact verify: join the vectors onto the candidates (hash joins keyed
      // by id — candidates are a small fraction of n² after blocking) and
      // run the codegen'd cosine kernel. round() == round5 by construction.
      val vecsDf = ds.toDF("vid", "vec")
      cand
        .join(vecsDf.select(col("vid").as("a"), col("vec").as("va")), "a")
        .join(vecsDf.select(col("vid").as("b"), col("vec").as("vb")), "b")
        .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("va"), col("vb")), 5))
        // Spark SQL orders NaN ABOVE every number (NaN >= t is true), while
        // the broadcast path's Scala >= drops NaN — zero-norm vectors have
        // undefined cosine, so both paths must drop them explicitly.
        .filter(!isnan(col("cos")) && col("cos") >= threshold)
        .select(col("a"), col("b"), col("cos"))
    }
    // materialize the (tiny) pairs, then release the corpus-projection
    // cache — same lifetime discipline as Dedup.materializeThenRelease.
    val result = out.cache()
    result.count()
    ds.unpersist()
    result
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer → corpus rows
    * assigned to their nearest centroid's list → a query probes only its
    * `nprobe` nearest lists. The classic FAISS-style recall/cost dial:
    * cost ≈ nprobe/nlist of the corpus per query, recall → 1 as nprobe →
    * nlist.
    *
    * Training runs Lloyd's iterations on the driver over a SAMPLE of the
    * corpus, capped at `maxTrainRows` — k-means needs only a sketch of the
    * distribution, and the sample is drawn by id hash (xxhash64 mod), so it
    * is deterministic regardless of partitioning and never materializes the
    * corpus on the driver. The assignment pass is distributed (broadcast
    * centroids + one scan). Deterministic: centroids init from the first
    * `nlist` sampled vectors by id, fixed iteration count, ties to the
    * lower list id. */
  /** The ONE probe-selection rule every IVF serving path shares
    * (bit-parity between the live, collected, and distributed paths is
    * contractual — LlmSpec asserts result equality): the `nprobe`
    * centroids nearest by cosine, ties to the lower list id. */
  private def probeLists(cs: Array[Array[Double]], vf: Array[Float],
                         nprobe: Int): Seq[Int] = {
    val v = vf.map(_.toDouble)
    cs.indices
      .sortBy(c => (-dotOf(v, cs(c)) /
        (normOf(v) * math.max(normOf(cs(c)), 1e-12)), c))
      .take(nprobe)
  }

  /** The ONE frozen-centroid assignment pass ([[ivfTopK]] /
    * [[writeIvfIndex]] / [[appendToIvfIndex]]): broadcast centroids, one
    * distributed scan → (nid, nvec, list). */
  private def assignToLists(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    ds.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, vf) => (id, vf, nearest(cs, vf.map(_.toDouble))) }
    }.toDF("nid", "nvec", "list")
  }

  /** [[assignToLists]] plus each row's assignment-quality cosine (the
    * statistic [[ivfAssignDrift]] monitors): the same frozen-centroid
    * scan — `nearest` already computed every centroid dot product, so the
    * cosine to the chosen centroid is one extra division. Lets the index
    * write jobs OBSERVE the mean assignment cosine inside the write itself
    * (round 17, guide §1.2/§1.4) instead of paying the round-16 read-back
    * scan of the just-written lists. Formula identical to
    * [[meanAssignCos]]'s per-row term. */
  private def assignWithCos(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    ds.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, vf) =>
        val v = vf.map(_.toDouble)
        val c = nearest(cs, v)
        val cv = cs(c)
        (id, vf, c, dotOf(v, cv) /
          (math.max(normOf(v), 1e-12) * math.max(normOf(cv), 1e-12)))
      }
    }.toDF("nid", "nvec", "list", "graft_cos")
  }

  /** The observed `avg(graft_cos)` of a finished write job → the stored
    * baseline scalar: a NULL average (empty input wrote no rows) is the
    * neutral 1.0, everything else (NaN included — NaN embeddings
    * propagate, exactly like [[meanAssignCos]]) passes through. */
  private def observedMeanCos(obs: org.apache.spark.sql.Observation): Double =
    obs.get.get("mean_cos") match {
      case Some(d: java.lang.Double) => d.doubleValue()
      case _ => 1.0
    }

  /** The ONE probed-candidate ranking (every IVF serving path): exact
    * rounded cosine within the probed lists, self-matches dropped, ties to
    * the lower neighbor id. `lists` exposes (nid, nvec, list); `probes`
    * (qid, qvec, list). */
  private def rankProbed(lists: DataFrame, probes: DataFrame, k: Int): DataFrame =
    lists.join(probes, Seq("list")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qvec"), col("nvec")), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
              idCol: String = "vec_id", vecCol: String = "embedding",
              maxTrainRows: Long = 1L << 18): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    val centroids = trainCentroids(ds, idCol, nlist, iters, maxTrainRows)
    val bucketed = assignToLists(ds, centroids)
    // each query probes its nprobe nearest lists. Collecting the QUERY set
    // is the broadcast contract shared with bruteForceTopK — queries are a
    // request batch (≪ corpus), never corpus-sized.
    val qRows = queries.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])].collect()
    val probes = qRows.toSeq.flatMap { case (qid, vf) =>
      probeLists(centroids, vf, nprobe).map(list => (qid, vf, list)) }
    rankProbed(bucketed, broadcast(probes.toDF("qid", "qvec", "list")), k)
  }

  /** Persist an IVF index AT REST — the serving posture of a 100 TB ANN
    * deployment: train once, write (a) the centroid table (nlist rows) and
    * (b) the corpus assignments PARTITIONED BY list id, then serve query
    * batches from the parquet with [[ivfTopKFromIndex]] — no retraining,
    * no full-corpus assignment per batch. Because the assignments are
    * hive-partitioned on `list`, a query batch probing p lists reads ONLY
    * those partitions (static partition pruning at the scan — asserted in
    * LlmSpec), so per-batch cost is ≈ `Σ probed-list sizes`, the
    * FAISS-style nprobe/nlist fraction of the corpus. Training,
    * assignment, and ranking are exactly [[ivfTopK]]'s (LlmSpec asserts
    * result equality), so the iters=0 index is oracle-checkable through
    * the same SQL as ann_ivf_flat. */
  def writeIvfIndex(corpus: DataFrame, path: String,
                    nlist: Int = 16, iters: Int = 5,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    maxTrainRows: Long = 1L << 18): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    writeIndexInto(ds, idCol, path, nlist, iters, maxTrainRows)
  }

  /** The index-writing core shared by [[writeIvfIndex]] (into the live
    * path) and [[retrainIvfIndex]] (into a swap tmp): train, write
    * centroids + hive-partitioned lists, and record the training-time
    * assignment quality (mean cosine of each vector to its assigned
    * centroid, observed inside the list-write job — no extra scan) under
    * `dir/stats` — the baseline [[ivfAssignDrift]] compares ingest batches
    * against. */
  private def writeIndexInto(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])], idCol: String,
      dir: String, nlist: Int, iters: Int, maxTrainRows: Long): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(ds, idCol, nlist, iters, maxTrainRows)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    // (round 17, guide §1.2/§1.4) the stats baseline is OBSERVED inside the
    // list-write job itself: the assignment scan already computed every
    // centroid dot product, so avg(cos-to-assigned-centroid) rides the
    // write as one aggregated double — replacing the round-16 read-back of
    // the just-written lists (a full extra job + file listing per index
    // write; retrain paid it twice). The cosine column is projected away
    // before the write, so the on-disk lists layout is unchanged. An empty
    // corpus observes a NULL average → the neutral 1.0 baseline, same as
    // the old empty-corpus fallback.
    val obs = org.apache.spark.sql.Observation()
    assignWithCos(ds, centroids)
      .observe(obs, avg(col("graft_cos")).as("mean_cos"))
      .select(col("nid"), col("nvec"), col("list"))
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(s"$dir/lists")
    Seq(observedMeanCos(obs)).toDF("mean_assign_cos")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Mean cosine of each vector to its nearest centroid — the assignment
    * quality a distribution shift degrades (drifted vectors sit far from
    * every trained centroid). Distributed: broadcast centroids, one scan,
    * one scalar back. 1.0 (neutral) for an empty input or no centroids. */
  private def meanAssignCos(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      centroids: Array[Array[Double]]): Double = {
    if (centroids.isEmpty) return 1.0
    val spark = ds.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val r = ds.mapPartitions { it =>
      val cs = bc.value
      it.map { case (_, vf) =>
        val v = vf.map(_.toDouble)
        val c = cs(nearest(cs, v))
        dotOf(v, c) / (math.max(normOf(v), 1e-12) * math.max(normOf(c), 1e-12))
      }
    }.toDF("cos").agg(avg(col("cos"))).head()
    if (r.isNullAt(0)) 1.0 else r.getDouble(0)
  }

  /** Measured drift of an ingest batch against a [[writeIvfIndex]] index:
    * the batch's mean assignment cosine under the FROZEN centroids,
    * divided by the training-time baseline stored in `path/stats`.
    * ≈ 1 for in-distribution ingest; sinking toward 0 as vectors land
    * ever farther from every centroid — the silent-recall-degradation
    * signal the frozen-centroid append contract warns about. 1.0
    * (neutral, never triggers) when the index predates the stats file. */
  def ivfAssignDrift(spark: org.apache.spark.sql.SparkSession, path: String,
                     vectors: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Double = {
    import spark.implicits._
    val sp = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sp)) return 1.0
    val baseline = spark.read.parquet(s"$path/stats").head().getDouble(0)
    if (baseline <= 0) return 1.0
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val batch = vectors.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    meanAssignCos(batch, centroids) / baseline
  }

  /** Re-train a [[writeIvfIndex]] index from its OWN live content (the
    * rows of `lists` minus tombstones — the index holds every vector, so
    * no external corpus handle is needed): fresh centroids, fresh
    * assignments, fresh baseline, written under the crash-safe
    * [[graft.sources.Sources.swapDir]] protocol — serving reads the old
    * index until the swap, then the new one, never a mix. Tombstones are
    * folded in (deleted rows don't survive the rebuild) and the store
    * comes out clear. Run while no append stream is writing (the
    * compaction contract). */
  def retrainIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      nlist: Int = 16, iters: Int = 5,
                      maxTrainRows: Long = 1L << 18): Unit = {
    import spark.implicits._
    val live = antiTombstones(spark, path, spark.read.parquet(s"$path/lists"))
      .select(col("nid"), col("nvec")).as[(Long, Array[Float])]
    graft.sources.Sources.swapDir(spark, path) { tmp =>
      writeIndexInto(live, "nid", tmp, nlist, iters, maxTrainRows)
    }
  }

  /** [[appendToIvfIndex]] with the drift-triggered retrain that closes
    * the frozen-centroid serving loop: measure the batch's
    * [[ivfAssignDrift]], append it, and when the ratio falls below
    * `retrainBelow` re-run training over the grown index
    * ([[retrainIvfIndex]]). Returns the measured ratio so callers can
    * log/alert on the trend. At 100 TB the measurement is one extra scan
    * of the BATCH (never the index), and the retrain amortizes: it fires
    * on measured distribution shift, not on a wall-clock cadence. */
  def appendToIvfIndexWithRetrain(
      spark: org.apache.spark.sql.SparkSession, path: String,
      vectors: DataFrame, retrainBelow: Double = 0.9,
      nlist: Int = 16, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxTrainRows: Long = 1L << 18): Double = {
    import spark.implicits._
    // (round 17, guide §1.2) ONE batch pass serves both the drift
    // measurement and the append: the frozen centroids load once (round 16
    // read them twice — ivfAssignDrift and appendToIvfIndex each paid a
    // collect), the assignment scan computes each row's cosine as it
    // assigns, and the append write OBSERVES the batch mean — fusing what
    // were two full batch scans (drift's meanAssignCos + append's
    // assignToLists) into the one the write needs anyway. Drift semantics
    // unchanged: cosine against the FROZEN pre-append centroids, neutral
    // 1.0 when the index predates the stats file or the baseline is
    // non-positive, empty batch measures the neutral 1.0.
    val sp = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseline =
      if (!fs.exists(sp)) None
      else Some(spark.read.parquet(s"$path/stats").head().getDouble(0))
        .filter(_ > 0)
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    require(centroids.nonEmpty, s"no centroids at $path/centroids")
    val ds = vectors.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    val obs = org.apache.spark.sql.Observation()
    assignWithCos(ds, centroids)
      .observe(obs, avg(col("graft_cos")).as("mean_cos"))
      .select(col("nid"), col("nvec"), col("list"))
      .repartition(col("list"))
      .write.mode("append").partitionBy("list").parquet(s"$path/lists")
    val drift = baseline.fold(1.0)(b => observedMeanCos(obs) / b)
    if (drift < retrainBelow)
      retrainIvfIndex(spark, path, nlist, iters, maxTrainRows)
    drift
  }

  /** Grow a [[writeIvfIndex]] index IN PLACE (the FAISS `add` analog):
    * assign NEW vectors to the index's EXISTING centroids and append them
    * into the hive-partitioned lists — no retraining, no rebuild, each
    * call lands new files inside only the affected `list=` partitions, so
    * continuous ingest keeps serving costs at the nprobe/nlist fraction.
    * Serving (pruned or distributed) sees appended vectors immediately.
    *
    * Caller contracts (FAISS's own): ids must be new — appending an
    * existing id duplicates it (dedup upstream or compact); and the
    * centroids are FROZEN, so if ingest drifts far from the training
    * distribution, lists skew and recall sags — retrain + rebuild on a
    * cadence (monitor list-size skew via `spark.read.parquet(lists)
    * .groupBy("list").count()`). */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       vectors: DataFrame,
                       idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    require(centroids.nonEmpty, s"no centroids at $path/centroids")
    assignToLists(vectors.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])], centroids)
      .repartition(col("list"))
      .write.mode("append").partitionBy("list").parquet(s"$path/lists")
  }

  /** Compact a [[writeIvfIndex]] index's lists in place: drop duplicate
    * vector ids (the crash-replay artifact of the append sinks — replayed
    * rows are byte-identical, so any surviving copy is THE row; ties on a
    * genuinely conflicting id keep the lowest list for determinism) and
    * consolidate the per-append small files. Crash-safe via the
    * [[graft.sources.Sources.swapDir]] protocol; run while no append
    * stream is writing (same contract as the other compactions). */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val lists = spark.read.parquet(s"$path/lists")
    val live = antiTombstones(spark, path, lists)
    graft.sources.Sources.swapDir(spark, s"$path/lists") { tmp =>
      live.groupBy(col("nid"))
        .agg(min_by(struct(col("nvec"), col("list")), col("list")).as("s"))
        .select(col("nid"), col("s.nvec").as("nvec"), col("s.list").as("list"))
        .repartition(col("list"))
        .write.mode("overwrite").partitionBy("list").parquet(tmp)
    }
    // clear the tombstones the rewrite just applied. Crash between the
    // swap and this delete is safe: re-anti-joining already-removed ids
    // is a no-op (delete is idempotent); only a RE-ADD of a deleted id
    // must wait until the store is confirmed clear — see
    // [[deleteFromIvfIndex]]'s contract.
    val tp = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tp)) fs.delete(tp, true)
  }

  /** Delete vectors from a [[writeIvfIndex]] index (the FAISS
    * `remove_ids` analog, completing the add/compact/delete lifecycle):
    * LOGICAL deletion — ids append into `path/tombstones` (O(|deleted|)
    * write, no list rewrite), every serving path anti-joins the tombstone
    * set (broadcast: deletions between compactions are small), and
    * [[compactIvfIndex]] physically drops the rows and clears the store.
    * Deleting an absent id is a no-op. Contract: RE-ADDING a deleted id
    * only takes effect after a compaction has cleared its tombstone —
    * append-then-still-tombstoned rows stay hidden (and are dropped by
    * the next compact), exactly like a log-structured store's
    * delete-wins-until-merge rule. */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         ids: DataFrame, idCol: String = "vec_id"): Unit =
    ids.select(col(idCol).cast("long").as("nid")).distinct()
      .write.mode("append").parquet(s"$path/tombstones")

  /** Filter tombstoned rows out of a lists scan (applied AFTER any static
    * partition pruning, so pruned serving keeps its pruned read). */
  private def antiTombstones(spark: org.apache.spark.sql.SparkSession,
                             path: String, lists: DataFrame): DataFrame = {
    val tp = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tp)) lists
    else lists.join(
      broadcast(spark.read.parquet(s"$path/tombstones").select("nid").distinct()),
      Seq("nid"), "left_anti")
  }

  /** Serve a query batch from a [[writeIvfIndex]] index: centroids load
    * driver-side (nlist rows), each query picks its `nprobe` nearest
    * lists, and the list scan is STATICALLY filtered to the union of
    * probed list ids — partition pruning reads only those directories.
    * Ranking is identical to [[ivfTopK]] (exact cosine within probed
    * lists, ties to the lower neighbor id).
    *
    * Driver-side bound: the QUERY batch (not the corpus) collects to the
    * driver so its probe expansion can be broadcast — correct for the
    * serving contract (a query batch is small by definition) and guarded
    * by `maxQueryRows` so an accidentally corpus-sized `queries` frame
    * fails fast instead of silently OOMing the driver. For genuinely
    * large query frames use [[ivfTopKFromIndexDistributed]], which never
    * collects. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nprobe: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       maxQueryRows: Long = 1L << 20,
                       allowed: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val qSel = queries.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    // ONE execution, guard included: collect at most maxQueryRows + 1 rows
    // (driver memory bounded by the same limit) and fail on overflow — a
    // separate count() would run the upstream plan twice and, on a
    // nondeterministic frame, could pass while collect() materializes more
    val qRows = qSel.limit(
      math.min(maxQueryRows + 1, Int.MaxValue.toLong).toInt).collect()
    require(qRows.length <= maxQueryRows,
      s"query batch exceeds maxQueryRows=$maxQueryRows " +
        "(driver-side probe expansion); use ivfTopKFromIndexDistributed " +
        "for corpus-sized query frames")
    val probes = qRows.toSeq.flatMap { case (qid, vf) =>
      probeLists(centroids, vf, nprobe).map(list => (qid, vf, list)) }
    // empty batch (or empty index → no centroids → no probes): answer the
    // empty frame with the contract schema instead of planning an empty
    // isin over the list scan
    if (probes.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("qid", "nid", "cos", "rn")
    val probedLists = probes.map(_._3).distinct
    // FILTERED serving (FAISS IDSelector / vector-store metadata filters):
    // `allowed` is a one-id-column frame; the semi-join applies AFTER
    // partition pruning and BEFORE ranking, so the result is the exact
    // top-k among allowed rows in the probed lists. The filter side is a
    // dimension-shaped id list — broadcast, costing one scan-side probe
    // per candidate row at any corpus size. (Highly selective filters
    // want a larger nprobe: pruning happens per-list, and a filter can
    // empty a probed list — the standard filtered-ANN recall trade.)
    val scan0 = antiTombstones(spark, path, spark.read.parquet(s"$path/lists")
      .filter(col("list").isin(probedLists: _*))) // static partition pruning
    val scan = allowed.fold(scan0) { a =>
      require(a.columns.length == 1,
        s"allowed must have exactly one id column, got ${a.columns.toSeq}")
      scan0.join(broadcast(a.toDF("graft_allow_id")),
        col("nid") === col("graft_allow_id"), "left_semi")
    }
    rankProbed(scan, broadcast(probes.toDF("qid", "qvec", "list")), k)
  }

  /** [[ivfTopKFromIndex]] for DataFrame-sized query batches: the query
    * frame never touches the driver. Centroids (nlist rows — tiny by
    * construction) broadcast to executors; each query computes its own
    * `nprobe` nearest lists inside `flatMap`, and the probe frame joins
    * the list scan on `list`. Probe selection and ranking are bit-for-bit
    * the collected path's (same sort key, same tie-break — LlmSpec asserts
    * result equality), so either path serves the same answers.
    *
    * Scale trade vs the collected path: probed list ids are not known at
    * plan time, so the list scan cannot be STATICALLY pruned — but a
    * corpus-sized query batch probes essentially every list anyway, and
    * the join is a plain equi-join on `list` (shuffle or broadcast per
    * AQE), never |queries|×|corpus|. Use the collected variant for small
    * serving batches (pruned scan), this one for bulk scoring. */
  def ivfTopKFromIndexDistributed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    if (centroids.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("qid", "nid", "cos", "rn")
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    val probes = queries.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
      .flatMap { case (qid, vf) =>
        probeLists(bcCentroids.value, vf, nprobe).map(list => (qid, vf, list))
      }.toDF("qid", "qvec", "list")
    rankProbed(antiTombstones(spark, path, spark.read.parquet(s"$path/lists")),
      probes, k)
  }

  /** Deterministic k-means coarse-quantizer training, shared by [[ivfTopK]]
    * and [[semanticDedup]]: Lloyd's iterations on the driver over a
    * deterministic xxhash64-mod sample capped at `maxTrainRows` (k-means
    * needs a sketch of the distribution, never the corpus), centroids
    * seeded from the first `nlist` sampled vectors by id, fixed iteration
    * count, assignment ties to the lower list id. */
  private[llm] def trainCentroids(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])], idCol: String,
      nlist: Int, iters: Int, maxTrainRows: Long): Array[Array[Double]] = {
    require(maxTrainRows > 0, "maxTrainRows must be positive")
    // iters=0 asks for the untrained seeds — exactly the first nlist
    // vectors by id. Take them directly (a tiny ordered limit) instead of
    // sampling-then-collecting: no corpus-sized work at ANY scale, and the
    // "first nlist by id" contract the iters=0 oracles (ann_ivf_flat,
    // semantic_dedup) encode holds above the sample cap too.
    if (iters == 0)
      return ds.orderBy(col(idCol)).limit(nlist).collect()
        .sortBy(_._1).map(_._2.map(_.toDouble))
    // deterministic hash-mod sample for training: ceil division keeps the
    // EXPECTED sample size at or below maxTrainRows (corpora at or below
    // the cap train on every row, so small-corpus results are unchanged).
    // (round 16) probe with ONE bounded limit+collect first: a corpus at
    // or below the cap trains on every row anyway, so the counting scan
    // it used to pay decided nothing — collect up to cap+1 rows (driver
    // memory bounded by the same cap the full collect was about to use)
    // and only a genuine overflow falls back to the count + hash-mod
    // sample path, whose incremental executeTake probe cost is bounded.
    val capProbe = ds.limit(
      math.min(maxTrainRows + 1, Int.MaxValue.toLong).toInt).collect()
    val all =
      if (capProbe.length <= maxTrainRows) capProbe.sortBy(_._1)
      else {
        val total = ds.count()
        val mod = math.max(1L, (total + maxTrainRows - 1) / maxTrainRows)
        ds.filter(pmod(xxhash64(col(idCol)), lit(mod)) === 0)
          .collect().sortBy(_._1)
      }
    val vecs = all.map(_._2.map(_.toDouble))

    // Lloyd's algorithm, deterministic. An empty training set has nothing
    // to seed OR refine — return no centroids (callers produce empty
    // assignments/probes, so empty corpus → empty result, not a crash).
    if (vecs.isEmpty) return Array.empty
    var centroids = vecs.take(nlist).map(_.clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nlist)(new Array[Double](vecs.head.length))
      val counts = new Array[Int](nlist)
      vecs.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0; while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nlist)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding space with the IVF coarse quantizer, find intra-cluster
    * pairs at or above `threshold` cosine, collapse them to connected
    * components ([[Dedup.clusters]]), and keep each component's minimum-id
    * representative. Near-duplicate *meanings* — paraphrases, re-encodes,
    * template variants — dedup even when their text disagrees.
    *
    * Scale shape: pairwise comparison happens ONLY within a cluster — the
    * equi-join on the list id never materializes the n² cross product, and
    * `nlist` is the dial that bounds per-cluster candidate volume (SemDeDup
    * runs nlist ~ tens of thousands at web scale; per-list cost is
    * Σ n_c², so size clusters to executor memory). Training is sampled
    * ([[trainCentroids]]), assignment is one broadcast-centroid scan,
    * components collapse via the bounded-driver/propagation dual path in
    * [[Dedup.clusters]]. Zero-norm vectors (NaN cosine) never pair.
    *
    * @return the KEPT corpus rows (cluster representatives + singletons),
    *         original schema. iters=0 keeps the whole pipeline
    *         SQL-expressible (centroids = first nlist vectors by id) —
    *         the semantic_dedup query hash-checks it end to end. */
  def semanticDedup(corpus: DataFrame, threshold: Double, nlist: Int = 16,
                    iters: Int = 0, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    maxTrainRows: Long = 1L << 18): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    val bc = spark.sparkContext.broadcast(
      trainCentroids(ds, idCol, nlist, iters, maxTrainRows))
    // cache: the pairwise stage reads the assignment from BOTH join sides —
    // without it the corpus scan + centroid pass runs twice
    val assigned = ds.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, vf) => (id, vf, nearest(cs, vf.map(_.toDouble))) }
    }.toDF("id", "vec", "list").cache()
    val l = assigned.select(col("id").as("a"), col("vec").as("va"), col("list"))
    val r = assigned.select(col("id").as("b"), col("vec").as("vb"), col("list"))
    val pairs = l.join(r, Seq("list")).filter(col("a") < col("b"))
      .withColumn("cos", round(
        graft.functions.VectorKernels.cosine_sim(col("va"), col("vb")), 5))
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .select(col("a"), col("b"))
    // clusters() materializes eagerly (driver union-find or checkpointed
    // propagation), so the assignment cache releases right after
    val drops = Dedup.clusters(pairs)
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as(idCol))
    assigned.unpersist()
    corpus.join(drops, Seq(idCol), "left_anti")
  }

  /** argmin over centroids by cosine (ties → lower index). */
  private def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestScore = Double.NegativeInfinity
    val nv = normOf(v)
    var c = 0
    while (c < centroids.length) {
      val s = dotOf(v, centroids(c)) / (nv * math.max(normOf(centroids(c)), 1e-12))
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** ascending-index fold, identical to [[dot]]'s evaluation order. */
  private def dotOf(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normOf(a: Array[Double]): Double = math.sqrt(dotOf(a, a))
  /** HALF_UP at 5 decimals — literally the computation Spark's `round(_, 5)`
    * performs on doubles (NaN/Infinity passed through, then
    * BigDecimal.valueOf → setScale HALF_UP), so the primitive-loop paths
    * and the Column-round paths agree at every representation boundary —
    * including the NaN a zero-norm embedding produces, which must fail the
    * threshold filter, not throw. */
  private def round5(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x).setScale(5, java.math.RoundingMode.HALF_UP).doubleValue()
}
