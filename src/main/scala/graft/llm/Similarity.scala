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

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim) —
    * splitmix64-style integer mix folded to [-1, 1). No RNG state, so every
    * executor computes identical planes. */
  private def coeff(plane: Int, d: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane LSH bucket id: one bit per plane = sign of the dot
    * product with a deterministic plane. Pure expression → computed during
    * the scan; the bucket column can also be written at ingest and used as a
    * partition key for ANN at rest. */
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
    val bucketed = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      lshBucket(col(vecCol), dims, planes).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      lshBucket(col(vecCol), dims, planes).as("bucket")))
    bucketed.join(q, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qvec"), col("nvec")), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** Embedding near-dup pairs: all (a < b) with cosine ≥ threshold.
    *
    * All-pairs similarity is a matrix product, and per-pair Column HOFs
    * interpret (never codegen) — 40× slower than primitive loops. So this
    * broadcasts the corpus as primitive double arrays and streams partitions
    * against it: each task does tight `while` loops over doubles, emitting
    * only passing pairs. Arithmetic is the same ascending-index left fold as
    * [[dot]]/the DuckDB oracle, so results hash-match.
    *
    * Scale: broadcast side must fit in executor memory (embeddings are a
    * dimension-sized table here). For corpora beyond that, block first with
    * [[lshBucket]] equality and run this within buckets. */
  def embeddingNearDup(corpus: DataFrame, threshold: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    val all = ds.collect().sortBy(_._1)
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
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer → corpus rows
    * assigned to their nearest centroid's list → a query probes only its
    * `nprobe` nearest lists. The classic FAISS-style recall/cost dial:
    * cost ≈ nprobe/nlist of the corpus per query, recall → 1 as nprobe →
    * nlist.
    *
    * Training runs Lloyd's iterations on the driver over the collected
    * corpus — embeddings are a dimension-sized table here; at 100 TB you
    * train on a sample (k-means needs only a sketch of the distribution)
    * and the assignment below is already distributed (broadcast centroids +
    * one scan). Deterministic: centroids init from the first `nlist`
    * vectors by id, fixed iteration count, ties to the lower list id. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])]
    val all = ds.collect().sortBy(_._1)
    val vecs = all.map(_._2.map(_.toDouble))

    // Lloyd's algorithm, deterministic
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
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    // distributed assignment: one scan, broadcast centroids
    val bucketed = ds.mapPartitions { it =>
      val cs = bcCentroids.value
      it.map { case (id, vf) => (id, vf, nearest(cs, vf.map(_.toDouble))) }
    }.toDF("nid", "nvec", "list")

    // each query probes its nprobe nearest lists
    val qRows = queries.select(col(idCol).cast("long"),
      col(vecCol).cast("array<float>")).as[(Long, Array[Float])].collect()
    val probes = qRows.flatMap { case (qid, vf) =>
      val v = vf.map(_.toDouble)
      bcCentroids.value.indices
        .sortBy(c => (-dotOf(v, bcCentroids.value(c)) /
          (normOf(v) * math.max(normOf(bcCentroids.value(c)), 1e-12)), c))
        .take(nprobe).map(list => (qid, vf, list))
    }.toSeq
    val qDf = broadcast(probes.toDF("qid", "qvec", "list"))

    bucketed.join(qDf, Seq("list")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorKernels.cosine_sim(col("qvec"), col("nvec")), 5))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
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
  /** HALF_UP at 5 decimals (matches Spark round / DuckDB round for the
    * positive values a threshold can pass). */
  private def round5(x: Double): Double = math.floor(x * 1e5 + 0.5) / 1e5
}
