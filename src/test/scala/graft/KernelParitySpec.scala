package graft

import org.apache.spark.sql.functions._

import graft.functions.TextKernels
import graft.llm.Dedup

/** The codegen kernels in TextKernels claim bit-exact parity with the
  * Column-HOF formulations they replaced — proven here on real testdata
  * (plus the planted near-dup copies, which exercise shared shingles). */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    base.unionByName(base.select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))
  }

  test("shingle_hashes == sorted distinct xxhash64 of HOF shingles") {
    val hof = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        Dedup.shingles(graft.fts.Fts.tokens(col("text"))),
        s => xxhash64(s)))).as("sh"))
    val kernel = docs.select(col("doc_id"),
      TextKernels.shingle_hashes(col("text")).as("sh"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
  }

  test("simhash_64 == explode+groupBy majority-vote formulation") {
    val toks = docs.select(col("doc_id"),
      explode(graft.fts.Fts.tokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L))).as(s"c$i"))
    val hof = toks.groupBy(col("doc_id"))
      .agg(votes.head, (votes.tail :+ count(lit(1)).as("n")): _*)
      .select(col("doc_id"), (0 until 64).map { i =>
        when(col(s"c$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_)).as("simhash"))
    val kernel = docs.select(col("doc_id"),
      TextKernels.simhash_64(col("text")).as("simhash"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
  }

  test("cosine_sim == HOF dot/norm formulation on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.limit(30).select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.limit(30).select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b"))
    val hof = pairs.select(col("a"), col("b"),
      graft.llm.Similarity.cosine(col("va"), col("vb")).as("cos"))
    val kernel = pairs.select(col("a"), col("b"),
      graft.functions.VectorKernels.cosine_sim(col("va"), col("vb")).as("cos"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
  }

  test("cosine_sim keeps double inputs double (no float downcast)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pairs = emb.limit(20).select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.limit(20).select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b"))
    // HOF formulation on the double arrays is the spec; the kernel must
    // match it bit-for-bit, which a float downcast would break (~7
    // significant digits).
    val hof = pairs.select(col("a"), col("b"),
      graft.llm.Similarity.cosine(col("va"), col("vb")).as("cos"))
    val kernel = pairs.select(col("a"), col("b"),
      graft.functions.VectorKernels.cosine_sim(col("va"), col("vb")).as("cos"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
    // and perturbations below float precision must change the score
    val bumped = pairs.limit(1).select(
      graft.functions.VectorKernels.cosine_sim(
        transform(col("va"), x => x + lit(1e-12)), col("vb")).as("c1"),
      graft.functions.VectorKernels.cosine_sim(col("va"), col("vb")).as("c0"))
      .head()
    assert(bumped.getDouble(0) != bumped.getDouble(1),
      "sub-float-precision perturbation was lost — inputs were downcast")
  }

  test("cosine_sim returns null on length mismatch (HOF semantics)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val out = df.select(graft.functions.VectorKernels.cosine_sim(col("a"), col("b"))).head()
    assert(out.isNullAt(0))
  }

  test("lsh_bucket kernel == HOF lshBucket formulation (float and double)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val hof = emb.select(col("vec_id"),
      graft.llm.Similarity.lshBucket(col("embedding"), dims = 64, planes = 8).as("b"))
    val kernel = emb.select(col("vec_id"),
      graft.functions.VectorKernels.lsh_bucket(col("embedding"), planes = 8).as("b"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
    val dbl = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val hofD = dbl.select(col("vec_id"),
      graft.llm.Similarity.lshBucket(col("embedding"), dims = 64, planes = 8).as("b"))
    val kernelD = dbl.select(col("vec_id"),
      graft.functions.VectorKernels.lsh_bucket(col("embedding"), planes = 8).as("b"))
    assert(kernelD.exceptAll(hofD).isEmpty && hofD.exceptAll(kernelD).isEmpty)
  }

  test("lsh_bucket honors a dims prefix; int/long arrays widen losslessly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // prefix bucketing == HOF over the sliced vector
    val hofPrefix = emb.select(col("vec_id"),
      graft.llm.Similarity.lshBucket(
        slice(col("embedding"), 1, 32), dims = 32, planes = 6).as("b"))
    val kernelPrefix = emb.select(col("vec_id"),
      graft.functions.VectorKernels.lsh_bucket(col("embedding"), planes = 6, dims = 32).as("b"))
    assert(kernelPrefix.exceptAll(hofPrefix).isEmpty && hofPrefix.exceptAll(kernelPrefix).isEmpty)
    // int arrays widen to double exactly — same cosine as the double cast
    val ints = Seq((1L, Array(3, -1, 4, 1), Array(2, 7, 1, 8))).toDF("id", "a", "b")
    val viaInt = ints.select(
      graft.functions.VectorKernels.cosine_sim(col("a"), col("b"))).head().getDouble(0)
    val viaDouble = ints.select(graft.functions.VectorKernels.cosine_sim(
      col("a").cast("array<double>"), col("b").cast("array<double>"))).head().getDouble(0)
    assert(viaInt == viaDouble)
  }

  test("scala-side HALF_UP rounding == Spark round() at boundaries") {
    // the primitive-loop verify paths (Similarity.round5, Dedup's broadcast
    // branch) claim to mirror Spark round()'s BigDecimal computation; check
    // on representation-boundary values where floor(x*1e4+0.5)/1e4 differs.
    val vals = Seq(0.12345, 0.123455, 0.5729250000000001, 0.06155, 2.675,
      0.286785, 0.0001, 0.99995, 0.444445, 1.0 / 3.0, 2.0 / 3.0, 0.57295) ++
      (1 to 500).map(i => i.toDouble / 7919.0)
    val df = vals.toDF("x")
    val viaSpark = df.select(round(col("x"), 4)).collect().map(_.getDouble(0))
    val viaMirror = vals.map(x => java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
    viaSpark.zip(viaMirror).zip(vals).foreach { case ((s, m), x) =>
      assert(s == m, s"round mismatch at $x: spark=$s mirror=$m")
    }
  }

  test("cosine_sim and lsh_bucket are callable from SQL") {
    graft.functions.VectorKernels.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      """SELECT vec_id, lsh_bucket(embedding, 8) AS b,
        |  round(cosine_sim(embedding, embedding), 9) AS self_cos
        |FROM emb_sql""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(2) == 1.0))
    val viaColumn = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorKernels.lsh_bucket(col("embedding"), planes = 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(viaColumn(r.getLong(0)) == r.getLong(1)))
  }

  test("nfc_normalize: SQL == Column == JDK normalizer; ASCII passes through untouched") {
    graft.functions.NfcNormalize.register(spark)
    val rows = Seq((1L, "café mixed"), (2L, "plain ascii"), (3L, "é composed"))
      .toDF("id", "t")
    rows.createOrReplaceTempView("nfc_sql")
    val viaSql = spark.sql("SELECT id, nfc_normalize(t) AS n FROM nfc_sql")
      .as[(Long, String)].collect().toMap
    val viaCol = rows.select(col("id"),
      graft.functions.NfcNormalize.nfc_normalize(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    val viaJdk = rows.as[(Long, String)].collect().map { case (i, t) =>
      i -> java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC) }.toMap
    assert(viaSql == viaJdk && viaCol == viaJdk)
    assert(viaJdk(1L).startsWith("café"), "composition did not happen")
  }

  test("minhash_band_hashes == affine-min + xxhash64-chain formulation") {
    val bands = 4
    val rpb = 2
    val p = TextKernels.P
    val sh = docs.limit(50).select(col("doc_id"),
      TextKernels.shingle_hashes(col("text")).as("sh"))
    val exploded = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("h", pmod(col("s"), lit(p)))
    val sigs = exploded.groupBy(col("doc_id"))
      .agg(
        min(pmod(col("h") * TextKernels.hashA(0) + TextKernels.hashB(0), lit(p))).as("m0"),
        (1 until bands * rpb).map(i =>
          min(pmod(col("h") * TextKernels.hashA(i) + TextKernels.hashB(i), lit(p))).as(s"m$i")): _*)
    val hof = sigs.select(col("doc_id"), array(
      (0 until bands).map(bi => xxhash64(
        (bi * rpb until (bi + 1) * rpb).map(i => col(s"m$i")): _*)): _*).as("bh"))
    val kernel = sh.select(col("doc_id"),
      TextKernels.minhash_band_hashes(col("sh"), bands, rpb).as("bh"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
  }

  test("ngram_hashes: distinct count and cross-side collisions == string grams") {
    // the kernel chain-hashes token hashes instead of hashing gram STRINGS,
    // so per-gram hash VALUES differ from xxhash64(gram) by design — what
    // must match is gram IDENTITY: the distinct-gram count per doc and the
    // doc⋈eval collision sets the contam family computes.
    val n = 8
    def strGrams(df: org.apache.spark.sql.DataFrame) = {
      val toks = graft.fts.Fts.tokens(col("text"))
      df.select(col("doc_id"),
        when(size(toks) >= n,
          array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n))))))
          .otherwise(array().cast("array<string>")).as("g"))
    }
    val hof = strGrams(docs).select(col("doc_id"), size(col("g")).as("k"))
    val ker = docs.select(col("doc_id"),
      size(TextKernels.ngram_hashes(col("text"), n)).as("k"))
    assert(ker.exceptAll(hof).isEmpty && hof.exceptAll(ker).isEmpty)
    // collision identity across two frames (source docs vs planted copies)
    val a = docs.filter(col("doc_id") < 10000)
    val b = docs.filter(col("doc_id") >= 10000)
    val hofHits = strGrams(a).select(col("doc_id"), explode(col("g")).as("g"))
      .join(strGrams(b).select(explode(col("g")).as("g")).distinct(), Seq("g"), "left_semi")
      .groupBy("doc_id").count()
    val kerHits = a.select(col("doc_id"),
        explode(TextKernels.ngram_hashes(col("text"), n)).as("g"))
      .join(b.select(explode(TextKernels.ngram_hashes(col("text"), n)).as("g")).distinct(),
        Seq("g"), "left_semi")
      .groupBy("doc_id").count()
    assert(kerHits.exceptAll(hofHits).isEmpty && hofHits.exceptAll(kerHits).isEmpty)
  }

  test("trigram_hashes == xxhash64 over the HOF 3-char windows") {
    // trigram identities hash THROUGH xxhash64 of the substring on both
    // sides, so here values (not just counts) must match exactly
    val hof = docs.filter(length(col("text")) >= 3).select(col("doc_id"),
      array_sort(array_distinct(transform(
        sequence(lit(1), length(col("text")) - 2),
        i => xxhash64(col("text").substr(i, lit(3)))))).as("g"))
    val ker = docs.filter(length(col("text")) >= 3).select(col("doc_id"),
      TextKernels.trigram_hashes(col("text")).as("g"))
    assert(ker.exceptAll(hof).isEmpty && hof.exceptAll(ker).isEmpty)
  }

  test("bpe_apply_merge and bpe_encode_word == the aggregate-fold spec") {
    val words = docs.limit(80)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
    val merges = Seq(("e", "</w>"), ("t", "h"), ("th", "e</w>"), ("a", "n"))
    // single-merge kernel vs the fold, over real symbol arrays
    val init = concat(transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1))), array(lit(graft.llm.Bpe.EndOfWord)))
    val foldOne = words.select(col("doc_id"), col("word"),
      graft.llm.Bpe.applyMerge(init, "e", "</w>").as("sym"))
    val kerOne = words.select(col("doc_id"), col("word"),
      TextKernels.bpe_apply_merge(init, "e", "</w>").as("sym"))
    assert(kerOne.exceptAll(foldOne).isEmpty && foldOne.exceptAll(kerOne).isEmpty)
    // full-chain kernel vs the chained folds
    val foldChain = words.select(col("doc_id"), col("word"),
      merges.foldLeft(init) { case (acc, (x, y)) =>
        graft.llm.Bpe.applyMerge(acc, x, y) }.as("sym"))
    val kerChain = words.select(col("doc_id"), col("word"),
      TextKernels.bpe_encode_word(col("word"), merges,
        graft.llm.Bpe.EndOfWord).as("sym"))
    assert(kerChain.exceptAll(foldChain).isEmpty && foldChain.exceptAll(kerChain).isEmpty)
  }
}
