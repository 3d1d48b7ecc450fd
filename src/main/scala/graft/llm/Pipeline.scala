package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pass (SURVEY §2.12 composition): the
  * individual operators — quality scoring, language ID, near-dup detection,
  * cluster representatives — wired the way a pretraining pipeline actually
  * runs them.
  *
  * Order matters for cost: the scan-side filters (quality, langid — pure
  * codegen'd column expressions) run FIRST so the shuffling stages (minhash
  * banding, clustering) only see surviving documents. At 100 TB the filter
  * pass is scan-bound and typically drops a large fraction of the corpus
  * before anything is shuffled.
  */
object Pipeline {

  /** @return the rows of `df` that survive: quality ≥ minQuality, language
    *         == lang, and are their near-dup cluster's representative
    *         (minimum id) — i.e. the kept corpus. */
  def cleanCorpus(df: DataFrame, textCol: String, idCol: String,
                  minQuality: Double, lang: String,
                  jaccardThreshold: Double): DataFrame = {
    val kept = df.filter(
      TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.langId(col(textCol)) === lang)
    // kept re-derives two cheap codegen predicates on the second read —
    // not worth a cache (contrast cleanCorpusFull, whose scrub pass is)
    Dedup.keepRepresentatives(kept, textCol, idCol, jaccardThreshold)
  }

  /** The FULL composed cleaning pass — every scan-side filter this engine
    * ships, wired in the order a pretraining pipeline runs them: quality,
    * language, and repetition gates first (pure column predicates, scan
    * rate, nothing shuffled for dropped docs), then PII scrubbing, then
    * near-dup clustering over the SCRUBBED text — scrubbing first means
    * documents differing only in volatile contact details still collapse
    * to one representative.
    *
    * RETURN SCHEMA IS (idCol, textCol) ONLY — the scrub pass rewrites the
    * text column, so other input columns (lang, url, score, …) are NOT
    * carried through (unlike [[cleanCorpus]]/keepRepresentatives, which
    * preserve the input schema). Join the kept ids back to the source
    * frame to recover metadata columns. Same contract as
    * [[Dedup.lineDedup]] and [[Dedup.stripDuplicateSpans]], whose
    * rebuilds also return (idCol, textCol).
    *
    * [[cleanCorpus]] stays as the minimal quality+langid+dedup pass (and
    * the streaming twin's batch shape); this is the superset. */
  def cleanCorpusFull(df: DataFrame, textCol: String, idCol: String,
                      minQuality: Double, lang: String,
                      maxDupTokenFrac: Double,
                      jaccardThreshold: Double): DataFrame = {
    val kept = df.filter(
      TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.langId(col(textCol)) === lang &&
        TextAnalysis.dupTokenFrac(col(textCol)) <= maxDupTokenFrac)
    // cache the scrubbed frame: it feeds both the dedup pass and the final
    // anti-join, and re-deriving it would re-run the three gate predicates
    // PLUS the triple-regexp scrub over the whole corpus. Materialize the
    // (small) result eagerly, then release — same lifetime discipline as
    // Dedup's pair outputs. Returned frame is EAGER and CACHED;
    // `.unpersist()` it when done in a long-lived session.
    val scrubbed = kept.select(col(idCol),
      TextAnalysis.scrubPii(col(textCol)).as(textCol)).cache()
    val result =
      Dedup.keepRepresentatives(scrubbed, textCol, idCol, jaccardThreshold)
        .cache()
    result.count()
    scrubbed.unpersist()
    result
  }

  /** Benchmark decontamination: drop every corpus document that
    * near-duplicates a benchmark document (jaccard ≥ threshold over
    * 3-gram shingles) — the pass a training pipeline runs against its
    * eval suites before the corpus ships. Exact-dup removal falls out
    * (jaccard 1). The benchmark is typically tiny next to the corpus;
    * the work is one banded equi-join + candidate verification
    * ([[Dedup.crossNearDup]]), then an anti-join on the contaminated ids. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String,
                    jaccardThreshold: Double): DataFrame = {
    val pairs = Dedup.crossNearDup(corpus, benchmark, textCol, idCol, jaccardThreshold)
    // pin the (tiny) contaminated id set before releasing the pairs cache —
    // a lazy projection would re-derive the whole banding lineage later
    val contaminated = pairs.select(col("a").as(idCol)).distinct().localCheckpoint()
    pairs.unpersist()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Exact n-gram decontamination pass: drop every corpus document with
    * any word n-gram collision against the benchmark (the GPT-3 /
    * Llama 2 eval-overlap rule — see [[Dedup.ngramCollisions]] for the
    * broadcast-probe scale shape). The contaminated id set is benchmark-
    * bounded, so the final anti-join broadcasts it — the corpus is read
    * once and never shuffled. */
  def decontaminateNgram(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String,
                         n: Int = 13): DataFrame =
    decontaminateFromHits(corpus,
      Dedup.ngramCollisions(corpus, benchmark, textCol, idCol, n), idCol)

  /** [[decontaminateNgram]]'s anti-join half over an already-computed
    * collision frame — the share point for pipelines that also report
    * (see [[reportAndDecontaminate]]). */
  def decontaminateFromHits(corpus: DataFrame, hits: DataFrame,
                            idCol: String): DataFrame =
    corpus.join(broadcast(hits.select(col(idCol))), Seq(idCol), "left_anti")

  /** One-row contamination REPORT (round-7 growth — the number a data
    * card quotes and a release gate checks): corpus size, count of docs
    * colliding with the benchmark on any n-gram, and the integer
    * per-mille rate — exact integer division, so the report hashes
    * identically across engines. Same scan shape as
    * [[decontaminateNgram]]: eval grams dedup + broadcast, the corpus
    * is probed scan-side and never shuffled. */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          textCol: String, idCol: String,
                          n: Int = 13): DataFrame =
    reportFromHits(corpus,
      Dedup.ngramCollisions(corpus, benchmark, textCol, idCol, n))

  /** [[contaminationReport]]'s aggregation half over an already-computed
    * collision frame. */
  def reportFromHits(corpus: DataFrame, hits: DataFrame): DataFrame =
    corpus.agg(count(lit(1)).as("n_docs"))
      .crossJoin(hits.agg(count(lit(1)).as("n_contaminated")))
      // an empty corpus reports 0‰ rather than NULL (Spark's div-by-zero)
      // — a release gate comparing the rate must never see a silent NULL
      .select(col("n_docs"), col("n_contaminated"),
        when(col("n_docs") > 0,
          expr("(1000 * n_contaminated) div n_docs"))
          .otherwise(lit(0L)).as("permille"))

  /** Report THEN decontaminate, paying the n-gram collision probe — the
    * most expensive scan family in the pipeline (the corpus is 8-gram'd
    * scan-side) — exactly ONCE: the contaminated id set (benchmark-
    * bounded, tiny) is pinned via localCheckpoint and feeds both halves.
    * Calling [[contaminationReport]] + [[decontaminateNgram]] separately
    * runs the probe twice; this is the release-gate composition. */
  def reportAndDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                             textCol: String, idCol: String,
                             n: Int = 13): (DataFrame, DataFrame) = {
    val ids = Dedup.ngramCollisions(corpus, benchmark, textCol, idCol, n)
      .select(col(idCol)).localCheckpoint()
    (reportFromHits(corpus, ids), decontaminateFromHits(corpus, ids, idCol))
  }

  /** Streaming twin of [[cleanCorpus]]: the scan-side quality/langid
    * filters run on each micro-batch BEFORE any shuffling (same cost
    * ordering as the batch pass), then survivors flow through
    * [[graft.streaming.Streams.nearDupIngest]]'s store-backed near-dup
    * admission. Output = the continuously-growing cleaned corpus at
    * `outPath`. */
  def cleanCorpusStream(docs: DataFrame, textCol: String, idCol: String,
                        minQuality: Double, lang: String, jaccardThreshold: Double,
                        outPath: String, storePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val filtered = docs.filter(
      TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.langId(col(textCol)) === lang)
    graft.streaming.Streams.nearDupIngest(filtered, textCol, idCol,
      jaccardThreshold, outPath, storePath, checkpoint)
  }
}
