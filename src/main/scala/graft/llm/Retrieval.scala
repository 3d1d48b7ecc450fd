package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval — the RAG front door over the same
  * corpus the cleaning pipeline produces (growth beyond the reference,
  * whose search surface is boolean FTS only, server.py:1124-1128).
  *
  * Shape: each retrieval leg (BM25, ANN cosine, anything that emits a
  * ranked top-k list) runs independently in its own scan-optimal plan;
  * fusion then operates on k-row frames — O(k·legs) rows, never
  * corpus-scale. At 100 TB the legs dominate (BM25 = two column-pruned
  * scans, ANN = one broadcast-query scan or an IVF probe), and the fusion
  * itself is free: a union of tiny frames and one k-row aggregate.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fused(id) = Σ over legs of 1/(rrfK + rank), for the legs that ranked
    * the id at all. Evaluated as `scale div (rrfK + rank)` — EXACT integer
    * arithmetic (the bm25/surprisal discipline) so scores hash-check
    * bit-for-bit against an oracle and never depend on float summation
    * order. rrfK = 60 is the paper's constant; scale = 10^6 keeps ~5
    * significant digits after the integer floor.
    *
    * Each leg must be a (idCol, rank) frame with 1-based ranks and at most
    * one row per id — the top-k contract of [[graft.fts.Fts.bm25]] /
    * [[Similarity.bruteForceTopK]]-style producers. Legs are k-row frames
    * BY CONTRACT, so the union + aggregate here moves O(k·legs) rows; ties
    * in the fused score break by ascending id (total order, stable LIMIT).
    */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, k: Int,
              rrfK: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(k > 0, s"k must be positive: $k")
    require(rrfK >= 0, s"rrfK must be non-negative: $rrfK")
    require(scale > 0, s"scale must be positive: $scale")
    legs.map(_.select(col(idCol), col("rank")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(expr(s"$scale div ($rrfK + rank)")).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }

  /** (id, score) → (id, rank) with rank 1-based by (score desc, id asc).
    * The input is a top-k candidate list BY CONTRACT (that is what makes
    * it a leg), so the unpartitioned row_number ranks ≤k rows in one tiny
    * task — it is NOT for corpus-scale frames. */
  def rankLeg(leg: DataFrame, idCol: String, scoreCol: String): DataFrame =
    leg.withColumn("rank", row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol).asc)))
      .select(col(idCol), col("rank"))

  /** BM25 + brute-force-cosine hybrid: the lexical leg ranks `docs` by
    * `textQuery` (exact-integer BM25), the vector leg ranks `embs` by
    * cosine against the embedding of `queryVecId` (round-before-rank, self
    * excluded), both at depth `kEach`; RRF fuses to the final `k`.
    * Returns (idCol, rrf). The id space must be shared between `docs` and
    * `embs` (doc_id ↔ vec_id here) — that join-by-rank is the point of
    * hybrid retrieval. */
  def hybridTopK(docs: DataFrame, embs: DataFrame, textQuery: String,
                 queryVecId: Long, k: Int, kEach: Int,
                 docIdCol: String = "doc_id", textCol: String = "text",
                 vecIdCol: String = "vec_id", vecCol: String = "embedding",
                 rrfK: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(kEach >= k, s"leg depth kEach=$kEach must be >= fused k=$k")
    val lex = rankLeg(
      graft.fts.Fts.bm25(docs, docIdCol, textCol, textQuery, kEach),
      docIdCol, "score")
    val vec = Similarity.bruteForceTopK(
        embs, embs.filter(col(vecIdCol) === queryVecId), kEach,
        vecIdCol, vecCol)
      .select(col("nid").as(docIdCol), col("rn").as("rank"))
    rrfFuse(Seq(lex, vec), docIdCol, k, rrfK, scale)
  }

  /** Pseudo-relevance feedback (Rocchio/RM3 shape, exact-integer): run
    * BM25, mine the top `kSeed` documents for their `mExp` most frequent
    * non-query terms (≥ 3 word chars; ties by term ascending —
    * deterministic), and re-run BM25 with the expanded term set. The
    * classic vocabulary-mismatch fix ("dedup" seeds pull in "near",
    * "duplicate"…), kept hash-checkable: expansion selection is integer
    * counting and the second pass is the same integer BM25.
    *
    * Cost: the seed pass (two column-pruned scans), one semi-join +
    * explode over the kSeed seed docs ONLY (a k-row frame — the mining
    * never touches the corpus), a ≤ mExp driver collect, and the final
    * pass (two more scans). Four corpus scans total, zero wide shuffles —
    * the PRF standard shape. */
  def prfTopK(docs: DataFrame, idCol: String, textCol: String, query: String,
              k: Int, kSeed: Int = 10, mExp: Int = 5): DataFrame = {
    require(kSeed >= 1 && mExp >= 0, s"bad kSeed=$kSeed / mExp=$mExp")
    val qTerms = graft.fts.Fts.bm25Terms(query)
    val seeds = graft.fts.Fts.bm25(docs, idCol, textCol, query, kSeed)
      .select(col(idCol))
    val expTerms = docs.join(broadcast(seeds), Seq(idCol), "left_semi")
      .select(explode(graft.fts.Fts.tokens(col(textCol))).as("term"))
      .filter(col("term").rlike("^[a-z0-9_]{3,}$") &&
        !col("term").isin(qTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(mExp).collect().map(_.getString(0)).toSeq
    graft.fts.Fts.bm25(docs, idCol, textCol,
      (qTerms ++ expTerms).mkString(" "), k)
  }
}
