package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Retrieval

/** RRF fusion invariants the hash-checked hybrid_rrf oracle can't express
  * on its own: hand-computed fused scores, single-leg contribution, and
  * the both-legs-beats-one ordering property. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def leg(rows: (Long, Int)*) =
    rows.toSeq.toDF("id", "rank")

  test("rrfFuse matches hand-computed integer fusion") {
    // leg1: a@1 b@2 c@3 ; leg2: b@1 d@2
    val fused = Retrieval.rrfFuse(
      Seq(leg(1L -> 1, 2L -> 2, 3L -> 3), leg(2L -> 1, 4L -> 2)),
      "id", k = 10).as[(Long, Long)].collect().toMap
    val s = 1000000L
    assert(fused(1L) == s / 61)          // rank 1, one leg
    assert(fused(2L) == s / 62 + s / 61) // ranked by both legs
    assert(fused(3L) == s / 63)
    assert(fused(4L) == s / 62)
  }

  test("an id ranked by both legs outranks the same ranks in one leg") {
    val fused = Retrieval.rrfFuse(
      Seq(leg(1L -> 1, 2L -> 2), leg(2L -> 2, 3L -> 1)),
      "id", k = 10).as[(Long, Long)].collect()
    // id 2 holds rank 2 in BOTH legs; ids 1 and 3 hold rank 1 in one leg
    // each — consensus wins: 2·(s div 62) > s div 61
    assert(fused.head._1 == 2L, fused.mkString(","))
  }

  test("fused-score ties break by ascending id and k truncates") {
    val fused = Retrieval.rrfFuse(
      Seq(leg(9L -> 1, 5L -> 1, 7L -> 1)), "id", k = 2)
      .as[(Long, Long)].collect()
    assert(fused.map(_._1).toSeq == Seq(5L, 7L))
    assert(fused.map(_._2).distinct.length == 1)
  }

  test("hybridTopK surfaces both lexical-only and vector-only candidates") {
    val docs = Tables.t(spark, sf, "documents")
    val emb = Tables.t(spark, sf, "embeddings")
    val lexIds = Retrieval.rankLeg(
        graft.fts.Fts.bm25(docs, "doc_id", "text", "dup merge stream", 20),
        "doc_id", "score")
      .as[(Long, Int)].collect().map(_._1).toSet
    val vecIds = graft.llm.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 7L), 20)
      .select("nid").as[Long].collect().toSet
    val fused = Retrieval.hybridTopK(docs, emb, "dup merge stream", 7L,
        k = 10, kEach = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(fused.subsetOf(lexIds ++ vecIds))
    // the fixture legs overlap at most partially: the fused top-10 draws
    // from both (an empty intersection with either side would mean one
    // modality was ignored)
    assert(fused.intersect(lexIds).nonEmpty)
    assert(fused.intersect(vecIds).nonEmpty)
  }
}
