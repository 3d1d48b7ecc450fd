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

  test("mmrRerank ≡ driver-side greedy; λ=100 degenerates to top-k by rel") {
    import graft.llm.Similarity
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 4)

    // driver-side reference greedy over exact quantized scores
    def refMmr(lam: Long): Map[Long, Seq[Long]] = {
      val pool = Similarity.bruteForceTopK(emb, queries, 12)
        .select(col("qid"), col("nid"),
          round(col("cos") * 100000, 0).cast("long").as("rel"))
        .as[(Long, Long, Long)].collect()
      val vecs = emb.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toMap
      def cosQ(a: Long, b: Long): Long = {
        val (x, y) = (vecs(a), vecs(b))
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < x.length) {
          dot += x(i).toDouble * y(i).toDouble
          nx += x(i).toDouble * x(i).toDouble
          ny += y(i).toDouble * y(i).toDouble
          i += 1
        }
        // valueOf (toString-canonical), matching Spark's round() — the
        // exact-binary-expansion BigDecimal(double) can differ at .5 edges
        val c = BigDecimal(java.math.BigDecimal.valueOf(
            dot / (math.sqrt(nx) * math.sqrt(ny))))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP)
        (c * 100000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      pool.groupBy(_._1).map { case (qid, rows) =>
        var rem = rows.map(r => r._2 -> r._3).toMap
        var sel = Vector.empty[Long]
        val ms = scala.collection.mutable.HashMap.empty[Long, Long]
        while (sel.size < 5 && rem.nonEmpty) {
          val pick = rem.keys.minBy { n =>
            val sc = if (sel.isEmpty) rem(n)
              else lam * rem(n) - (100 - lam) * ms.getOrElse(n, 0L)
            (-sc, n)
          }
          sel :+= pick; rem -= pick
          rem.keys.foreach { n =>
            val s = cosQ(n, pick)
            if (!ms.contains(n) || s > ms(n)) ms(n) = s
          }
        }
        qid -> sel
      }
    }

    Seq(70L, 30L).foreach { lam =>
      val got = Similarity.mmrRerank(emb, queries, poolK = 12, k = 5,
          lambdaPct = lam.toInt)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) =>
          q -> rs.sortBy(_._3).map(_._2).toSeq }
      assert(got == refMmr(lam), s"λ=$lam")
    }

    // λ=100 ignores diversity: selection = first k of the relevance order
    val topk = Similarity.bruteForceTopK(emb, queries, 12)
      .filter(col("rn") <= 5)
      .select(col("qid"), col("nid"), col("rn").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val mmr100 = Similarity.mmrRerank(emb, queries, poolK = 12, k = 5,
        lambdaPct = 100)
      .as[(Long, Long, Long)].collect().toSet
    assert(mmr100 == topk)
  }
}
