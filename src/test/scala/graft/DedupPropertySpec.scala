package graft

import org.scalacheck.Gen
import graft.llm.Dedup

/** SURVEY §5 property strategy for the content-dedup operators: the
  * distributed plans must equal straightforward in-memory reference
  * implementations on randomized corpora (small vocabularies force
  * frequent collisions — within-doc repeats, cross-doc spans, shared
  * lines all occur by construction). */
class DedupPropertySpec extends SparkSpec with PropertySampling {
  import spark.implicits._


  // ---- stripDuplicateSpans ≡ brute force ----

  private val vocab = Seq("a", "b", "c", "d", "e", "f")
  private val corpusGen: Gen[List[String]] = Gen.listOfN(12,
    Gen.choose(5, 15).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))

  private def refStrip(docs: Seq[(Long, String)], w: Int): Map[Long, String] = {
    def windows(toks: Array[String]) =
      (0 to toks.length - w).map(p => toks.slice(p, p + w).mkString(" "))
    val counts = docs.flatMap { case (_, t) => windows(t.split(" ", -1)) }
      .groupBy(identity).view.mapValues(_.size).toMap
    docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val starts = (0 to toks.length - w).filter(p =>
        counts(toks.slice(p, p + w).mkString(" ")) >= 2)
      id -> toks.zipWithIndex.collect {
        case (tk, p) if !starts.exists(s => s <= p && p < s + w) => tk
      }.mkString(" ")
    }.toMap
  }

  test("stripDuplicateSpans ≡ brute-force reference on random corpora (both key modes)") {
    (1 to 6).foreach { seed =>
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val w = sample(Gen.choose(2, 4), seed + 50)
      val expected = refStrip(docs, w)
      val got = Dedup.stripDuplicateSpans(docs.toDF("doc_id", "text"),
          "text", "doc_id", w)
        .as[(Long, String)].collect().toMap
      assert(got == expected, s"seed=$seed width=$w")
      // the 100-TB shuffle-key variant (xxhash64 window keys) must agree
      val hashed = Dedup.stripDuplicateSpans(docs.toDF("doc_id", "text"),
          "text", "doc_id", w, hashKeys = true)
        .as[(Long, String)].collect().toMap
      assert(hashed == expected, s"hashKeys seed=$seed width=$w")
    }
  }

  // ---- lineDedup ≡ brute force ----

  private val lineGen: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf("shared one", "shared two", "shared three"),
    2 -> Gen.listOfN(3, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val lineCorpusGen: Gen[List[String]] = Gen.listOfN(10,
    Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, lineGen).map(_.mkString("\n"))))

  private def refLineDedup(docs: Seq[(Long, String)], minDocs: Int): Map[Long, String] = {
    val bad = docs.flatMap { case (id, t) => t.split("\n", -1).map(l => (id, l)) }
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.size)
      .filter(_._2 >= minDocs).keySet
    docs.map { case (id, t) =>
      id -> t.split("\n", -1).filterNot(bad.contains).mkString("\n")
    }.toMap
  }

  test("lineDedup ≡ brute-force reference on random corpora") {
    (1 to 6).foreach { seed =>
      val texts = sample(lineCorpusGen, seed + 1000)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val minDocs = sample(Gen.choose(2, 4), seed + 1050)
      val got = Dedup.lineDedup(docs.toDF("doc_id", "text"),
          "text", "doc_id", minDocs)
        .as[(Long, String)].collect().toMap
      assert(got == refLineDedup(docs, minDocs), s"seed=$seed minDocs=$minDocs")
    }
  }
}
