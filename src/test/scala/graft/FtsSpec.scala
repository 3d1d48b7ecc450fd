package graft

import org.apache.spark.sql.functions._
import graft.fts.Fts
import graft.operators.AsOfJoin

class FtsSpec extends SparkSpec {
  import spark.implicits._

  test("parser precedence: & over |, parens, implicit AND") {
    assert(Fts.parse("a b") == Fts.And(Fts.Tok("a"), Fts.Tok("b")))
    assert(Fts.parse("a & b | c") ==
      Fts.Or(Fts.And(Fts.Tok("a"), Fts.Tok("b")), Fts.Tok("c")))
    assert(Fts.parse("a & (b | c)") ==
      Fts.And(Fts.Tok("a"), Fts.Or(Fts.Tok("b"), Fts.Tok("c"))))
  }

  test("tokenizer matches reference: lowercase, comma-strip, space-split") {
    val df = Seq("Hello, World FOO").toDF("t")
      .select(Fts.tokens(col("t")).as("toks"))
    assert(df.as[Seq[String]].head() == Seq("hello", "world", "foo"))
  }

  test("match semantics on example.py:296-306 style rows") {
    val df = Seq((1, "blah sentence"), (2, "other words")).toDF("id", "t")
      .withColumn("toks", Fts.tokens(col("t")))
    assert(df.filter(Fts.matches(col("toks"), "blah | nonsense | notthere"))
      .select("id").as[Int].collect().toSeq == Seq(1))
  }

  test("phrase queries: adjacency not bag-of-tokens; parser edges enforced") {
    assert(Fts.parse("\"a b\" | c") ==
      Fts.Or(Fts.Phrase(Seq("a", "b")), Fts.Tok("c")))
    // single-word phrase degrades to a plain token
    assert(Fts.parse("\"A\"") == Fts.Tok("a"))
    intercept[IllegalArgumentException](Fts.parse("\"a b"))
    intercept[IllegalArgumentException](Fts.parse("\"\""))
    val df = Seq(
      (1, "key agg row"),      // phrase hit
      (2, "agg key row"),      // both tokens, wrong order -> no hit
      (3, "key x agg"),        // both tokens, not adjacent -> no hit
      (4, "key"),              // shorter than the phrase
      (5, "row key agg"))      // phrase hit at the end
      .toDF("id", "t").withColumn("toks", Fts.tokens(col("t")))
    val hits = df.filter(Fts.matches(col("toks"), "\"key agg\""))
      .select("id").as[Int].collect().toSet
    assert(hits == Set(1, 5))
    // composition with booleans keeps phrase atoms intact
    val mixed = df.filter(Fts.matches(col("toks"), "\"key agg\" & row"))
      .select("id").as[Int].collect().toSet
    assert(mixed == Set(1, 5))
    // parens inside a phrase are literal word characters, not operators;
    // commas normalize away exactly as the document tokenizer strips them
    val parens = Seq((10, "big (data) rocks"), (11, "big data rocks"))
      .toDF("id", "t").withColumn("toks", Fts.tokens(col("t")))
    assert(parens.filter(Fts.matches(col("toks"), "\"big (data)\""))
      .select("id").as[Int].collect().toSeq == Seq(10))
    assert(df.filter(Fts.matches(col("toks"), "\"key, agg\""))
      .select("id").as[Int].collect().toSet == Set(1, 5))
  }

  test("as-of join picks latest right row at-or-before left time") {
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 90L, "r90"), (1L, 150L, "r150"), (2L, 60L, "r60"))
      .toDF("k", "rt", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "k", "t", "rt",
      Map("tag" -> "matched"))
      .select("ev", "matched").as[(String, String)].collect().toMap
    assert(got == Map("e1" -> "r90", "e2" -> "r150", "e3" -> null))
  }

  test("as-of join is inclusive at equal timestamps") {
    val left = Seq((1L, 100L, "e")).toDF("k", "t", "ev")
    val right = Seq((1L, 100L, "exact")).toDF("k", "rt", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "k", "t", "rt", Map("tag" -> "m"))
      .select("m").as[String].head()
    assert(got == "exact")
  }

  test("bm25: rare terms outrank common, tf saturates, non-matches drop") {
    // 4 docs: "zebra" appears in one (rare, idf = len(bin 4) − len(bin 1)
    // = 2), "cat" in ALL (df = N ⇒ idf 0 — the common-term floor)
    val docs = Seq(
      (1L, "zebra cat cat cat"),
      (2L, "cat cat cat cat"),
      (3L, "cat dog dog dog"),
      (4L, "cat dog dog dog")).toDF("id", "t")
    val r = Fts.bm25(docs, "id", "t", "zebra cat", k = 10)
      .as[(Long, Long)].collect().toMap
    // cat contributes 0 everywhere (idf 0), so only doc 1 scores
    assert(r.keySet == Set(1L))
    // doc 1's score is the zebra contribution alone:
    // idf = len(bin(4)) - len(bin(1)) = 2; A = 16/4 = 4, tf = 1, dl = 4
    // contribution = 2 * (44*4*1*100 div (20*4*1 + 6*4 + 18*4)) = 2*100
    assert(r(1L) == 200L)
    // tf monotone at fixed dl: duplicate the rare term, same doc length
    val docs2 = Seq((1L, "zebra zebra pad pad"), (2L, "zebra pad pad pad"),
      (3L, "pad pad pad pad"), (4L, "pad pad pad pad")).toDF("id", "t")
    val r2 = Fts.bm25(docs2, "id", "t", "zebra", k = 10)
      .as[(Long, Long)].collect().toMap
    assert(r2(1L) > r2(2L), s"tf=2 must outrank tf=1: $r2")
    // length normalization: same tf, longer doc scores lower
    val docs3 = Seq((1L, "zebra pad"), (2L, "zebra pad pad pad pad pad"),
      (3L, "pad pad"), (4L, "pad pad")).toDF("id", "t")
    val r3 = Fts.bm25(docs3, "id", "t", "zebra", k = 10)
      .as[(Long, Long)].collect().toMap
    assert(r3(1L) > r3(2L), s"shorter doc must outrank at equal tf: $r3")
  }

  test("bm25: top-k plans TakeOrderedAndProject, no global sort exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Fts.bm25(docs, "doc_id", "text", "dup merge", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("rangepartitioning"), plan.take(2000))
    // term validation: injection-shaped and empty queries are rejected
    intercept[IllegalArgumentException](Fts.bm25Terms("bad'term"))
    intercept[IllegalArgumentException](Fts.bm25Terms("  "))
  }

  test("trigram substring search == contains scan; verify kills gram-only false positives") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick beats slow"),
      (3L, "aba bab"), // all grams of "abab" without the substring
      (4L, "ababab"),
      (5L, "xy")       // too short to index
    ).toDF("doc_id", "text")
    val idx = Fts.trigramIndex(docs, "doc_id", "text")
    def search(p: String): Set[Long] =
      Fts.substringSearch(idx, docs, "doc_id", "text", p)
        .as[Long].collect().toSet
    def scan(p: String): Set[Long] =
      docs.filter(col("text").contains(p)).select("doc_id")
        .as[Long].collect().toSet
    for (p <- Seq("quick b", "abab", "he quick brown", "fox", "zzz"))
      assert(search(p) == scan(p), s"pattern '$p': ${search(p)} != ${scan(p)}")
    // doc 3 holds every trigram of "abab" (aba, bab) but NOT the pattern —
    // the candidate verify must reject it while keeping doc 4
    assert(search("abab") == Set(4L))
    // short patterns fall back to the full scan the index can't serve
    assert(search("xy") == Set(1L, 5L) || search("xy") == scan("xy"))
    assert(search("xy") == scan("xy"))
    // index rows are (distinct gram, id): repeats inside one doc don't
    // inflate the intersection count (grams are 8-byte hashes, round 16)
    val grams4 = idx.filter(col("id") === 4L).as[(Long, Long)].collect()
    assert(grams4.length == grams4.distinct.length)
  }
}
