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
}
