package graft

import org.apache.spark.sql.functions._
import graft.doc.DocStore

/** S9/S10 round-trip + doc-path semantics on the reference's own document
  * fixture (FIXTURES.md §A3 / example.py:308-344). */
class DocStoreSpec extends SparkSpec {
  import spark.implicits._

  private val samJson =
    """{"name": "Sam Squire", "age": 32, "hobbies": [{"name": "God"}, {"name": "databases"}, {"name": "computers"}]}"""

  private lazy val people = DocStore.fromJson(spark,
    Seq((1L, samJson)).toDF("doc_id", "json"))

  test("shred infers the nested schema") {
    val doc = people.schema("doc").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(doc.fieldNames.toSet == Set("name", "age", "hobbies"))
  }

  test("hydrate round-trips the document (example.py:317-320)") {
    val json = DocStore.hydrate(people).select("json").as[String].head()
    val reparsed = DocStore.fromJson(spark, Seq((1L, json)).toDF("doc_id", "json"))
    assert(reparsed.select(col("doc.name"), col("doc.age")).as[(String, Long)].head()
      == (("Sam Squire", 32L)))
    assert(reparsed.select(size(col("doc.hobbies"))).as[Int].head() == 3)
  }

  test("doc-path projection: people.~hobbies[]~name (example.py:335-344)") {
    val got = DocStore.selectPath(people, "doc", "~hobbies[]~name", "hobby")
      .select("hobby").as[String].collect().toSeq
    assert(got == Seq("God", "databases", "computers"))
  }

  test("multi-path: same array aligns positionally, different arrays cross") {
    val json =
      """{"orders": [{"k": 1, "p": 10.0}, {"k": 2, "p": 20.0}],
        | "tags": [{"t": "a"}, {"t": "b"}]}""".stripMargin
    val docs = DocStore.fromJson(spark, Seq((1L, json)).toDF("doc_id", "json"))
    // same array: one explode shared — 2 rows, each order's k WITH its p
    val aligned = DocStore.selectPaths(docs, "doc",
      Seq("~orders[]~k" -> "k", "~orders[]~p" -> "p"))
      .select("k", "p").as[(Long, Double)].collect().toSet
    assert(aligned == Set((1L, 10.0), (2L, 20.0)))
    // different arrays: explodes compose — 2×2 cross product
    val crossed = DocStore.selectPaths(docs, "doc",
      Seq("~orders[]~k" -> "k", "~tags[]~t" -> "t"))
      .select("k", "t").as[(Long, String)].collect().toSet
    assert(crossed == Set((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")))
  }

  test("doc-path filter: where people.~hobbies[]~name = 'God' (example.py:324-333)") {
    assert(people.filter(
      DocStore.pathMatches(col("doc"), "~hobbies[]~name", _ === "God")).count() == 1)
    assert(people.filter(
      DocStore.pathMatches(col("doc"), "~hobbies[]~name", _ === "absent")).count() == 0)
  }

  test("indexed paths: element_at semantics, out-of-range NULL, no explode") {
    // [1] = second hobby; one row per doc (no explode)
    val second = DocStore.selectPath(people, "doc", "~hobbies[1]~name", "h")
    assert(second.count() == 1 &&
      second.select("h").as[String].head() == "databases")
    assert(!second.queryExecution.executedPlan.toString.contains("Generate"),
      "indexed path exploded")
    // past the end → NULL, row kept
    val oob = DocStore.selectPath(people, "doc", "~hobbies[9]~name", "h")
    assert(oob.count() == 1 && oob.select("h").head().isNullAt(0))
    // indexed pathMatches: scalar predicate, NULL past the end drops
    assert(people.filter(DocStore.pathMatches(col("doc"),
      "~hobbies[0]~name", _ === "God")).count() == 1)
    assert(people.filter(DocStore.pathMatches(col("doc"),
      "~hobbies[9]~name", _ === "God")).count() == 0)
    // malformed index rejected
    intercept[IllegalArgumentException](
      DocStore.selectPath(people, "doc", "~hobbies[x]~name", "h").collect())
  }
}
