package graft

/** Golden end-to-end replay of the reference's own smoke script
  * (/root/reference/example.py, FIXTURES.md §A) through the unified
  * HashDb façade — the "a user of the reference could switch" test.
  * The reference prints these outputs without asserting; here they are
  * asserted.
  */
class ExampleSpec extends SparkSpec {
  import spark.implicits._

  test("KV scenario: puts + all query shapes (example.py:9-71)") {
    val db = new HashDb(spark)
    Seq(100, 101, 102, 103, 104, 105, 3500).foreach(n =>
      db.set("people-100", s"messages-$n", s"Message $n"))
    db.set("people-200", "messages-500", "Message 500")
    db.set("machines-10", "messages-3500", "Machine 101")
    db.set("people-100-2020-05-01", "friends-2019-05-01", "1, 2")
    db.set("people-100-2020-05-01", "friends-2020-06-01", "1, 2, 3")

    assert(db.get("people-100", "messages-100").contains("Message 100"))
    assert(db.kv.queryBegins("people-100", "messages").count() == 7)
    assert(db.kv.queryPkSkBegins("people", "messages", desc = true)
      .select("value").as[String].collect().head == "Message 500")
    assert(db.kv.queryBetween("people-100", "messages-101", "messages-105", desc = true)
      .select("sk").as[String].collect().toSeq ==
      Seq("messages-105", "messages-104", "messages-103", "messages-102", "messages-101"))
    assert(db.kv.bothBetween("people-100-2020-05", "people-100-2020-07",
      "friends-2019", "friends-2020-06-~~")
      .select("value").as[String].collect().toSeq == Seq("1, 2", "1, 2, 3"))
    db.clear("people-100", "messages-3500")
    assert(db.kv.queryBegins("people-100", "messages").count() == 6)
  }

  test("SQL scenario: insert/select/update + create join + 3-way join (example.py:73-238)") {
    val db = new HashDb(spark)
    db.sql("create join inner join people on people.id = items.people " +
      "inner join products on items.search = products.name " +
      "inner join reviews on items.search = reviews.product")
    Seq("Ted" -> 29, "Fred" -> 45, "Simon" -> 29, "Sam" -> 29).foreach { case (n, a) =>
      db.sql(s"insert into people (people_name, age) values ('$n', $a)") }
    val age29 = db.sql("select * from people where people.age = 29").get
    assert(age29.select("people_name").as[String].collect().toSet ==
      Set("Ted", "Simon", "Sam"))

    db.sql("update people set people.age = 31 where people.people_name = 'Sam'")
    val after = db.sql("select * from people where people.age = 29").get
    assert(after.select("people_name").as[String].collect().toSet == Set("Ted", "Simon"))

    Seq(("Cat", 3), ("Spanner", 3), ("Tree", 3), ("Spanner", 2)).foreach { case (s, p) =>
      db.sql(s"insert into items (search, people) values ('$s', $p)") }
    Seq(("Spanner", 300), ("Tree", 1000), ("Spanner", 450), ("Spanner", 600)).foreach {
      case (n, pr) => db.sql(s"insert into products (name, price) values ('$n', $pr)") }
    db.sql("insert into reviews (score, product) values ('5', 'Spanner')")

    val joined = db.sql("select products.price, people.people_name, items.search " +
      "from items inner join people on items.people = people.id " +
      "inner join products on items.search = products.name").get
      .as[(Long, String, String)].collect().toSet
    assert(joined == Set(
      (300L, "Simon", "Spanner"), (450L, "Simon", "Spanner"), (600L, "Simon", "Spanner"),
      (1000L, "Simon", "Tree"),
      (300L, "Fred", "Spanner"), (450L, "Fred", "Spanner"), (600L, "Fred", "Spanner")))

    // the registered CREATE JOIN expands to a consistent view, addressed
    // by its table set (or equivalently the canonical '+' name)
    assert(db.joinViewFor(Set("items", "people", "products", "reviews")).count() > 0)
    assert(db.joinView("items+people+products+reviews").count() > 0)
  }

  test("FTS scenario: '~' with OR + AND chain (example.py:284-306)") {
    val db = new HashDb(spark)
    Seq(("Cat", 3), ("Spanner", 3), ("Tree", 3), ("Spanner", 2)).foreach { case (s, p) =>
      db.sql(s"insert into items (search, people) values ('$s', $p)") }
    db.sql("insert into items (search, people) values ('blah sentence', 3)")
    val hits = db.sql("select items.search from items " +
      "where items.search ~ 'blah | nonsense | notthere' and items.people = 3").get
    assert(hits.as[String].collect().toSeq == Seq("blah sentence"))
  }

  test("Cypher scenario: MERGE corpus + conjunctive MATCH (example.py:241-281)") {
    val db = new HashDb(spark)
    db.cypher("merge (p:Person {'name': 'Samuel'})-[:FRIEND]->(o:Person {'name': 'Tasya'})")
    db.cypher("merge (p:Person {'name': 'Samuel'})-[:LIKES]->(o:Post {'name': 'Ideas'})")
    db.cypher("merge (p:Person {'name': 'Tasya'})-[:POSTED]->(o:Post {'name': 'Ideas'})")
    db.cypher("merge (p:Post {'name': 'Ideas'})-[:REFERS]->(o:Person {'name': 'Margaret'})")
    val out = db.cypher(
      "match (start:Person)-[:FRIEND]->(end:Person), (start)-[:LIKES]->(post:Post), " +
        "(end)-[:POSTED]->(post:Post), (post:Post)-[:REFERS]->(person:Person) " +
        "return start, end, post, person").get
    assert(out.as[(String, String, String, String)].collect().toSet ==
      Set(("Samuel", "Tasya", "Ideas", "Margaret")))
  }

  test("document scenario: save/get + doc-path SQL (example.py:308-344)") {
    val db = new HashDb(spark)
    db.saveDocument("people", 1,
      """{"name": "Sam Squire", "age": 32, "hobbies": [{"name": "God"}, {"name": "databases"}, {"name": "computers"}]}""")

    // S10 hydrate round-trip
    val json = db.getDocument("people", 1).get
    assert(json.contains("Sam Squire") && json.contains("databases"))

    // doc-path predicate through the SQL dialect
    val matched = db.sql("select * from people where people.~hobbies[]~name = 'God'").get
    assert(matched.count() == 1)
    assert(db.sql("select * from people where people.~hobbies[]~name = 'absent'").get.count() == 0)

    // doc-path projection through the SQL dialect
    val hobbies = db.sql("select people.~hobbies[]~name from people").get
    assert(hobbies.as[String].collect().toSeq == Seq("God", "databases", "computers"))

    // re-save replaces
    db.saveDocument("people", 1, """{"name": "Sam Squire", "age": 33, "hobbies": []}""")
    assert(db.getDocument("people", 1).get.contains("33"))
  }
}
