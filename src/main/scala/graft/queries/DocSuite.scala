package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.doc.DocStore

/** Document surface t2 coverage (SURVEY §2.1 S9/S10, §2.2 P2, §2.6 F3).
  * Nested docs are synthesized from orders-per-customer (the testdata has no
  * nested table), then addressed with the reference's `~path[]~leaf`
  * syntax; oracles are the equivalent flat joins — which is exactly the
  * point: doc addressing IS a join/explode under Spark.
  */
object DocSuite extends Suite {

  /** customer docs: {name, orders: [{o_orderkey, o_totalprice}]} */
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val byCust = Tables.t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(collect_list(struct(col("o_orderkey"), col("o_totalprice"))).as("orders"))
    Tables.t(s, d, "customer")
      .join(byCust, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey").as("cust_id"),
        struct(col("c_name").as("name"), col("orders")).as("doc"))
  }

  def defs: Map[String, Q] = Map(

    // P2: `select customer.~orders[]~o_orderkey from customer` — one row per
    // addressed array leaf.
    "doc_path_project" -> Q(
      (s, d) => DocStore.selectPath(docs(s, d), "doc", "~orders[]~o_orderkey", "o_orderkey"),
      Some("""SELECT c_custkey AS cust_id, o_orderkey
             |FROM customer JOIN orders ON o_custkey = c_custkey""".stripMargin)),

    // indexed addressing (growth beyond the reference's []-only syntax):
    // `~orders[0]~leaf` = the first element via scan-side element_at —
    // no explode, one output row per doc. The fixture array_sorts the
    // collected orders (struct order = by o_orderkey) because
    // collect_list order is nondeterministic; [0] is then the min-key
    // order, which the oracle states as min/arg_min.
    "doc_path_index" -> Q(
      (s, d) => {
        val sorted = docs(s, d).select(col("cust_id"),
          struct(col("doc.name").as("name"),
            array_sort(col("doc.orders")).as("orders")).as("doc"))
        DocStore.selectPaths(sorted, "doc", Seq(
          "~orders[0]~o_orderkey" -> "first_key",
          "~orders[0]~o_totalprice" -> "first_price"))
      },
      Some("""SELECT o_custkey AS cust_id, min(o_orderkey) AS first_key,
             |  arg_min(o_totalprice, o_orderkey) AS first_price
             |FROM orders GROUP BY 1""".stripMargin)),

    // doc-path predicate: docs where ANY order exceeds 300k — evaluated
    // scan-side via higher-order `exists`, no explode+shuffle.
    "doc_path_filter" -> Q(
      (s, d) => docs(s, d)
        .filter(DocStore.pathMatches(col("doc"), "~orders[]~o_totalprice", _ > 300000.0))
        .select("cust_id"),
      Some("""SELECT DISTINCT o_custkey AS cust_id FROM orders
             |WHERE o_totalprice > 300000""".stripMargin)),

    // scalar leaf projection through the struct (non-array path segment).
    "doc_scalar_leaf" -> Q(
      (s, d) => DocStore.selectPath(docs(s, d), "doc", "~name", "name"),
      Some("""SELECT c_custkey AS cust_id, c_name AS name
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // P1+P2 mixed: a plain field projected ALONGSIDE a doc path through the
    // HashQL dialect — the scalar repeats per exploded leaf (round-2 gap:
    // doc paths could only be projected alone).
    "hashql_doc_mixed" -> Q(
      (s, d) => {
        val cat = new graft.core.GraftCatalog(s)
        cat.register("customer_docs", docs(s, d))
        graft.sql.HashQL.execute(cat,
          "select customer_docs.cust_id, customer_docs.~orders[]~o_orderkey from customer_docs").get
      },
      Some("""SELECT c_custkey AS cust_id, o_orderkey
             |FROM customer JOIN orders ON o_custkey = c_custkey""".stripMargin)),

    // P2 MULTI-path projection: two leaves of the SAME array in one dialect
    // statement share one explode, so the emitted rows are positionally
    // aligned — each order's key sits next to that order's price (the
    // reference's flattened multi-path row dicts, README.md:134-145;
    // round-3 gap: one doc-path per select).
    "hashql_doc_multi" -> Q(
      (s, d) => {
        val cat = new graft.core.GraftCatalog(s)
        cat.register("customer_docs", docs(s, d))
        graft.sql.HashQL.execute(cat,
          "select customer_docs.cust_id, customer_docs.~orders[]~o_orderkey, " +
            "customer_docs.~orders[]~o_totalprice from customer_docs").get
      },
      Some("""SELECT c_custkey AS cust_id, o_orderkey, o_totalprice
             |FROM customer JOIN orders ON o_custkey = c_custkey""".stripMargin)),

    // S9 save-path shred through the oracle: raw JSON strings → inferred
    // nested rows (DocStore.fromJson) → leaf projected back out. DuckDB
    // recomputes the leaf from the raw string, so the whole shred/read
    // cycle is hash-checked (previously ScalaTest-only).
    "doc_shred_project" -> Q(
      (s, d) => {
        val raw = Tables.t(s, d, "events")
          .select(col("event_id").as("id"), col("props").as("json"))
        DocStore.fromJson(s, raw)
          .select(col("id").as("event_id"), col("doc.k").cast("long").as("k"))
      },
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
             |FROM events""".stripMargin)),

    // S10 read-path hydrate through the oracle: shredded rows back to JSON
    // strings (to_json's compact form, rebuilt character-exactly in SQL).
    "doc_hydrate" -> Q(
      (s, d) => {
        val raw = Tables.t(s, d, "events")
          .select(col("event_id").as("id"), col("props").as("json"))
        DocStore.hydrate(DocStore.fromJson(s, raw))
          .select(col("id").as("event_id"), col("json"))
      },
      Some("""SELECT event_id,
             |  '{"k":' || regexp_extract(props, '"k": ([0-9]+)', 1) || '}' AS json
             |FROM events""".stripMargin)),

    // F3: JSON leaf extraction from a raw JSON string column.
    "json_extract" -> Q(
      (s, d) => Tables.t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
             |FROM events""".stripMargin))
  )
}
