package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.fts.Fts

/** Full-text-search t2 coverage (SURVEY §2.2 P4/P6, §2.1 S6, §2.6 F1) over
  * the documents table. The `~` predicate of the reference
  * (`select * from items where items.search ~ 'blah | nonsense'`,
  * /root/reference/example.py:296-306) becomes a compiled boolean Column
  * over an ingest-time tokens column — both sides of the oracle are
  * generated from the SAME parsed query tree (see [[Fts]]).
  */
object FtsSuite extends Suite {

  private val tokensOracle = Fts.tokensOracleSql("text")

  private def ftsQ(query: String): Q = Q(
    (s, d) => {
      val docs = Tables.t(s, d, "documents")
        .withColumn("tokens", Fts.tokens(col("text")))
      docs.filter(Fts.matches(col("tokens"), query)).select("doc_id", "source")
    },
    Some(s"""SELECT doc_id, source FROM documents
            |WHERE ${Fts.matchesOracleSql(tokensOracle, query)}""".stripMargin))

  def defs: Map[String, Q] = Map(
    // default-AND of adjacent tokens (reference client.py:700-707)
    "fts_and" -> ftsQ("spark join"),
    // explicit OR (reference server.py:1124-1128)
    "fts_or" -> ftsQ("window | stream"),
    // mixed precedence + parens (documented divergence: & binds tighter)
    "fts_expr" -> ftsQ("spark & (window | stream) & data"),
    // posting-list AND-fold with 3 terms (reference client.py:730-738)
    "fts_and3" -> ftsQ("fast & slow & big"),
    // PHRASE adjacency (growth beyond the reference's bag-of-tokens ~):
    // quoted atoms compile to one padded-substring contains over the
    // joined token sequence — still scan-side, no positional index —
    // composed with boolean operators
    "fts_phrase" -> ftsQ("\"key agg\" & (stream | \"row scan\")"),

    // BM25 ranking (growth — the reference returns unranked row sets):
    // exact-integer idf/saturation (see Fts.bm25 scaladoc) so the scores
    // hash-check bit-for-bit; "dup" is the planted rare term (idf > 0),
    // the common terms exercise the zero-idf path at this corpus size.
    // Top-k totals order by (score desc, id) — a deterministic LIMIT.
    "fts_bm25" -> Q(
      (s, d) => Fts.bm25(Tables.t(s, d, "documents"), "doc_id", "text",
        "dup merge stream", k = 15),
      Some(Fts.bm25OracleSql("documents", "doc_id", "text",
        "dup merge stream", k = 15))),

    // SUBSTRING search through the trigram posting index (growth — the
    // reference's FTS is whole-token only): candidates must hold ALL the
    // pattern's trigrams (posting intersection, reads |grams| lists, not
    // the corpus), then candidates alone verify with a real contains —
    // exactly the rows a full LIKE scan returns, which is the oracle.
    "fts_substring" -> Q(
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        Fts.substringSearch(Fts.trigramIndex(docs, "doc_id", "text"),
          docs, "doc_id", "text", "fast merge")
      },
      Some("SELECT doc_id FROM documents WHERE contains(text, 'fast merge')"))
  )
}
