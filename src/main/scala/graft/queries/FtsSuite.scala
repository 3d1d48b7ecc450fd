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

    // pseudo-relevance feedback (Rocchio/RM3 shape): seed BM25, mine the
    // seeds' top non-query terms, re-rank with the expanded set — all in
    // the exact-integer BM25 arithmetic. The oracle mines expansion terms
    // in SQL and scores the second pass in the JOIN formulation (terms
    // are data-dependent, so they can't inline) — same integers, so the
    // final ranking hash-checks.
    "fts_prf" -> Q(
      (s, d) => graft.llm.Retrieval.prfTopK(
        Tables.t(s, d, "documents"), "doc_id", "text", "dup merge",
        k = 10, kSeed = 8, mExp = 3),
      Some(prfOracleSql("documents", "doc_id", "text", "dup merge",
        k = 10, kSeed = 8, mExp = 3))),

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

  /** DuckDB twin of [[graft.llm.Retrieval.prfTopK]]: the seed pass is the
    * inlined-term bm25 oracle as a subquery; expansion terms mine in SQL
    * (count desc, term asc, ≤ mExp); the second pass scores in the JOIN
    * formulation — per-(doc, term) tf against a terms TABLE, df from
    * tf > 0 — with bm25's exact integer formula, so rankings match the
    * engine's inlined-literal second pass bit for bit. */
  private def prfOracleSql(src: String, idExpr: String, textExpr: String,
                           query: String, k: Int, kSeed: Int, mExp: Int,
                           scale: Long = 100L): String = {
    val qTerms = Fts.bm25Terms(query)
    val toks = Fts.tokensOracleSql(textExpr)
    val qList = qTerms.map(t => s"'$t'").mkString(", ")
    val a = "(s.sdl // s.n)"
    s"""WITH d AS (SELECT $idExpr AS _id, $toks AS toks,
       |    CAST(len($toks) AS BIGINT) AS dl FROM $src),
       |seed AS (SELECT $idExpr AS _id FROM (
       |  ${Fts.bm25OracleSql(src, idExpr, textExpr, query, kSeed, scale)})),
       |mined AS (SELECT term, count(*) AS cnt FROM (
       |    SELECT unnest(d.toks) AS term FROM d JOIN seed USING (_id))
       |  WHERE regexp_matches(term, '^[a-z0-9_]{3,}$$')
       |    AND term NOT IN ($qList)
       |  GROUP BY term),
       |exp AS (SELECT term FROM (
       |    SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS rn
       |    FROM mined) WHERE rn <= $mExp),
       |terms AS (SELECT unnest([$qList]) AS term UNION SELECT term FROM exp),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(dl) AS BIGINT) AS sdl FROM d),
       |tf AS (SELECT d._id, d.dl, t.term,
       |        CAST(len(list_filter(d.toks, x -> x = t.term)) AS BIGINT) AS tf
       |      FROM d CROSS JOIN terms t),
       |dfx AS (SELECT term,
       |        CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dft
       |      FROM tf GROUP BY term),
       |sc AS (SELECT tf._id,
       |        CAST(sum(CASE WHEN tf.tf > 0 THEN
       |          (length(bin(s.n)) - length(bin(dfx.dft))) *
       |          ((44 * $a * tf.tf * $scale) //
       |           (20 * $a * tf.tf + 6 * $a + 18 * tf.dl))
       |          ELSE 0 END) AS BIGINT) AS score
       |      FROM tf JOIN dfx USING (term) CROSS JOIN s GROUP BY tf._id)
       |SELECT _id AS $idExpr, score FROM sc
       |WHERE score > 0 ORDER BY score DESC, _id LIMIT $k""".stripMargin
  }
}
