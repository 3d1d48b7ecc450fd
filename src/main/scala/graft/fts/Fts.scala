package graft.fts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Full-text search surface (SURVEY §2.2 P4/§2.1 S6/§2.6 F1).
  *
  * The reference maintains an inverted index `FTS.<t>.<f>.<token>.<row>`
  * built by lowercase-comma-strip-space-split at insert time
  * (/root/reference/server.py:732-739) and evaluates `field ~ 'a | b & c'`
  * by fetching per-token posting lists and folding them left-to-right with
  * set union/intersection (client.py:683-738).
  *
  * Spark-first restatement: the posting list is a derived `tokens`
  * Array[String] column computed at ingest; a match query compiles to a
  * boolean `Column` tree over `array_contains`, which Catalyst pushes into
  * the scan and whole-stage-codegens. No index structure, no materialized
  * posting lists — at 100 TB the tokenized column lives in the same parquet
  * and the filter is evaluated scan-side with zero shuffles.
  *
  * Divergence from the reference (documented per SURVEY §7.4): we give `&`
  * higher precedence than `|` (standard boolean precedence) instead of the
  * reference's left-to-right fold, and we support parentheses. Bare
  * space-separated tokens AND together (the reference's default mode,
  * client.py:700-707).
  */
object Fts {

  /** Ingest-time tokenizer — must stay in lockstep with the reference's
    * `value.replace(",", "").split(" ")` + lowercase (server.py:733). */
  def tokens(c: Column): Column = split(regexp_replace(lower(c), ",", ""), " ")

  /** DuckDB-equivalent of [[tokens]] for oracle SQL. */
  def tokensOracleSql(colName: String): String =
    s"string_split(replace(lower($colName), ',', ''), ' ')"

  // ---- tiny recursive-descent parser: OR > AND > atom, parens allowed;
  // double-quoted atoms are PHRASES (adjacency match — growth beyond the
  // reference's bag-of-tokens `~`) ----
  sealed trait Node
  final case class Tok(t: String) extends Node
  final case class Phrase(ws: Seq[String]) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node

  def parse(query: String): Node = {
    // quote-aware pre-tokenization: the paren/operator expansion must not
    // run INSIDE a phrase, where '(' or ')' are literal word characters
    // (the document tokenizer keeps them — a phrase "big (data)" must
    // stay two words, not become operators).
    val segs = query.split("\"", -1)
    require(segs.length % 2 == 1, s"unbalanced \" in FTS query: $query")
    val toks = segs.zipWithIndex.flatMap { case (seg, j) =>
      val inner =
        if (j % 2 == 1) seg.trim.split("\\s+").filter(_.nonEmpty).toSeq
        else seg.replace("(", " ( ").replace(")", " ) ")
          .trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (j % 2 == 1) "\"" +: inner :+ "\"" else inner
    }.toList
    val (node, rest) = parseOr(toks)
    require(rest.isEmpty, s"trailing tokens in FTS query: $rest")
    node
  }

  private def parseOr(in: List[String]): (Node, List[String]) = {
    var (left, rest) = parseAnd(in)
    while (rest.headOption.contains("|")) {
      val (r, rs) = parseAnd(rest.tail)
      left = Or(left, r); rest = rs
    }
    (left, rest)
  }

  private def parseAnd(in: List[String]): (Node, List[String]) = {
    var (left, rest) = parseAtom(in)
    // explicit `&` or the reference's implicit AND between adjacent tokens
    var continue = true
    while (continue) rest match {
      case "&" :: tail =>
        val (r, rs) = parseAtom(tail); left = And(left, r); rest = rs
      case t :: _ if t != "|" && t != ")" =>
        val (r, rs) = parseAtom(rest); left = And(left, r); rest = rs
      case _ => continue = false
    }
    (left, rest)
  }

  private def parseAtom(in: List[String]): (Node, List[String]) = in match {
    case "(" :: tail =>
      val (n, rest) = parseOr(tail)
      require(rest.headOption.contains(")"), "unbalanced ( in FTS query")
      (n, rest.tail)
    case "\"" :: tail =>
      val (raw, rest) = tail.span(_ != "\"")
      require(rest.headOption.contains("\""), "unbalanced \" in FTS query")
      // phrase words go through the SAME normalization as the document
      // tokenizer (lowercase + comma strip) so "key, agg" can match the
      // comma-stripped tokens column
      val ws = raw.map(_.toLowerCase.replace(",", "")).filter(_.nonEmpty)
      require(ws.nonEmpty, "empty phrase in FTS query")
      if (ws.sizeIs == 1) (Tok(ws.head), rest.tail)
      else (Phrase(ws), rest.tail)
    case t :: tail => (Tok(t.toLowerCase), tail)
    case Nil => throw new IllegalArgumentException("empty FTS query")
  }

  /** Adjacency match: some position i has tokens[i..i+k-1] == ws —
    * equivalently, the space-joined token sequence padded with sentinels
    * contains ` w1 … wk ` as a substring (tokens contain no spaces by
    * construction, so the delimiters are unambiguous; a consecutive-space
    * empty token joins back as a double space and correctly blocks
    * adjacency). One codegen'd `contains` per phrase — an
    * exists-over-positions formulation would inline the tokenizer into
    * EVERY element_at probe (measured 2.9 s vs 0.1 s on the bench). */
  private def phraseMatch(tokensCol: Column, ws: Seq[String]): Column =
    concat(lit(" "), array_join(tokensCol, " "), lit(" "))
      .contains(ws.mkString(" ", " ", " "))

  private def phraseMatchSql(tokensExpr: String, ws: Seq[String]): String =
    s"""contains(' ' || array_to_string($tokensExpr, ' ') || ' ',
       | '${ws.mkString(" ", " ", " ")}')""".stripMargin

  /** Compile an FTS query string to a boolean Column over a tokens column. */
  def matches(tokensCol: Column, query: String): Column = {
    def go(n: Node): Column = n match {
      case Tok(t) => array_contains(tokensCol, t)
      case Phrase(ws) => phraseMatch(tokensCol, ws)
      case And(l, r) => go(l) && go(r)
      case Or(l, r) => go(l) || go(r)
    }
    go(parse(query))
  }

  /** Same compilation targeted at DuckDB SQL, for oracle strings. */
  def matchesOracleSql(tokensExpr: String, query: String): String = {
    def go(n: Node): String = n match {
      case Tok(t) => s"list_contains($tokensExpr, '$t')"
      case Phrase(ws) => phraseMatchSql(tokensExpr, ws)
      case And(l, r) => s"(${go(l)} AND ${go(r)})"
      case Or(l, r) => s"(${go(l)} OR ${go(r)})"
    }
    go(parse(query))
  }

  // ---- BM25 ranking (growth beyond the reference's boolean-only `~`,
  // server.py:1124-1128 returns an unranked row set) ----

  /** A ranking query is a bag of terms under the SAME normalization as the
    * document tokenizer ([[tokens]]): lowercase, commas stripped,
    * whitespace-split, duplicates collapsed (BM25 is defined over distinct
    * query terms). Restricted to word characters so the terms can be
    * inlined verbatim into both engines' generated SQL. */
  def bm25Terms(query: String): Seq[String] = {
    val ts = query.toLowerCase.replace(",", "").split("\\s+")
      .filter(_.nonEmpty).distinct.toSeq
    require(ts.nonEmpty, s"empty BM25 query: $query")
    require(ts.forall(_.matches("[a-z0-9_]+")),
      s"BM25 terms must be word characters: $ts")
    ts
  }

  /** BM25 document ranking over the tokens column, in EXACT INTEGER
    * arithmetic so Spark and the DuckDB oracle produce bit-identical
    * scores (the same discipline as `TextAnalysis.unigramSurprisal`):
    *
    *   - idf(t) = ⌊log2 N⌋ − ⌊log2 df(t)⌋, computed as
    *     `length(bin(N)) − length(bin(df))` — integer bits, never a float
    *     log. Lucene-shaped: common terms (df within a power of two of N)
    *     contribute 0; never negative since df ≤ N.
    *   - tf saturation + length normalization at the standard k1 = 1.2,
    *     b = 0.75, cleared of fractions: tf·(k1+1) / (tf + k1·(1−b+b·dl/A))
    *     with A = ⌊Σdl / N⌋ (integer mean doc length) multiplies through
    *     by 20·A into (44·A·tf) / (20·A·tf + 6·A + 18·dl) — evaluated as
    *     one integer `div` per term, scaled by `scale` first to keep
    *     precision. Overflow headroom: idf ≤ 63, and 44·A·tf·scale at
    *     scale=100 stays < 2^63 for A·tf < 2^51 — nothing a real corpus
    *     reaches per document.
    *   - score(d) = Σ_t [tf > 0] · idf(t) · saturation(t, d); docs
    *     matching no term (score 0) are dropped; ties break by ascending
    *     id so top-k is a total order.
    *
    * Execution shape: TWO scans of a (id, tokens) projection — one tiny
    * corpus-stats aggregate (N, Σdl, per-term df — one row, broadcast
    * back) and one scoring pass where tf/dl/score are all scan-side
    * codegen expressions (`filter` HOF + arithmetic, no explode, no
    * per-term join); top-k plans TakeOrderedAndProject (per-partition
    * heads, no global sort). At 100 TB: two column-pruned passes at I/O
    * rate with ZERO wide shuffles — the stats row is the only thing that
    * moves — vs the classic inverted-index join shape whose posting-list
    * shuffle dwarfs it.
    *
    * @return (idCol, score) — top `k` by (score desc, id asc), score > 0 */
  def bm25(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
           query: String, k: Int, scale: Long = 100L): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(scale > 0, s"scale must be positive: $scale")
    val terms = bm25Terms(query)
    val base = df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val dfAggs = terms.indices.map(i =>
      sum(when(array_contains(col("toks"), terms(i)), 1L).otherwise(0L))
        .as(s"df_$i"))
    val stats = base.agg(count(lit(1)).as("n"),
      (sum(col("dl")).as("sdl") +: dfAggs): _*)
    var scored = base.crossJoin(broadcast(stats))
      .withColumn("a", expr("sdl div n"))
    terms.indices.foreach { i =>
      // (round 16, revised) tf = size(filter(toks, x = t)). An
      // intermediate round spelled this |toks| − |toks without t| via
      // array_remove ("codegen beats an interpreted HOF") — and the
      // SAME-BOX re-baseline showed it 2.4× SLOWER: array_remove COPIES
      // the token array once per term per row (O(terms·len) allocation),
      // which dwarfs the lambda-interpretation cost of a count that
      // allocates nothing. Reverted to the filter-count form.
      scored = scored.withColumn(s"tf_$i",
        size(filter(col("toks"), x => x === terms(i))).cast("long"))
    }
    val contrib = terms.indices.map(i =>
      s"(CASE WHEN tf_$i > 0 THEN (length(bin(n)) - length(bin(df_$i))) * " +
        s"((44 * a * tf_$i * $scale) div (20 * a * tf_$i + 6 * a + 18 * dl)) " +
        s"ELSE 0 END)")
    scored.withColumn("score", expr(contrib.mkString(" + ")).cast("long"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** DuckDB mirror of [[bm25]] — generated from the same term list, the
    * same integer formula (`//` ≡ Spark's `div` on BIGINT, `bin`/`length`
    * agree — proven by the text_surprisal oracle). `src` must expose
    * `$idExpr` and `$textExpr`. */
  def bm25OracleSql(src: String, idExpr: String, textExpr: String,
                    query: String, k: Int, scale: Long = 100L): String = {
    val terms = bm25Terms(query)
    val toks = tokensOracleSql(textExpr)
    val dfSels = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN list_contains(toks, '${terms(i)}') THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
    val tfSels = terms.indices.map(i =>
      s"CAST(len(list_filter(toks, x -> x = '${terms(i)}')) AS BIGINT) AS tf_$i")
    val contrib = terms.indices.map(i =>
      s"(CASE WHEN tf_$i > 0 THEN (length(bin(n)) - length(bin(df_$i))) * " +
        s"((44 * a * tf_$i * $scale) // (20 * a * tf_$i + 6 * a + 18 * dl)) " +
        s"ELSE 0 END)")
    s"""WITH graft_bm_d AS (SELECT $idExpr AS _id, $toks AS toks,
       |    CAST(len($toks) AS BIGINT) AS dl FROM $src),
       |graft_bm_s AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dl) AS BIGINT) AS sdl,
       |    ${dfSels.mkString(",\n    ")}
       |  FROM graft_bm_d),
       |graft_bm_t AS (SELECT _id, dl, n, sdl // n AS a,
       |    ${(terms.indices.map(i => s"df_$i") ++ Seq.empty).mkString(", ")},
       |    ${tfSels.mkString(",\n    ")}
       |  FROM graft_bm_d, graft_bm_s),
       |graft_bm_sc AS (SELECT _id,
       |    CAST(${contrib.mkString("\n      + ")} AS BIGINT) AS score
       |  FROM graft_bm_t)
       |SELECT _id AS $idExpr, score FROM graft_bm_sc
       |WHERE score > 0 ORDER BY score DESC, _id LIMIT $k""".stripMargin
  }

  // ---- trigram substring index (growth beyond the reference: its FTS is
  // whole-token only, server.py:732-739 — substring search there means
  // scanning every byte; the trigram posting list is the standard index
  // shape for `contains`, cf. PostgreSQL's pg_trgm) ----

  /** Build the trigram posting index of `textCol`: one `(gram, id)` row
    * per DISTINCT 3-char window per document, with the gram identified by
    * its 8-byte xxhash64 ([[graft.functions.TextKernels.trigramHashes]] —
    * round 16: the string-gram HOF build ran an interpreted lambda and
    * allocated one 3-char string per position; the kernel runs the whole
    * window loop inside whole-stage codegen and the index stores longs,
    * the pg_trgm-style compressed-posting shape). No shuffle in the
    * build. Materialize this partitioned/bucketed BY GRAM: a search then
    * reads only its pattern's posting lists, never the corpus text.
    * Documents shorter than 3 chars index nothing — they cannot contain
    * any pattern the index serves (the <3-char fallback scan in
    * [[substringSearch]] still finds them). Hash collisions can only add
    * candidates, and candidates are verified with a real `contains` —
    * search results are exactly the string formulation's on any input. */
  def trigramIndex(df: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame =
    df.filter(length(col(textCol)) >= 3)
      .select(col(idCol).as("id"),
        explode(graft.functions.TextKernels.trigram_hashes(col(textCol)))
          .as("gram"))

  /** Substring search ("grep at scale") over the posting index: a
    * candidate must contain ALL of the pattern's distinct trigrams —
    * posting-list intersection as a |grams|-literal IN filter plus a
    * count match, touching only those grams' postings — and the candidate
    * set ALONE is then verified with a real `contains` against the docs
    * (trigram containment is necessary, not sufficient: the grams can
    * occur at non-adjacent positions). Patterns shorter than 3 chars fall
    * back to the full scan the index cannot serve. Returns the matching
    * ids under `idCol`'s name. */
  def substringSearch(index: org.apache.spark.sql.DataFrame,
                      docs: org.apache.spark.sql.DataFrame,
                      idCol: String, textCol: String,
                      pattern: String): org.apache.spark.sql.DataFrame = {
    require(pattern.nonEmpty, "empty substring pattern")
    if (pattern.length < 3)
      docs.filter(col(textCol).contains(pattern)).select(col(idCol))
    else {
      // hash the pattern's windows through the SAME kernel as the index
      // build (distinct hashes — a present substring's grams always match;
      // collisions only widen the candidate set the verify pass prunes)
      val grams: Seq[Long] = graft.functions.TextKernels.trigramHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(pattern)).toSeq
      val cand = index
        .filter(col("gram").isin(grams: _*))
        .groupBy("id")
        .agg(count(lit(1)).as("graft_ngram_hits"))
        .filter(col("graft_ngram_hits") === grams.length)
        .select(col("id").as(idCol))
      docs.join(cand, idCol)
        .filter(col(textCol).contains(pattern))
        .select(col(idCol))
    }
  }
}
