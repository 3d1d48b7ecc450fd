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
}
