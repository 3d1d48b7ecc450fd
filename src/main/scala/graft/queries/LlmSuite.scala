package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Dedup, Multimodal, Packing, Retrieval, Sampling, Similarity, Snapshot, TextAnalysis}

/** Training-data-pipeline operators (SURVEY §2.12, driver north-star):
  * dedup (exact / MinHash-LSH / SimHash / n-gram jaccard / embedding),
  * similarity search, text analysis, multimodal plumbing.
  *
  * The synthetic corpus has no real near-duplicates (max pairwise jaccard
  * ≈ 0.03), so near-dup queries PLANT them: each doc is augmented with a
  * copy (id + 10000) missing its first token — jaccard ≈ 0.94 against the
  * original. Both engines reproduce the same augmentation, so the oracle is
  * the exact pairwise answer and LSH recall is part of what t2 checks.
  */
object LlmSuite extends Suite {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.t(s, d, "documents")
  private def emb(s: SparkSession, d: String): DataFrame = Tables.t(s, d, "embeddings")

  /** docs ∪ near-dup copies (first token dropped, id + 10000). */
  private def augmented(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base.unionByName(base.select(
      (col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))
  }

  private val augmentedSql =
    """aug AS (SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id, regexp_replace(text, '^[^ ]+ ', '') AS text
      |  FROM documents)""".stripMargin

  /** One tokenize→3-gram-shingle CTE chain (src → `$t` tokens → `$sOut`
    * shingle sets) — the SINGLE SQL mirror of the
    * [[graft.functions.TextKernels]] shingle tokenization, shared by every
    * jaccard oracle so a kernel tokenization change has exactly one SQL
    * site to update. */
  private def shingleChainSql(src: String, t: String, sOut: String): String =
    s"""$t AS (SELECT doc_id,
       |        string_split(replace(lower(text), ',', ''), ' ') AS toks
       |      FROM $src),
       |$sOut AS (SELECT doc_id,
       |        list_distinct(list_transform(range(1, len(toks) - 1),
       |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |      FROM $t)""".stripMargin

  /** Shared CTE chain ending in `jp(a, b, jaccard)` — exact pairwise
    * jaccard ≥ threshold over distinct 3-gram shingles of `src` (a < b).
    * `extra` lets a caller splice additional CTEs (e.g. a filtered corpus)
    * between `aug` and the shingle chain. */
  private def jaccardPairsCtes(threshold: Double, src: String = "aug",
                               extra: String = ""): String =
    s"""$augmentedSql,$extra
       |${shingleChainSql(src, "t", "s")},
       |p AS (SELECT x.doc_id AS a, y.doc_id AS b,
       |        len(list_intersect(x.sh, y.sh)) AS inter,
       |        len(x.sh) AS na, len(y.sh) AS nb
       |      FROM s x JOIN s y ON x.doc_id < y.doc_id),
       |jp AS (SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 4) AS jaccard
       |       FROM p
       |       WHERE round(inter::DOUBLE / (na + nb - inter), 4) >= $threshold)""".stripMargin

  /** DuckDB-side exact pairwise jaccard — the shared oracle for minhash-LSH
    * and posting-join implementations (both must produce the exact answer). */
  private def jaccardOracle(threshold: Double): String =
    s"""WITH ${jaccardPairsCtes(threshold)}
       |SELECT a, b, jaccard FROM jp""".stripMargin

  /** Symmetric-edges + recursive-reach transitive closure over a pairs CTE
    * named `jp(a, b, …)` — THE one SQL mirror of [[Dedup.clusters]]'
    * component/representative semantics (self-loops make singletons-
    * after-dedup work; min reachable id = the representative). Shared by
    * every closure-consuming oracle so the convention has exactly one SQL
    * site. */
  private val closureCtes =
    """edges AS (SELECT a AS u, b AS v FROM jp
      |  UNION SELECT b, a FROM jp
      |  UNION SELECT a, a FROM jp
      |  UNION SELECT b, b FROM jp),
      |reach(u, w) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.w = e.u)""".stripMargin

  /** Connected components over the exact jaccard pairs: transitive closure
    * via recursive CTE (components are tiny — planted pairs/chains), then
    * min reachable id per node. The Spark side's min-label propagation must
    * land on identical representatives. */
  private def clustersOracle(threshold: Double): String =
    s"""WITH RECURSIVE ${jaccardPairsCtes(threshold)},
       |$closureCtes
       |SELECT u AS doc_id, min(w) AS rep FROM reach GROUP BY u""".stripMargin

  /** DuckDB-side cosine over the float embeddings (cast to double, same
    * left-to-right summation as Similarity.dot). */
  private val cosineNormsCte =
    """n AS (SELECT vec_id, embedding,
      |        sqrt(list_sum(list_transform(embedding,
      |          x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |      FROM embeddings)""".stripMargin
  private def cosExpr(xv: String, yv: String): String =
    s"""list_sum(list_transform(range(1, 65),
       |  i -> $xv.embedding[i]::DOUBLE * $yv.embedding[i]::DOUBLE))
       |  / ($xv.nrm * $yv.nrm)""".stripMargin

  /** DuckDB twin of [[Similarity.mmrRerank]]: the k-step greedy UNROLLED
    * as CTE chains (`acc1..acck`) — step t anti-joins out the already
    * selected, aggregates each survivor's max similarity against them,
    * and picks the integer-score argmax with the same min-id tie-break.
    * Pure integer arithmetic end to end, so the hash must match. */
  /** DuckDB twin of [[graft.llm.Bpe.train]]: m iterations unrolled as CTE
    * chains. Each round: adjacent-pair counts weighted by word freq, the
    * (count desc, pair asc) argmax, and the merge applied by the SAME
    * greedy separator-string fold the engine uses (list_reduce with a
    * seeded empty accumulator; ends_with(acc, sep||a) is an exact
    * complete-symbol test, and a fresh a||b can never end in sep||a, so
    * cascading re-merges are impossible — both engines agree word by
    * word). */
  private def bpeTrainCtes(m: Int): Seq[String] = {
    val ctes = scala.collection.mutable.ArrayBuffer(
      """wf AS (SELECT word, count(*) AS freq FROM
        |  (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY 1)""".stripMargin,
      "w0 AS (SELECT list_append(string_split(word, ''), '</w>') AS sym, freq FROM wf)")
    (1 to m).foreach { t =>
      ctes += s"""p$t AS (SELECT p[1] AS a, p[2] AS b, sum(freq) AS c
        |  FROM (SELECT unnest(list_zip(sym[1:len(sym)-1], sym[2:len(sym)])) AS p,
        |          freq
        |        FROM w${t - 1} WHERE len(sym) >= 2) GROUP BY 1, 2)""".stripMargin
      ctes += s"m$t AS (SELECT a, b, c FROM p$t ORDER BY c DESC, a, b LIMIT 1)"
      ctes += s"""w$t AS (SELECT string_split(substr(list_reduce(
        |    list_prepend('', sym),
        |    (acc, x) -> CASE WHEN ends_with(acc, chr(31) || m$t.a) AND x = m$t.b
        |                     THEN acc || x ELSE acc || chr(31) || x END),
        |    2), chr(31)) AS sym, freq
        |  FROM w${t - 1}, m$t)""".stripMargin
    }
    ctes.toSeq
  }

  private def bpeOracleSql(m: Int): String = {
    val out = (1 to m).map(t =>
      s"SELECT $t AS step, a AS lhs, b AS rhs, a || b AS merged, " +
        s"CAST(c AS BIGINT) AS cnt FROM m$t").mkString("\n  UNION ALL ")
    s"WITH ${bpeTrainCtes(m).mkString(",\n")}\n$out"
  }

  /** Train CTEs + a per-doc encode: each word runs the SAME m nested
    * greedy folds the engine chains, flattened in word order. */
  private def bpeEncodeOracleSql(m: Int): String = {
    def fold(inner: String, t: Int): String =
      s"""string_split(substr(list_reduce(list_prepend('', $inner),
         |  (acc, x) -> CASE WHEN ends_with(acc, chr(31) || m$t.a) AND x = m$t.b
         |              THEN acc || x ELSE acc || chr(31) || x END),
         |  2), chr(31))""".stripMargin
    val chain = (1 to m).foldLeft(
      "list_append(string_split(w, ''), '</w>')")(fold)
    s"""WITH ${bpeTrainCtes(m).mkString(",\n")}
       |SELECT d.doc_id,
       |  array_to_string(flatten(list_transform(
       |    list_filter(string_split(lower(d.text), ' '), w -> w <> ''),
       |    w -> $chain)), ' ') AS tokens
       |FROM documents d, ${(1 to m).map("m" + _).mkString(", ")}"""
      .stripMargin
  }

  private def mmrOracleSql(nQueries: Int, poolK: Int, k: Int, lam: Int): String = {
    val head = s"""WITH $cosineNormsCte,
      |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
      |        round(${cosExpr("q", "x")}, 5) AS cos
      |      FROM n q JOIN n x ON q.vec_id <> x.vec_id
      |      WHERE q.vec_id < $nQueries),
      |cand AS (SELECT qid, nid,
      |        CAST(round(cos * 100000, 0) AS BIGINT) AS rel
      |      FROM (SELECT qid, nid, cos,
      |              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
      |            FROM p)
      |      WHERE rn <= $poolK),
      |sim0 AS (SELECT a.qid, a.nid AS a, b.nid AS b,
      |        CAST(round(round(${cosExpr("x", "y")}, 5) * 100000, 0) AS BIGINT) AS s
      |      FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid < b.nid
      |      JOIN n x ON x.vec_id = a.nid JOIN n y ON y.vec_id = b.nid),
      |sim AS (SELECT qid, a, b, s FROM sim0
      |  UNION ALL SELECT qid, b, a, s FROM sim0),
      |acc1 AS (SELECT qid, nid, 1 AS mmr_rank FROM (
      |    SELECT qid, nid,
      |      row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn
      |    FROM cand) WHERE rn = 1)""".stripMargin
    val steps = (2 to k).map { t =>
      s""",
      |m$t AS (SELECT c.qid, c.nid,
      |        $lam * c.rel - ${100 - lam} * max(s.s) AS score
      |      FROM cand c
      |      JOIN acc${t - 1} p ON p.qid = c.qid
      |      JOIN sim s ON s.qid = c.qid AND s.a = c.nid AND s.b = p.nid
      |      LEFT JOIN acc${t - 1} x ON x.qid = c.qid AND x.nid = c.nid
      |      WHERE x.nid IS NULL
      |      GROUP BY c.qid, c.nid, c.rel),
      |pick$t AS (SELECT qid, nid, $t AS mmr_rank FROM (
      |    SELECT qid, nid,
      |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn
      |    FROM m$t) WHERE rn = 1),
      |acc$t AS (SELECT * FROM acc${t - 1} UNION ALL SELECT * FROM pick$t)"""
        .stripMargin
    }.mkString
    s"""$head$steps
       |SELECT qid, nid, CAST(mmr_rank AS BIGINT) AS mmr_rank
       |FROM acc$k""".stripMargin
  }

  /** DuckDB twin of Similarity.lshBucket: each plane's coefficients are the
    * SAME deterministic doubles the Spark expression uses, inlined as a list
    * literal (Double.toString round-trips exactly), and the dot is the same
    * ascending-index left fold as cosExpr — so bucket ids agree bit-for-bit
    * and the approximate operator is exactly reproducible. */
  private def lshBucketSql(dims: Int, planes: Int): String =
    (0 until planes).map { p =>
      val coeffs = (0 until dims).map(d => Similarity.coeff(p, d).toString).mkString(", ")
      s"""(CASE WHEN list_sum(list_transform(range(1, ${dims + 1}),
         |  i -> embedding[i]::DOUBLE * ([$coeffs])[i])) >= 0
         |  THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
    }.mkString("\n + ")

  /** Cross-corpus jaccard CTEs ending in `jp(a, b, jaccard)`: exact
    * pairwise jaccard between the corpus (documents) and the planted
    * benchmark slice of `aug` (ids 10000-10049) — the oracle may cross
    * |corpus|×50 pairs; the engine's banded join must land on the same
    * verified set. */
  private def crossJaccardCtes(threshold: Double): String = {
    s"""$augmentedSql,
       |bench AS (SELECT doc_id, text FROM aug
       |          WHERE doc_id >= 10000 AND doc_id < 10050),
       |${shingleChainSql("documents", "tc", "sc")},
       |${shingleChainSql("bench", "tb", "sb")},
       |p AS (SELECT x.doc_id AS a, y.doc_id AS b,
       |        len(list_intersect(x.sh, y.sh)) AS inter,
       |        len(x.sh) AS na, len(y.sh) AS nb
       |      FROM sc x CROSS JOIN sb y),
       |jp AS (SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 4) AS jaccard
       |       FROM p
       |       WHERE round(inter::DOUBLE / (na + nb - inter), 4) >= $threshold)""".stripMargin
  }

  /** Exact n-gram collision CTEs — the SQL mirror of
    * [[Dedup.ngramCollisions]]: `evg(gram)` is the distinct n-gram set of
    * the planted benchmark slice (ids 10000-10049 of `aug`), `cg(doc_id,
    * gram)` the per-corpus-doc distinct n-grams (windows of exactly `n`
    * tokens of the shared comma-strip-lowercase tokenization). */
  private def ngramCollisionCtes(n: Int): String = {
    def gramsCte(src: String, tname: String, out: String, cols: String) =
      s"""$tname AS (SELECT doc_id,
         |        string_split(replace(lower(text), ',', ''), ' ') AS toks
         |      FROM $src),
         |$out AS (SELECT $cols
         |        unnest(list_distinct(list_transform(
         |          range(1, len(toks) - ${n - 2}),
         |          i -> array_to_string(toks[i:i+${n - 1}], ' ')))) AS gram
         |      FROM $tname)""".stripMargin
    s"""$augmentedSql,
       |bench AS (SELECT doc_id, text FROM aug
       |          WHERE doc_id >= 10000 AND doc_id < 10050),
       |${gramsCte("bench", "tbn", "evg0", "")},
       |evg AS (SELECT DISTINCT gram FROM evg0),
       |${gramsCte("documents", "tcn", "cg", "doc_id,")}""".stripMargin
  }

  /** clean_corpus oracle: quality+lang filter (fil), exact jaccard pairs
    * over fil, closure, drop non-representatives. */
  private def cleanCorpusOracle(minQuality: Double, lang: String,
                                threshold: Double): String = {
    val filCte =
      s"""
         |fil AS (SELECT doc_id, text FROM aug
         |        WHERE ${TextAnalysis.qualityScoreSql("text")} >= $minQuality
         |          AND ${TextAnalysis.langIdSql("text")} = '$lang'),""".stripMargin
    s"""WITH RECURSIVE ${jaccardPairsCtes(threshold, src = "fil", extra = filCte)},
       |$closureCtes,
       |drops AS (SELECT u FROM reach GROUP BY u HAVING min(w) <> u)
       |SELECT doc_id FROM fil WHERE doc_id NOT IN (SELECT u FROM drops)""".stripMargin
  }

  def defs: Map[String, Q] = Map(

    // ---------- text analysis ----------
    "text_token_count" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeTokenEstimate(col("text")).as("n_bpe")),
      Some(s"""SELECT doc_id, ${TextAnalysis.tokenCountSql("text")} AS n_tokens,
              |  ${TextAnalysis.bpeTokenEstimateSql("text")} AS n_bpe
              |FROM documents""".stripMargin)),

    "text_langid" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_guess")),
      Some(s"""SELECT doc_id, ${TextAnalysis.langIdSql("text")} AS lang_guess
              |FROM documents""".stripMargin)),

    "text_quality" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      Some(s"""SELECT doc_id, ${TextAnalysis.qualityScoreSql("text")} AS quality
              |FROM documents""".stripMargin)),

    "text_tfidf_top" -> Q(
      (s, d) => TextAnalysis.tfidfTop(docs(s, d), "text", "doc_id"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             |           FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents),
             |sc AS (SELECT doc_id, term,
             |         round(tf * ln(n.n::DOUBLE / df.df), 4) AS score
             |       FROM tf JOIN df USING (term) CROSS JOIN n),
             |r AS (SELECT doc_id, term, score,
             |        row_number() OVER (PARTITION BY doc_id
             |          ORDER BY score DESC, term) AS rn
             |      FROM sc)
             |SELECT doc_id, term AS top_term, score FROM r WHERE rn = 1""".stripMargin)),

    // the corpus "data card" in one aggregation: doc/token/BPE totals,
    // aggregate quality (FIXED-POINT sum — 4-decimal scores scale to exact
    // longs, so float summation order can never flip the hash), language
    // count, and the high-repetition tally. One scan, one partial-agg
    // shuffle at any corpus size.
    "corpus_stats" -> Q(
      (s, d) => docs(s, d).agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
        sum(TextAnalysis.bpeTokenEstimate(col("text"))).as("n_bpe"),
        (sum(round(TextAnalysis.qualityScore(col("text")) * 10000, 0)
          .cast("long")).cast("double") / 10000.0).as("quality_total"),
        countDistinct(TextAnalysis.langId(col("text"))).as("n_langs"),
        sum(when(TextAnalysis.dupTokenFrac(col("text")) > 0.5, 1L)
          .otherwise(0L)).as("n_repetitive")),
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(${TextAnalysis.tokenCountSql("text")}) AS BIGINT)
              |    AS n_tokens,
              |  CAST(sum(${TextAnalysis.bpeTokenEstimateSql("text")}) AS BIGINT)
              |    AS n_bpe,
              |  CAST(sum(CAST(round(${TextAnalysis.qualityScoreSql("text")}
              |      * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0
              |    AS quality_total,
              |  CAST(count(DISTINCT ${TextAnalysis.langIdSql("text")}) AS BIGINT)
              |    AS n_langs,
              |  CAST(sum(CASE WHEN ${TextAnalysis.dupTokenFracSql("text")} > 0.5
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
              |FROM documents""".stripMargin)),

    // per-language data-card breakdown: the mixture report a pipeline
    // prints before training. The raw corpus is all-en, so a deterministic
    // fr/de stopword block is planted on thirds of it to make the mixture
    // real. avg quality = exact fixed-point sum divided by an exact
    // integer — one double division, bit-identical in both engines.
    "corpus_stats_by_lang" -> Q(
      (s, d) => {
        val fr = "le la les et de un est le la les et de un est le la les et de un est "
        val de = "der die das und ist ein zu der die das und ist ein zu der die das und ist ein zu "
        docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(lit(fr), col("text")))
            .when(col("doc_id") % 3 === 1, concat(lit(de), col("text")))
            .otherwise(col("text")).as("text"))
          .groupBy(TextAnalysis.langId(col("text")).as("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
            (sum(round(TextAnalysis.qualityScore(col("text")) * 10000, 0)
              .cast("long")).cast("double") /
              (count(lit(1)) * 10000).cast("double")).as("avg_quality"))
      },
      Some(s"""WITH pl AS (SELECT doc_id, CASE
              |    WHEN doc_id % 3 = 0 THEN
              |      'le la les et de un est le la les et de un est le la les et de un est ' || text
              |    WHEN doc_id % 3 = 1 THEN
              |      'der die das und ist ein zu der die das und ist ein zu der die das und ist ein zu ' || text
              |    ELSE text END AS text
              |  FROM documents)
              |SELECT ${TextAnalysis.langIdSql("text")} AS lang,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(${TextAnalysis.tokenCountSql("text")}) AS BIGINT)
              |    AS n_tokens,
              |  CAST(sum(CAST(round(${TextAnalysis.qualityScoreSql("text")}
              |      * 10000, 0) AS BIGINT)) AS DOUBLE)
              |    / CAST(count(*) * 10000 AS DOUBLE) AS avg_quality
              |FROM pl
              |GROUP BY 1""".stripMargin)),

    // corpus-wide heavy-hitter vocabulary: top 20 terms by frequency
    // (ties by term) — one explode, one count shuffle with map-side
    // partial agg, TakeOrderedAndProject for the limit (no global sort).
    "vocab_top" -> Q(
      (s, d) => docs(s, d)
        .select(explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc).limit(20),
      Some("""SELECT term, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
             |      FROM documents)
             |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin)),

    // Gopher-style repetition signals: fraction of repeated tokens + the
    // share of the single most frequent 2-/3-gram — the standard
    // low-quality-document filters (scan-side expressions, exact-integer
    // ratios so the oracle hash-matches).
    "text_repetition" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"),
        TextAnalysis.dupTokenFrac(col("text")).as("dup_token_frac"),
        TextAnalysis.topNgramFrac(col("text"), 2).as("top_bigram_frac"),
        TextAnalysis.topNgramFrac(col("text"), 3).as("top_trigram_frac")),
      Some(s"""SELECT doc_id,
              |  ${TextAnalysis.dupTokenFracSql("text")} AS dup_token_frac,
              |  ${TextAnalysis.topNgramFracSql("text", 2)} AS top_bigram_frac,
              |  ${TextAnalysis.topNgramFracSql("text", 3)} AS top_trigram_frac
              |FROM documents""".stripMargin)),

    // PII scrubbing over a corpus with PLANTED pii (emails/IPs/phones
    // synthesized from doc_id — the raw corpus has none): redacted text +
    // per-doc hit count. Regexes live in the Java∩RE2 subset, so both
    // engines transform identically and the scrub is hash-checked.
    "pii_scrub" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"), concat(col("text"),
          lit(" reach user"), col("doc_id").cast("string"),
          lit("@example.com or 10.2."), (col("doc_id") % 200).cast("string"),
          lit(".7 tel 555-867-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
        .select(col("doc_id"),
          TextAnalysis.scrubPii(col("text")).as("scrubbed"),
          TextAnalysis.piiCount(col("text")).as("n_pii")),
      Some(s"""WITH pl AS (SELECT doc_id,
              |    text || ' reach user' || doc_id || '@example.com or 10.2.'
              |      || (doc_id % 200) || '.7 tel 555-867-'
              |      || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
              |  FROM documents)
              |SELECT doc_id, ${TextAnalysis.scrubPiiSql("text")} AS scrubbed,
              |  ${TextAnalysis.piiCountSql("text")} AS n_pii
              |FROM pl""".stripMargin)),

    // custom codegen'd Catalyst expression (graft.functions.RollingHash)
    "text_fingerprint" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"),
        graft.functions.RollingHash.rolling_hash(col("text")).as("fingerprint")),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, length(text) + 1),
             |        i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
             |    (acc, c) -> (acc * 131 + c) % 1000000007) AS fingerprint
             |FROM documents""".stripMargin)),

    // unicode/text fixing: NFC composition (custom codegen Expression —
    // Spark has no built-in normalizer), control-char strip, whitespace
    // collapse, trim. Decomposed accents + a BEL + space runs are planted
    // so the fix has real work; DuckDB's nfc_normalize applies the same
    // canonical composition as the JDK normalizer, so the cleaned text
    // (and the char counts before/after) hash-check.
    "text_nfc" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"), concat(col("text"),
          lit("  cafe\u0301 \u0007 nai\u0308ve  fin ")).as("text"))
        .select(col("doc_id"),
          TextAnalysis.fixText(col("text")).as("fixed"),
          length(col("text")).cast("long").as("n_raw"),
          length(TextAnalysis.fixText(col("text"))).cast("long").as("n_fixed")),
      Some(s"""WITH pl AS (SELECT doc_id,
              |    text || '  cafe' || chr(769) || ' ' || chr(7)
              |      || ' nai' || chr(776) || 've  fin ' AS text
              |  FROM documents)
              |SELECT doc_id, ${TextAnalysis.fixTextSql("text")} AS fixed,
              |  CAST(length(text) AS BIGINT) AS n_raw,
              |  CAST(length(${TextAnalysis.fixTextSql("text")}) AS BIGINT)
              |    AS n_fixed
              |FROM pl""".stripMargin)),

    // corpus-trained unigram-LM surprisal (the CCNet perplexity-filter
    // shape) in EXACT integer bits: per-token ⌊log2 N⌋ − ⌊log2 cnt⌋ via
    // length(bin(x)), so the "perplexity" score is integer arithmetic —
    // no cross-engine ln() ulp drift, fully hash-checked.
    "text_surprisal" -> Q(
      (s, d) => TextAnalysis.unigramSurprisal(docs(s, d), "text", "doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |          unnest(string_split(lower(text), ' ')) AS term
             |        FROM documents),
             |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM t)
             |SELECT doc_id,
             |  CAST(sum(length(bin(n.n)) - length(bin(c.cnt))) AS BIGINT)
             |    AS surprisal_bits,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  round(sum(length(bin(n.n)) - length(bin(c.cnt)))::DOUBLE
             |    / count(*), 4) AS bits_per_token
             |FROM t JOIN c USING (term) CROSS JOIN n
             |GROUP BY doc_id""".stripMargin)),

    // bigram LM with Stupid-Backoff fallback, exact integer bits: trained
    // on the doc_id%5≠0 split, scored over everything, so held-out docs
    // really exercise the OOV and backoff branches. Planted tokens make
    // that deterministic: ' u<doc_id>' is unique (OOV off-split) and
    // ' z<doc_id%7>' is a common unigram behind an unseen bigram (backoff
    // with in-vocab fallback). n_backoff doubles as the novelty signal.
    "text_lm_backoff" -> Q(
      (s, d) => {
        val aug = docs(s, d).select(col("doc_id"),
          concat(col("text"), lit(" u"), col("doc_id"),
            lit(" z"), col("doc_id") % 7).as("text"))
        TextAnalysis.bigramSurprisal(aug, "text", "doc_id",
          col("doc_id") % 5 =!= 0)
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text || ' u' || doc_id || ' z' || (doc_id % 7)
             |    AS text FROM documents),
             |tok AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM aug),
             |pc AS (
             |  SELECT doc_id, p[1] AS prev, p[2] AS cur FROM (
             |    SELECT doc_id,
             |      unnest(list_zip(list_prepend(NULL, l[1:len(l)-1]), l)) AS p
             |    FROM tok)),
             |train AS (SELECT * FROM pc WHERE doc_id % 5 <> 0),
             |uni AS (SELECT cur AS term, count(*) AS cnt FROM train GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM train),
             |bi AS (SELECT prev, cur, count(*) AS cnt FROM train
             |       WHERE prev IS NOT NULL GROUP BY 1, 2),
             |scored AS (
             |  SELECT pc.doc_id,
             |    CASE
             |      WHEN pc.prev IS NOT NULL AND bi.cnt IS NOT NULL
             |        THEN length(bin(up.cnt)) - length(bin(bi.cnt))
             |      WHEN pc.prev IS NOT NULL
             |        THEN 1 + CASE WHEN uc.cnt IS NULL THEN length(bin(n.n))
             |                      ELSE length(bin(n.n)) - length(bin(uc.cnt)) END
             |      ELSE CASE WHEN uc.cnt IS NULL THEN length(bin(n.n))
             |                ELSE length(bin(n.n)) - length(bin(uc.cnt)) END
             |    END AS s,
             |    CASE WHEN pc.prev IS NOT NULL AND bi.cnt IS NULL
             |      THEN 1 ELSE 0 END AS backoff
             |  FROM pc
             |  LEFT JOIN uni uc ON pc.cur = uc.term
             |  LEFT JOIN uni up ON pc.prev = up.term
             |  LEFT JOIN bi ON pc.prev = bi.prev AND pc.cur = bi.cur
             |  CROSS JOIN n)
             |SELECT doc_id, CAST(sum(s) AS BIGINT) AS bits,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(backoff) AS BIGINT) AS n_backoff,
             |  round(sum(s)::DOUBLE / count(*), 4) AS bits_per_token
             |FROM scored GROUP BY doc_id""".stripMargin)),

    // URL canonicalization (the step before per-domain caps and URL
    // dedup — without it every campaign link is a distinct page): planted
    // tracking-laden URLs → registrable lowercase domain + stripped
    // canonical form, identical regex semantics in both engines.
    "text_url_canon" -> Q(
      (s, d) => docs(s, d).select(col("doc_id"),
          concat(lit("https://Site"), col("doc_id") % 7,
            lit(".Example.COM/page/"), col("doc_id"),
            lit("?utm_source=x&id="), col("doc_id"),
            lit("&utm_campaign=y")).as("url"))
        .select(col("doc_id"),
          TextAnalysis.urlDomain(col("url")).as("domain"),
          TextAnalysis.canonicalizeUrl(col("url")).as("canon")),
      Some(s"""WITH u AS (SELECT doc_id,
              |    'https://Site' || (doc_id % 7) || '.Example.COM/page/'
              |      || doc_id || '?utm_source=x&id=' || doc_id
              |      || '&utm_campaign=y' AS url
              |  FROM documents)
              |SELECT doc_id, ${TextAnalysis.urlDomainSql("url")} AS domain,
              |  ${TextAnalysis.canonicalizeUrlSql("url")} AS canon
              |FROM u""".stripMargin)),

    // distributed perceptron TRAINING (the quality-classifier trainer to
    // text_classifier's scorer) in exact integer arithmetic: 4 epochs,
    // each ONE aggregation of the misclassified rows' y·x; labels from a
    // linear rule over (token count, n_chars) so the data is separable.
    // The oracle unrolls the 4 epochs as weight-CTE chains — learned
    // weights hash-check bit-for-bit, which float SGD could never do.
    "text_perceptron" -> Q(
      (s, d) => {
        val toks = TextAnalysis.tokenCount(col("text")).cast("long")
        val f = docs(s, d).select(toks.as("x1"), col("n_chars").as("x2"),
          when(toks * 3 + col("n_chars") > 700, 1L).otherwise(-1L).as("y"))
        TextAnalysis.trainPerceptron(f, Seq("x1", "x2"), "y", epochs = 4)
      },
      Some {
        val x1 = "CAST(len(string_split(text, ' ')) AS BIGINT)"
        val epochs = (1 to 4).map { t =>
          s"""m$t AS (SELECT
             |  coalesce(sum(CASE WHEN y * (w.w1*x1 + w.w2*x2 + w.b) <= 0
             |               THEN y * x1 ELSE 0 END), 0) AS d1,
             |  coalesce(sum(CASE WHEN y * (w.w1*x1 + w.w2*x2 + w.b) <= 0
             |               THEN y * x2 ELSE 0 END), 0) AS d2,
             |  coalesce(sum(CASE WHEN y * (w.w1*x1 + w.w2*x2 + w.b) <= 0
             |               THEN y ELSE 0 END), 0) AS db
             |  FROM f, w${t - 1} w),
             |w$t AS (SELECT w.w1 + m.d1 AS w1, w.w2 + m.d2 AS w2,
             |          w.b + m.db AS b FROM w${t - 1} w, m$t m)""".stripMargin
        }.mkString(",\n")
        s"""WITH f AS (SELECT $x1 AS x1, n_chars AS x2,
           |    CAST(CASE WHEN 3 * $x1 + n_chars > 700 THEN 1 ELSE -1 END
           |      AS BIGINT) AS y
           |  FROM documents),
           |w0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
           |         CAST(0 AS BIGINT) AS b),
           |$epochs
           |SELECT CAST(w1 AS BIGINT) AS w_x1, CAST(w2 AS BIGINT) AS w_x2,
           |  CAST(b AS BIGINT) AS bias FROM w4""".stripMargin
      }),

    // the train→serve loop closed: learn weights (same 4 epochs), then
    // label every doc scan-side with the learned linear score — per-doc
    // predictions hash-check, proving the in-engine-trained model serves
    // identically in both engines.
    "text_perceptron_apply" -> Q(
      (s, d) => {
        val toks = TextAnalysis.tokenCount(col("text")).cast("long")
        val f = docs(s, d).select(col("doc_id"), toks.as("x1"),
          col("n_chars").as("x2"),
          when(toks * 3 + col("n_chars") > 700, 1L).otherwise(-1L).as("y"))
        val w = TextAnalysis.trainPerceptron(f, Seq("x1", "x2"), "y", 4)
          .collect().head
        f.select(col("doc_id"), col("y"),
          when(col("x1") * w.getLong(0) + col("x2") * w.getLong(1) +
            w.getLong(2) > 0, 1L).otherwise(-1L).as("pred"))
      },
      Some {
        val x1 = "CAST(len(string_split(text, ' ')) AS BIGINT)"
        val epochs = (1 to 4).map { t =>
          s"""m$t AS (SELECT
             |  coalesce(sum(CASE WHEN y * (w.w1*x1 + w.w2*x2 + w.b) <= 0
             |               THEN y * x1 ELSE 0 END), 0) AS d1,
             |  coalesce(sum(CASE WHEN y * (w.w1*x1 + w.w2*x2 + w.b) <= 0
             |               THEN y * x2 ELSE 0 END), 0) AS d2,
             |  coalesce(sum(CASE WHEN y * (w.w1*x1 + w.w2*x2 + w.b) <= 0
             |               THEN y ELSE 0 END), 0) AS db
             |  FROM f, w${t - 1} w),
             |w$t AS (SELECT w.w1 + m.d1 AS w1, w.w2 + m.d2 AS w2,
             |          w.b + m.db AS b FROM w${t - 1} w, m$t m)""".stripMargin
        }.mkString(",\n")
        s"""WITH f AS (SELECT doc_id, $x1 AS x1, n_chars AS x2,
           |    CAST(CASE WHEN 3 * $x1 + n_chars > 700 THEN 1 ELSE -1 END
           |      AS BIGINT) AS y
           |  FROM documents),
           |w0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
           |         CAST(0 AS BIGINT) AS b),
           |$epochs
           |SELECT f.doc_id, f.y,
           |  CAST(CASE WHEN f.x1 * w.w1 + f.x2 * w.w2 + w.b > 0
           |       THEN 1 ELSE -1 END AS BIGINT) AS pred
           |FROM f, w4 w""".stripMargin
      }),

    // blocklist gate (C4 badwords-filter shape): word-boundary blocklist
    // hits on terms planted from doc_id + the keep decision. The
    // non-capturing alternation stays in the Java∩RE2 subset.
    "text_blocklist" -> Q(
      (s, d) => {
        val words = Seq("frak", "smeg", "gorram")
        docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" frak")))
            .when(col("doc_id") % 5 === 0,
              concat(lit("smeg "), col("text"), lit(" smeg")))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          TextAnalysis.blocklistHits(col("text"), words).as("n_blocked"),
          when(TextAnalysis.blocklistHits(col("text"), words) === 0, 1L)
            .otherwise(0L).as("kept"))
      },
      Some(s"""WITH pl AS (SELECT doc_id, CASE
              |    WHEN doc_id % 7 = 0 THEN text || ' frak'
              |    WHEN doc_id % 5 = 0 THEN 'smeg ' || text || ' smeg'
              |    ELSE text END AS text
              |  FROM documents)
              |SELECT doc_id,
              |  ${TextAnalysis.blocklistHitsSql("text", Seq("frak", "smeg", "gorram"))}
              |    AS n_blocked,
              |  CAST(CASE WHEN ${TextAnalysis.blocklistHitsSql("text",
                     Seq("frak", "smeg", "gorram"))} = 0
              |    THEN 1 ELSE 0 END AS BIGINT) AS kept
              |FROM pl""".stripMargin)),

    // fasttext-shape linear quality classifier served scan-side: integer
    // features × integer weights → hash-exact logit; label = logit > 0
    // (sigmoid is monotone, so the threshold needs no exp()). PII is
    // planted on a third of docs so both labels occur.
    "text_classifier" -> Q(
      (s, d) => {
        val m = TextAnalysis.LinearModel(
          bias = 0L, wTokens = 100L, wStop = 500L, wDupFp = -1L, wPii = -2000L)
        docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"),
            lit(" ping admin"), col("doc_id").cast("string"),
            lit("@spam.example or 10.9."), (col("doc_id") % 100).cast("string"),
            lit(".3"))).otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          TextAnalysis.classifierLogit(col("text"), m).as("logit"),
          when(TextAnalysis.classifierLogit(col("text"), m) > 0, 1L)
            .otherwise(0L).as("label"))
      },
      Some {
        val m = TextAnalysis.LinearModel(
          bias = 0L, wTokens = 100L, wStop = 500L, wDupFp = -1L, wPii = -2000L)
        s"""WITH pl AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN
           |    text || ' ping admin' || doc_id || '@spam.example or 10.9.'
           |      || (doc_id % 100) || '.3'
           |    ELSE text END AS text
           |  FROM documents)
           |SELECT doc_id, ${TextAnalysis.classifierLogitSql("text", m)} AS logit,
           |  CAST(CASE WHEN ${TextAnalysis.classifierLogitSql("text", m)} > 0
           |    THEN 1 ELSE 0 END AS BIGINT) AS label
           |FROM pl""".stripMargin
      }),

    // ---------- dedup ----------
    "dedup_exact" -> Q(
      (s, d) => Dedup.exact(docs(s, d), "text", "doc_id"),
      Some("""SELECT text, min(doc_id) AS keep_id, count(*) AS dup_count
             |FROM documents GROUP BY text""".stripMargin)),

    "dedup_exact_hash" -> Q(
      (s, d) => Dedup.exactByHash(docs(s, d), "text", "doc_id"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             |  count(*) AS dup_count
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // duplication profile (growth — the report every dedup run prints):
    // clusters and row coverage by exact-duplicate cluster size. The
    // corpus is unique at small SF, so plant duplicates (the dedup_nfc
    // pattern): every 5th doc twice more, every 25th once more — sizes
    // 1, 3, and 4 in the profile. Second agg input is one row per
    // cluster; output ≤ largest cluster size.
    "dedup_profile" -> Q(
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("text"))
        val planted = base
          .unionByName(base.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
          .unionByName(base.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 200000).as("doc_id"), col("text")))
          .unionByName(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 300000).as("doc_id"), col("text")))
        Dedup.duplicationProfile(planted, "text", "doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 100000, text FROM documents
             |    WHERE doc_id % 5 = 0
             |  UNION ALL SELECT doc_id + 200000, text FROM documents
             |    WHERE doc_id % 5 = 0
             |  UNION ALL SELECT doc_id + 300000, text FROM documents
             |    WHERE doc_id % 25 = 0),
             |c AS (SELECT count(*) AS sz FROM planted GROUP BY md5(text))
             |SELECT sz AS cluster_size, count(*) AS n_clusters,
             |  CAST(sum(sz) AS BIGINT) AS n_rows
             |FROM c GROUP BY sz""".stripMargin)),

    // WHY normalize before dedup: plant a canonical twin of every doc
    // (id+40000, suffix in decomposed NFD while the original's suffix is
    // precomposed NFC — different BYTES, same canonical text). Byte-exact
    // dedup sees 1000 distinct documents; dedup over fixText collapses
    // each twin into its original (keep_id = the lower id, dup_count 2).
    // Both engines apply their own NFC (JDK vs utf8proc) — agreement IS
    // the check.
    "dedup_nfc" -> Q(
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("text"))
        val planted = base
          .select(col("doc_id"), concat(col("text"), lit(" caf\u00e9")).as("text"))
          .unionByName(base.select((col("doc_id") + 40000).as("doc_id"),
            concat(col("text"), lit(" cafe\u0301")).as("text")))
        Dedup.exact(planted.select(col("doc_id"),
          graft.llm.TextAnalysis.fixText(col("text")).as("text")), "text", "doc_id")
      },
      Some(s"""WITH pl AS (
             |  SELECT doc_id, text || ' caf' || chr(233) AS text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 40000 AS doc_id, text || ' cafe' || chr(769) AS text
             |  FROM documents)
             |SELECT ${TextAnalysis.fixTextSql("text")} AS text,
             |  min(doc_id) AS keep_id, count(*) AS dup_count
             |FROM pl GROUP BY 1""".stripMargin)),

    // MinHash+LSH with exact-jaccard verification — must equal the exact
    // pairwise oracle (recall of the 64×2 banding at j≥0.6 is ≈ 1-1e-60).
    "dedup_minhash_lsh" -> Q(
      (s, d) => Dedup.minhashLsh(augmented(s, d), "text", "doc_id", 0.6),
      Some(jaccardOracle(0.6))),

    // Exact posting-list-join jaccard — same answer, different plan shape.
    "dedup_ngram_jaccard" -> Q(
      (s, d) => Dedup.ngramJaccardPairs(augmented(s, d), "text", "doc_id", 0.6),
      Some(jaccardOracle(0.6))),

    // pairs → dedup groups: connected components labeled by min member id
    // (the keep-representative). Oracle = recursive-CTE transitive closure.
    "dedup_clusters" -> Q(
      (s, d) => Dedup.clusters(
        Dedup.minhashLsh(augmented(s, d), "text", "doc_id", 0.6)),
      Some(clustersOracle(0.6))),

    // quality-based representative selection (round-7 growth): keep each
    // cluster's LONGEST member instead of its lowest id — the production
    // curation rule ("keep the best copy"); ties break to the lower id,
    // so the Spark max_by struct argmax and the SQL window agree exactly.
    "dedup_keep_best" -> Q(
      (s, d) => Dedup.keepBest(
        Dedup.clusters(Dedup.minhashLsh(augmented(s, d), "text", "doc_id", 0.6)),
        augmented(s, d).select(col("doc_id"),
          length(col("text")).cast("long").as("score"))),
      Some(s"""WITH RECURSIVE ${jaccardPairsCtes(0.6)},
              |$closureCtes,
              |cl AS (SELECT u AS doc_id, min(w) AS rep FROM reach GROUP BY u),
              |sc AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS sscore
              |       FROM aug),
              |j AS (SELECT cl.rep, cl.doc_id, sc.sscore
              |      FROM cl JOIN sc ON cl.doc_id = sc.doc_id),
              |r AS (SELECT rep, doc_id, row_number() OVER (
              |        PARTITION BY rep ORDER BY sscore DESC, doc_id) AS rn
              |      FROM j)
              |SELECT rep, doc_id AS keep_id FROM r WHERE rn = 1""".stripMargin)),

    // the full cleaning pass wired end-to-end: scan-side quality+langid
    // filters, then near-dup clustering over the survivors, keep reps only.
    "clean_corpus" -> Q(
      (s, d) => graft.llm.Pipeline.cleanCorpus(
        augmented(s, d), "text", "doc_id",
        minQuality = 0.45, lang = "en", jaccardThreshold = 0.6)
        .select("doc_id"),
      Some(cleanCorpusOracle(0.45, "en", 0.6))),

    // the FULL composed pass: quality+langid+repetition gates on the raw
    // (pii-planted) text, PII scrub, then near-dup clustering over the
    // SCRUBBED text, keep representatives — every r4 filter in one
    // hash-checked pipeline. PII is planted per-doc (differing contact
    // lines), so the scrub is what normalizes pair members before dedup.
    "clean_corpus_full" -> Q(
      (s, d) => graft.llm.Pipeline.cleanCorpusFull(
        augmented(s, d).select(col("doc_id"), concat(col("text"),
          lit(" reach user"), col("doc_id").cast("string"),
          lit("@example.com or 10.2."), (col("doc_id") % 200).cast("string"),
          lit(".7 tel 555-867-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text")),
        "text", "doc_id", minQuality = 0.45, lang = "en",
        maxDupTokenFrac = 0.8, jaccardThreshold = 0.6),
      Some {
        // continuation lines must not START with '||': this fragment passes
        // through the enclosing builders' stripMargin calls again, which
        // would strip leading pipes as margins
        val plFil =
          s"""
             |pl AS (SELECT doc_id,
             |    text || ' reach user' || doc_id || '@example.com or 10.2.' ||
             |      (doc_id % 200) || '.7 tel 555-867-' ||
             |      lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
             |  FROM aug),
             |fil AS (SELECT doc_id, ${TextAnalysis.scrubPiiSql("text")} AS text
             |  FROM pl
             |  WHERE ${TextAnalysis.qualityScoreSql("text")} >= 0.45
             |    AND ${TextAnalysis.langIdSql("text")} = 'en'
             |    AND ${TextAnalysis.dupTokenFracSql("text")} <= 0.8),""".stripMargin
        s"""WITH RECURSIVE ${jaccardPairsCtes(0.6, src = "fil", extra = plFil)},
           |$closureCtes,
           |drops AS (SELECT u FROM reach GROUP BY u HAVING min(w) <> u)
           |SELECT doc_id, text FROM fil
           |WHERE doc_id NOT IN (SELECT u FROM drops)""".stripMargin
      }),

    // CROSS-corpus contamination: corpus documents near-duplicating a
    // benchmark (here: 50 first-token-dropped copies, ids 10000-10049) —
    // banded A⋈B join + exact verification, oracled by the exact pairwise
    // cross jaccard. Then the decontamination pass drops them.
    "contam_pairs" -> Q(
      (s, d) => Dedup.crossNearDup(
        docs(s, d).select(col("doc_id"), col("text")),
        augmented(s, d).filter(col("doc_id") >= 10000 && col("doc_id") < 10050),
        "text", "doc_id", 0.6),
      Some(s"""WITH ${crossJaccardCtes(0.6)}
              |SELECT a, b, jaccard FROM jp""".stripMargin)),

    "decontaminate" -> Q(
      (s, d) => graft.llm.Pipeline.decontaminate(
        docs(s, d).select(col("doc_id"), col("text")),
        augmented(s, d).filter(col("doc_id") >= 10000 && col("doc_id") < 10050),
        "text", "doc_id", 0.6).select("doc_id"),
      // NOT EXISTS, not NOT IN: the engine side is a left_anti join, and
      // the two only agree on NULL ids under NOT EXISTS semantics
      Some(s"""WITH ${crossJaccardCtes(0.6)}
              |SELECT doc_id FROM documents d
              |WHERE NOT EXISTS (SELECT 1 FROM jp WHERE jp.a = d.doc_id)""".stripMargin)),

    // EXACT n-gram collision contamination (the GPT-3 appendix-C /
    // Llama-2 eval-overlap rule, 8-grams at fixture length): a corpus doc
    // is hit when ANY of its distinct word 8-grams also occurs in the
    // eval set. The eval fixture is the first-token-dropped copies of
    // docs 0-49, so each source doc shares every 8-gram except its first.
    // Complements whole-document jaccard: an embedded verbatim quote
    // collides here while sitting far below any jaccard threshold.
    "contam_ngram" -> Q(
      (s, d) => Dedup.ngramCollisions(
        docs(s, d).select(col("doc_id"), col("text")),
        augmented(s, d).filter(col("doc_id") >= 10000 && col("doc_id") < 10050),
        "text", "doc_id", n = 8),
      Some(s"""WITH ${ngramCollisionCtes(8)}
              |SELECT doc_id, count(*) AS hits FROM cg
              |WHERE gram IN (SELECT gram FROM evg)
              |GROUP BY doc_id""".stripMargin)),

    // ... the one-row rate REPORT over the same collisions — the data
    // card number; integer per-mille keeps the hash exact.
    "contam_rate" -> Q(
      (s, d) => graft.llm.Pipeline.contaminationReport(
        docs(s, d).select(col("doc_id"), col("text")),
        augmented(s, d).filter(col("doc_id") >= 10000 && col("doc_id") < 10050),
        "text", "doc_id", n = 8),
      Some(s"""WITH ${ngramCollisionCtes(8)},
              |h AS (SELECT doc_id FROM cg
              |      WHERE gram IN (SELECT gram FROM evg) GROUP BY doc_id)
              |SELECT (SELECT count(*) FROM documents) AS n_docs,
              |  (SELECT count(*) FROM h) AS n_contaminated,
              |  (1000 * (SELECT count(*) FROM h)) //
              |    (SELECT count(*) FROM documents) AS permille""".stripMargin)),

    // ... and the decontamination pass over it (drop every hit doc; the
    // hit id set is benchmark-bounded, so the anti-join broadcasts it).
    "decontam_ngram" -> Q(
      (s, d) => graft.llm.Pipeline.decontaminateNgram(
        docs(s, d).select(col("doc_id"), col("text")),
        augmented(s, d).filter(col("doc_id") >= 10000 && col("doc_id") < 10050),
        "text", "doc_id", n = 8).select("doc_id"),
      Some(s"""WITH ${ngramCollisionCtes(8)}
              |SELECT doc_id FROM documents d
              |WHERE NOT EXISTS (SELECT 1 FROM cg
              |  WHERE cg.doc_id = d.doc_id
              |    AND cg.gram IN (SELECT gram FROM evg))""".stripMargin)),

    // snapshot diff (dataset versioning between crawl refreshes): v2 is
    // the corpus with planted removals (id%17=0), edits (id%13=0, text
    // suffixed) and additions (id%11=0 re-added at id+30000); every id is
    // classified added/removed/changed/unchanged off md5 digests — the
    // diff join moves 16-byte hashes, never documents. One full-outer
    // shuffle join; zero exchanges when both snapshots use the id-bucketed
    // layout.
    "corpus_diff" -> Q(
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("text"))
        val v2 = base.filter(col("doc_id") % 17 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
              .otherwise(col("text")).as("text"))
          .unionByName(base.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 30000).as("doc_id"), col("text")))
        Snapshot.diff(base, v2, "doc_id", Seq("text"))
      },
      Some("""WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
             |v2r AS (SELECT doc_id,
             |    CASE WHEN doc_id % 13 = 0 THEN text || ' rev2'
             |         ELSE text END AS text
             |  FROM documents WHERE doc_id % 17 <> 0
             |  UNION ALL
             |  SELECT doc_id + 30000 AS doc_id, text FROM documents
             |  WHERE doc_id % 11 = 0),
             |v2 AS (SELECT doc_id, md5(text) AS h2 FROM v2r)
             |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             |  CASE WHEN v1.doc_id IS NULL THEN 'added'
             |       WHEN v2.doc_id IS NULL THEN 'removed'
             |       WHEN h1 = h2 THEN 'unchanged'
             |       ELSE 'changed' END AS status
             |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin)),

    // Line-level boilerplate removal over a corpus with PLANTED chrome
    // (every doc gains a shared license header, a per-shard footer shared
    // by ~1/5 of docs, and a unique rare line): lines in >= 50 distinct
    // docs are dropped, docs reassembled in original line order. The rare
    // line and the body must survive; header/footers must not.
    "dedup_lines" -> Q(
      (s, d) => Dedup.lineDedup(
        docs(s, d).select(col("doc_id"), concat_ws("\n",
          lit("begin licensed corpus dump"), col("text"),
          concat(lit("shard footer "), (col("doc_id") % 5).cast("string")),
          concat(lit("rare note "), col("doc_id").cast("string"))).as("text")),
        "text", "doc_id", minDocs = 50),
      Some("""WITH pl AS (SELECT doc_id,
             |    'begin licensed corpus dump' || chr(10) || text || chr(10)
             |      || 'shard footer ' || (doc_id % 5) || chr(10)
             |      || 'rare note ' || doc_id AS text
             |  FROM documents),
             |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM pl),
             |lines AS (SELECT doc_id, unnest(l) AS line,
             |            generate_subscripts(l, 1) AS pos
             |          FROM ls),
             |freq AS (SELECT line FROM lines
             |         GROUP BY line HAVING count(DISTINCT doc_id) >= 50),
             |kept AS (SELECT doc_id, pos, line FROM lines
             |         WHERE line NOT IN (SELECT line FROM freq)),
             |rb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t
             |       FROM kept GROUP BY doc_id)
             |SELECT p.doc_id, coalesce(rb.t, '') AS text
             |FROM pl p LEFT JOIN rb ON p.doc_id = rb.doc_id""".stripMargin)),

    // Exact duplicated-span removal (ExactSubstr at 8-token windows) over
    // the augmented corpus: each planted copy shares every window with its
    // original, so copies strip to nothing and each original survives only
    // where no duplicated window covers it. Window extraction, the global
    // count, and the coverage rebuild are all mirrored — hash-checked.
    "dedup_spans" -> Q(
      (s, d) => Dedup.stripDuplicateSpans(augmented(s, d), "text", "doc_id",
        width = 8),
      Some(s"""WITH $augmentedSql,
              |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM aug),
              |wl AS (SELECT doc_id,
              |         list_transform(range(1, greatest(len(toks) - 6, 1)),
              |           i -> array_to_string(toks[i : i + 7], ' ')) AS wins
              |       FROM t),
              |w AS (SELECT doc_id, unnest(wins) AS win,
              |        generate_subscripts(wins, 1) - 1 AS wpos
              |      FROM wl),
              |dw AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
              |ds AS (SELECT doc_id, list(wpos) AS dup_starts FROM w
              |       WHERE win IN (SELECT win FROM dw) GROUP BY doc_id)
              |-- DuckDB array_to_string(empty) is NULL, Spark array_join
              |-- (empty) is '' — coalesce to the Spark semantics
              |SELECT t.doc_id, coalesce(array_to_string(list_transform(
              |    list_filter(range(1, len(t.toks) + 1),
              |      p -> len(list_filter(coalesce(ds.dup_starts,
              |             CAST([] AS BIGINT[])),
              |        s -> s <= p - 1 AND p - 1 < s + 8)) = 0),
              |    p -> t.toks[p]), ' '), '') AS text
              |FROM t LEFT JOIN ds ON t.doc_id = ds.doc_id""".stripMargin)),

    // SimHash banding (xxhash-based signature — not DuckDB-expressible, so
    // rows-only there) with an EXACT in-path cross-check that Verify runs:
    // pigeonhole banding over maxDist+1 chunks has recall 1 by construction,
    // so the banded pairs must equal a brute-force hamming join over the
    // signatures. The O(n²) check only runs at t2-fixture scale; production
    // scale keeps the banded plan alone.
    "dedup_simhash" -> Q(
      (s, d) => {
        val pairs = Dedup.simhashPairs(augmented(s, d), "text", "doc_id", maxDist = 3)
        // size gate: memoized base-table count (augmented = 2× documents) —
        // zero per-invocation scan cost, so the production plan's bench
        // number is the banded join alone.
        if (Tables.rowCount(s, d, "documents") * 2 <= 2500) {
          val sigs = Dedup.simhash(augmented(s, d), "text", "doc_id")
          val l = sigs.select(col("doc_id").as("a"), col("simhash").as("sa"))
          val r = sigs.select(col("doc_id").as("b"), col("simhash").as("sb"))
          val brute = l.join(r, col("a") < col("b"))
            .select(col("a"), col("b"),
              bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
            .filter(col("hamming") <= 3)
          val extra = pairs.exceptAll(brute).count()
          val missing = brute.exceptAll(pairs).count()
          require(extra == 0 && missing == 0,
            s"simhash banding != brute-force hamming: +$extra -$missing")
        }
        pairs
      },
      None),

    // ---------- embeddings ----------
    "embed_near_dup" -> Q(
      (s, d) => Similarity.embeddingNearDup(emb(s, d), 0.4),
      Some(s"""WITH $cosineNormsCte,
              |p AS (SELECT x.vec_id AS a, y.vec_id AS b,
              |        ${cosExpr("x", "y")} AS c
              |      FROM n x JOIN n y ON x.vec_id < y.vec_id)
              |SELECT a, b, round(c, 5) AS cos FROM p
              |WHERE NOT isnan(round(c, 5)) AND round(c, 5) >= 0.4""".stripMargin)),

    // SemDeDup-style semantic dedup, hash-checked END TO END at iters=0:
    // IVF-cluster the embedding space (centroids = first 16 vectors by id),
    // pair intra-cluster vectors at cosine >= 0.4, collapse components,
    // keep min-id representatives. The oracle reproduces clustering,
    // pairing, and the transitive closure.
    "semantic_dedup" -> Q(
      (s, d) => Similarity.semanticDedup(emb(s, d), threshold = 0.4,
        nlist = 16, iters = 0).select("vec_id"),
      Some(s"""WITH RECURSIVE $cosineNormsCte,
              |c AS (SELECT vec_id AS cid, embedding, nrm FROM n
              |      ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c) WHERE arn = 1),
              |jp AS (SELECT ax.nid AS a, ay.nid AS b
              |       FROM asg ax
              |       JOIN asg ay ON ax.cid = ay.cid AND ax.nid < ay.nid
              |       JOIN n x ON x.vec_id = ax.nid
              |       JOIN n y ON y.vec_id = ay.nid
              |       -- NaN (zero-norm vectors) must FAIL the threshold like
              |       -- the engine's !isnan guard — DuckDB orders NaN high
              |       WHERE NOT isnan(round(${cosExpr("x", "y")}, 5))
              |         AND round(${cosExpr("x", "y")}, 5) >= 0.4),
              |$closureCtes,
              |drops AS (SELECT u FROM reach GROUP BY u HAVING min(w) <> u)
              |SELECT vec_id FROM embeddings
              |WHERE vec_id NOT IN (SELECT u FROM drops)""".stripMargin)),

    // distributed BPE vocabulary learning (Sennrich 2016): 8 merge rules
    // from the documents corpus, exact integer pair counts with
    // lexicographic tie-breaks. The oracle UNROLLS the 8 iterations as
    // CTE chains — pair-count → deterministic argmax → list_reduce
    // merge-fold, the same greedy left-to-right fold the engine codegens.
    "bpe_train" -> Q(
      (s, d) => graft.llm.Bpe.train(docs(s, d), "text", nMerges = 8),
      Some(bpeOracleSql(8))),

    // end-to-end BPE encode: train 4 merges, then tokenize every doc
    // with the learned rules — the oracle re-learns the same merges in
    // SQL and applies the SAME nested greedy folds per word (list_reduce
    // inside list_transform). Final projection space-joins the token
    // array so the comparator sees a scalar string (arrays crash its
    // pandas sort); the join is lossless since tokens never hold ' '.
    "bpe_encode" -> Q(
      (s, d) => {
        val m = graft.llm.Bpe.train(docs(s, d), "text", nMerges = 4)
          .orderBy("step").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.llm.Bpe.encode(docs(s, d), "text", "doc_id", m)
          .select(col("doc_id"), concat_ws(" ", col("tokens")).as("tokens"))
      },
      Some(bpeEncodeOracleSql(4))),

    // signed random projection 64 → 16 dims (Achlioptas ±1 JL) in exact
    // fixed-point integers: quantize each component, sum with hash-parity
    // signs — bit-identical across engines/partitionings, so the reduced
    // vectors hash-check whole. The cheap-prefilter leg of a
    // project→shortlist→exact-rerank serving stack.
    // comma-joined rendering of the 16 integer components keeps the
    // comparator array-free without losing a bit of the fixed-point hash.
    "embed_rp" -> Q(
      (s, d) => Similarity.randomProject(emb(s, d), inDim = 64, outDim = 16)
        .select(col("vec_id"),
          concat_ws(",", transform(col("rp"), _.cast("string"))).as("rp")),
      Some(s"""SELECT vec_id,
              |  array_to_string(${Similarity.randomProjectSql("embedding", 64, 16)},
              |                  ',') AS rp
              |FROM embeddings""".stripMargin)),

    "ann_topk" -> Q(
      (s, d) => Similarity.bruteForceTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3),
      Some(s"""WITH $cosineNormsCte,
              |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
              |        round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM n q JOIN n x ON q.vec_id <> x.vec_id
              |      WHERE q.vec_id < 5),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // MMR diversified rerank (growth — the standard pass between ANN
    // retrieval and a RAG context window): greedy
    // argmax λ·rel − (1−λ)·max-sim-to-selected over each query's top-20
    // cosine pool, k=5, λ=70%. Scores quantized to integers (1e5·cos, the
    // ann_topk rounding contract) with min-id tie-breaks, so the greedy is
    // exact arithmetic — the oracle UNROLLS the same k-step selection in
    // SQL (each step: anti-join out the selected, aggregate max-sim
    // against them, argmax by row_number).
    "ann_mmr" -> Q(
      (s, d) => Similarity.mmrRerank(
        emb(s, d), emb(s, d).filter(col("vec_id") < 3),
        poolK = 20, k = 5, lambdaPct = 70),
      Some(mmrOracleSql(nQueries = 3, poolK = 20, k = 5, lam = 70))),

    // hybrid retrieval (growth): BM25 lexical leg + brute-force cosine
    // vector leg, fused by reciprocal-rank fusion in EXACT integer
    // arithmetic (scale div (60 + rank)) — the fused scores hash-check
    // bit-for-bit. Legs at depth 20, fused top-10; doc_id ↔ vec_id is the
    // shared id space. The oracle recomputes both legs (bm25 mirror SQL +
    // the round-before-rank cosine CTE) and the same integer fusion.
    "hybrid_rrf" -> Q(
      (s, d) => Retrieval.hybridTopK(
        Tables.t(s, d, "documents"), emb(s, d),
        textQuery = "dup merge stream", queryVecId = 7L, k = 10, kEach = 20),
      Some(s"""WITH lex AS (
              |  SELECT doc_id AS _id,
              |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
              |  FROM (${graft.fts.Fts.bm25OracleSql(
                 "documents", "doc_id", "text", "dup merge stream", k = 20)})),
              |$cosineNormsCte,
              |vec AS (SELECT nid AS _id, rn AS rank FROM (
              |    SELECT x.vec_id AS nid,
              |      row_number() OVER (ORDER BY
              |        round(${cosExpr("q", "x")}, 5) DESC, x.vec_id) AS rn
              |    FROM n q JOIN n x ON q.vec_id <> x.vec_id
              |    WHERE q.vec_id = 7) WHERE rn <= 20),
              |u AS (SELECT * FROM lex UNION ALL SELECT * FROM vec),
              |f AS (SELECT _id,
              |    CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf
              |  FROM u GROUP BY _id)
              |SELECT _id AS doc_id, rrf FROM f
              |ORDER BY rrf DESC, _id LIMIT 10""".stripMargin)),

    // LSH-bucketed ANN — scale path; recall vs brute force asserted in
    // ScalaTest. The bucket planes are DETERMINISTIC (splitmix-mixed
    // coefficients), so the oracle inlines the exact same plane values as
    // list literals and reproduces the bucket equi-join bit-for-bit —
    // a fully hash-checked approximate operator.
    "ann_lsh" -> Q(
      (s, d) => Similarity.lshTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3, dims = 64, planes = 4),
      Some(s"""WITH $cosineNormsCte,
              |b AS (SELECT vec_id, embedding, nrm,
              |        ${lshBucketSql(dims = 64, planes = 4)} AS bucket
              |      FROM n),
              |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
              |        round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM b q JOIN b x
              |        ON q.bucket = x.bucket AND q.vec_id <> x.vec_id
              |      WHERE q.vec_id < 5),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // int8-quantized ANN: per-vector scale = maxAbs/127, elements rounded
    // into [-127,127]; cosine is scale-invariant so ranking runs on the raw
    // int arrays (4x less scan I/O). The quantization arithmetic is
    // mirrored exactly (same divisions, same HALF_UP rounding, same
    // ascending fold), so even the quantized approximate operator is
    // hash-checked.
    "ann_quantized" -> Q(
      (s, d) => Similarity.quantizedTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3),
      Some("""WITH fe AS (SELECT vec_id,
             |        list_transform(embedding, x -> CASE
             |          WHEN isnan(x::DOUBLE) OR isinf(x::DOUBLE) THEN 0.0
             |          ELSE x::DOUBLE END) AS emb
             |      FROM embeddings),
             |mx AS (SELECT vec_id,
             |        list_max(list_transform(emb, x -> abs(x))) AS ma
             |      FROM fe),
             |z AS (SELECT e.vec_id,
             |        CASE WHEN m.ma = 0 THEN list_transform(e.emb, x -> 0)
             |             ELSE list_transform(e.emb,
             |               x -> CAST(round(x / (m.ma / 127.0), 0) AS INTEGER))
             |        END AS qv
             |      FROM fe e JOIN mx m USING (vec_id)),
             |nq AS (SELECT vec_id, qv,
             |        sqrt(list_sum(list_transform(qv, v -> v::DOUBLE * v::DOUBLE))) AS nrm
             |      FROM z),
             |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
             |        round(list_sum(list_transform(range(1, 65),
             |          i -> q.qv[i]::DOUBLE * x.qv[i]::DOUBLE)) / (q.nrm * x.nrm), 5) AS cos
             |      FROM nq q JOIN nq x ON q.vec_id <> x.vec_id
             |      WHERE q.vec_id < 5),
             |r AS (SELECT qid, nid, cos,
             |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
             |      FROM p)
             |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // Product-quantization ANN (Jégou 2011 / FAISS PQ): m=4 subspaces ×
    // ksub=8 codewords each; a vector's code is its per-subspace L2-nearest
    // codeword, ranking is cosine against the reconstruction via the
    // per-query ADC lookup table. At iters=0 codebook j is the j-th 16-dim
    // slice of the first 8 vectors by id, so DuckDB reproduces codebooks,
    // encoding, the ADC sums (ordered list folds mirror the engine's
    // ascending-j loops) and ranking bit-for-bit — the whole PQ pipeline is
    // hash-checked; Lloyd's-refined recall is LlmSpec-asserted.
    "ann_pq" -> Q(
      (s, d) => Similarity.pqTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3, m = 4,
        ksub = 8, iters = 0),
      Some("""WITH n AS (SELECT vec_id, embedding,
             |        sqrt(list_sum(list_transform(embedding,
             |          x -> x::DOUBLE * x::DOUBLE))) AS nrm
             |      FROM embeddings),
             |js AS (SELECT unnest(range(0, 4)) AS j),
             |sv AS (SELECT x.vec_id, s.j,
             |        list_transform(list_slice(x.embedding, s.j*16+1, s.j*16+16),
             |          e -> e::DOUBLE) AS sv
             |      FROM embeddings x, js s),
             |cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
             |       FROM (SELECT vec_id, embedding FROM embeddings
             |             ORDER BY vec_id LIMIT 8)),
             |cw AS (SELECT c.cid, s.j,
             |        list_transform(list_slice(c.embedding, s.j*16+1, s.j*16+16),
             |          e -> e::DOUBLE) AS sv
             |      FROM cb0 c, js s),
             |asg AS (SELECT vec_id, j, cid FROM (
             |    SELECT x.vec_id, x.j, w.cid,
             |      row_number() OVER (PARTITION BY x.vec_id, x.j
             |        ORDER BY list_sum(list_transform(range(1, 17),
             |          i -> (x.sv[i] - w.sv[i]) * (x.sv[i] - w.sv[i]))), w.cid) AS arn
             |    FROM sv x JOIN cw w ON x.j = w.j) WHERE arn = 1),
             |parts AS (SELECT q.vec_id AS qid, a.vec_id AS nid, a.j,
             |        q.nrm AS qnrm,
             |        list_sum(list_transform(range(1, 17),
             |          i -> qx.sv[i] * w.sv[i])) AS qd,
             |        list_sum(list_transform(range(1, 17),
             |          i -> w.sv[i] * w.sv[i])) AS cn2
             |      FROM n q
             |      JOIN sv qx ON qx.vec_id = q.vec_id
             |      JOIN asg a ON a.j = qx.j AND a.vec_id <> q.vec_id
             |      JOIN cw w ON w.j = a.j AND w.cid = a.cid
             |      WHERE q.vec_id < 5),
             |p AS (SELECT qid, nid,
             |        round(list_sum(list(qd ORDER BY j)) /
             |          (max(qnrm) * sqrt(list_sum(list(cn2 ORDER BY j)))), 5) AS cos
             |      FROM parts GROUP BY qid, nid),
             |r AS (SELECT qid, nid, cos,
             |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
             |      FROM p)
             |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // IVF-PQ (FAISS IndexIVFPQ shape): coarse probing routes each query to
    // nprobe lists, PQ ADC scores the codes inside them — the oracle is
    // literally the ann_ivf_flat coarse CTEs composed with the ann_pq
    // codebook/ADC CTEs, restricted to the probed candidate pairs, so the
    // doubly-approximate operator is STILL hash-checked end to end.
    "ann_ivfpq" -> Q(
      (s, d) => Similarity.ivfPqTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3,
        nlist = 16, nprobe = 4, m = 4, ksub = 8, iters = 0),
      Some(s"""WITH $cosineNormsCte,
              |c AS (SELECT vec_id AS cid, embedding, nrm FROM n
              |      ORDER BY vec_id LIMIT 16),
              |casg AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c) WHERE arn = 1),
              |probes AS (SELECT qid, cid FROM (
              |    SELECT q.vec_id AS qid, c.cid,
              |      row_number() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${cosExpr("q", "c")} DESC, c.cid) AS prn
              |    FROM n q, c WHERE q.vec_id < 5) WHERE prn <= 4),
              |js AS (SELECT unnest(range(0, 4)) AS j),
              |sv AS (SELECT x.vec_id, s.j,
              |        list_transform(list_slice(x.embedding, s.j*16+1, s.j*16+16),
              |          e -> e::DOUBLE) AS sv
              |      FROM embeddings x, js s),
              |cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
              |       FROM (SELECT vec_id, embedding FROM embeddings
              |             ORDER BY vec_id LIMIT 8)),
              |cw AS (SELECT c2.cid, s.j,
              |        list_transform(list_slice(c2.embedding, s.j*16+1, s.j*16+16),
              |          e -> e::DOUBLE) AS sv
              |      FROM cb0 c2, js s),
              |pqasg AS (SELECT vec_id, j, cid FROM (
              |    SELECT x.vec_id, x.j, w.cid,
              |      row_number() OVER (PARTITION BY x.vec_id, x.j
              |        ORDER BY list_sum(list_transform(range(1, 17),
              |          i -> (x.sv[i] - w.sv[i]) * (x.sv[i] - w.sv[i]))), w.cid) AS arn
              |    FROM sv x JOIN cw w ON x.j = w.j) WHERE arn = 1),
              |cand AS (SELECT pr.qid, a2.nid FROM probes pr
              |         JOIN casg a2 ON a2.cid = pr.cid
              |         WHERE a2.nid <> pr.qid),
              |parts AS (SELECT p2.qid, p2.nid, a.j, q.nrm AS qnrm,
              |        list_sum(list_transform(range(1, 17),
              |          i -> qx.sv[i] * w.sv[i])) AS qd,
              |        list_sum(list_transform(range(1, 17),
              |          i -> w.sv[i] * w.sv[i])) AS cn2
              |      FROM cand p2
              |      JOIN n q ON q.vec_id = p2.qid
              |      JOIN sv qx ON qx.vec_id = p2.qid
              |      JOIN pqasg a ON a.vec_id = p2.nid AND a.j = qx.j
              |      JOIN cw w ON w.j = a.j AND w.cid = a.cid),
              |p AS (SELECT qid, nid,
              |        round(list_sum(list(qd ORDER BY j)) /
              |          (max(qnrm) * sqrt(list_sum(list(cn2 ORDER BY j)))), 5) AS cos
              |      FROM parts GROUP BY qid, nid),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // Multi-probe LSH: own bucket + every Hamming-1 neighbor (one plane
    // flipped). The probe set is a pure function of the bucket id, so the
    // recall-boosted approximate operator is STILL hash-checked — the
    // oracle unions xor(bucket, 1<<p) probes over the same inlined planes.
    "ann_lsh_multiprobe" -> Q(
      (s, d) => Similarity.lshMultiProbeTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3, dims = 64, planes = 4),
      Some {
        val probeUnion = (0 until 4).map(p =>
          s"SELECT qid, embedding, nrm, xor(bucket, ${1L << p}) AS bucket FROM pr")
          .mkString("\n  UNION ALL ")
        s"""WITH $cosineNormsCte,
           |b AS (SELECT vec_id, embedding, nrm,
           |        ${lshBucketSql(dims = 64, planes = 4)} AS bucket
           |      FROM n),
           |pr AS (SELECT vec_id AS qid, embedding, nrm, bucket FROM b
           |       WHERE vec_id < 5),
           |probes AS (SELECT qid, embedding, nrm, bucket FROM pr
           |  UNION ALL $probeUnion),
           |p AS (SELECT q.qid, x.vec_id AS nid,
           |        round(${cosExpr("q", "x")}, 5) AS cos
           |      FROM probes q JOIN b x
           |        ON q.bucket = x.bucket AND q.qid <> x.vec_id),
           |r AS (SELECT qid, nid, cos,
           |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
           |      FROM p)
           |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin
      }),

    // IVF ANN (k-means coarse quantizer + nprobe lists) — the other scale
    // path; recall asserted in ScalaTest, rows-only here (trained centroids
    // aren't SQL-expressible; the MACHINERY is hash-checked by ann_ivf_flat).
    "ann_ivf" -> Q(
      (s, d) => Similarity.ivfTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3),
      None),

    // IVF with iters=0: centroids are literally the first nlist vectors by
    // id, so DuckDB reproduces the ENTIRE pipeline — nearest-centroid
    // assignment (ties to the lower centroid), nprobe probing, exact-cosine
    // ranking — and the full IVF machinery is hash-checked. Only Lloyd's
    // refinement (ann_ivf) stays rows-only.
    "ann_ivf_flat" -> Q(
      (s, d) => Similarity.ivfTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3,
        nlist = 16, nprobe = 4, iters = 0),
      Some(s"""WITH $cosineNormsCte,
              |c AS (SELECT vec_id AS cid, embedding, nrm FROM n
              |      ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c) WHERE arn = 1),
              |probes AS (SELECT qid, cid FROM (
              |    SELECT q.vec_id AS qid, c.cid,
              |      row_number() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${cosExpr("q", "c")} DESC, c.cid) AS prn
              |    FROM n q, c WHERE q.vec_id < 5) WHERE prn <= 4),
              |p AS (SELECT pr.qid, a.nid, round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM probes pr
              |      JOIN asg a ON a.cid = pr.cid
              |      JOIN n q ON q.vec_id = pr.qid
              |      JOIN n x ON x.vec_id = a.nid
              |      WHERE a.nid <> pr.qid),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // IVF index AT REST (round-5 growth): train once, persist centroids +
    // list-partitioned assignments, serve the query batch from parquet
    // with static partition pruning over the probed lists. At iters=0 the
    // whole persisted pipeline is the ann_ivf_flat SQL — so the
    // train→write→read→probe→rank round-trip is hash-checked end to end.
    // IVF index APPEND (FAISS add): index built over the EVEN half,
    // odd half appended against the frozen centroids — then a full-probe
    // (nprobe = nlist) serve is an exact scan of the grown corpus, so the
    // routed round-trip hash-checks against plain brute-force top-k SQL
    // (centroid choice cancels out at full probe; pruned-probe equality
    // and the immediately-servable property are LlmSpec-asserted).
    "ann_ivf_append" -> Q(
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ivfa").toString
        Similarity.writeIvfIndex(emb(s, d).filter(col("vec_id") % 2 === 0),
          s"$tmp/idx", nlist = 16, iters = 0)
        Similarity.appendToIvfIndex(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") % 2 === 1))
        Similarity.ivfTopKFromIndex(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") < 5), k = 3, nprobe = 16)
      },
      Some(s"""WITH $cosineNormsCte,
              |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
              |        round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM n q JOIN n x ON q.vec_id <> x.vec_id
              |      WHERE q.vec_id < 5),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // drift-triggered retrain (round-7 growth — closes the frozen-
    // centroid serving loop): the appended half measures its assignment
    // drift against the stored training baseline and, past the
    // threshold (forced here for determinism), re-trains over the grown
    // index IN PLACE from the index's own rows — crash-safe swap, fresh
    // centroids/lists/baseline. Full probing makes the oracle the
    // brute-force top-k over the grown corpus (centroid choice cancels
    // out); the threshold's fire/no-fire behavior and the pruned-probe
    // recall recovery are LlmSpec-asserted on a drifted fixture.
    "ann_ivf_retrain" -> Q(
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ivfr").toString
        Similarity.writeIvfIndex(emb(s, d).filter(col("vec_id") % 2 === 0),
          s"$tmp/idx", nlist = 16, iters = 2)
        Similarity.appendToIvfIndexWithRetrain(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") % 2 === 1),
          retrainBelow = 2.0, // force the retrain arm deterministically
          nlist = 16, iters = 2)
        Similarity.ivfTopKFromIndex(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") < 5), k = 3, nprobe = 16)
      },
      Some(s"""WITH $cosineNormsCte,
              |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
              |        round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM n q JOIN n x ON q.vec_id <> x.vec_id
              |      WHERE q.vec_id < 5),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // DELETE from the persisted index (FAISS remove_ids): tombstoned ids
    // vanish from serving without any list rewrite; full probing makes
    // the oracle the brute-force top-k over the SURVIVING corpus.
    "ann_ivf_delete" -> Q(
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ivfd").toString
        Similarity.writeIvfIndex(emb(s, d), s"$tmp/idx", nlist = 16, iters = 0)
        Similarity.deleteFromIvfIndex(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") % 3 === 0))
        Similarity.ivfTopKFromIndex(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") < 5), k = 3, nprobe = 16)
      },
      Some(s"""WITH $cosineNormsCte,
              |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
              |        round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM n q JOIN n x ON q.vec_id <> x.vec_id
              |      WHERE q.vec_id < 5 AND x.vec_id % 3 <> 0),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    "ann_ivf_index" -> Q(
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ivf").toString
        Similarity.writeIvfIndex(emb(s, d), s"$tmp/idx", nlist = 16, iters = 0)
        Similarity.ivfTopKFromIndex(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") < 5), k = 3, nprobe = 4)
      },
      Some(s"""WITH $cosineNormsCte,
              |c AS (SELECT vec_id AS cid, embedding, nrm FROM n
              |      ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c) WHERE arn = 1),
              |probes AS (SELECT qid, cid FROM (
              |    SELECT q.vec_id AS qid, c.cid,
              |      row_number() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${cosExpr("q", "c")} DESC, c.cid) AS prn
              |    FROM n q, c WHERE q.vec_id < 5) WHERE prn <= 4),
              |p AS (SELECT pr.qid, a.nid, round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM probes pr
              |      JOIN asg a ON a.cid = pr.cid
              |      JOIN n q ON q.vec_id = pr.qid
              |      JOIN n x ON x.vec_id = a.nid
              |      WHERE a.nid <> pr.qid),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // FILTERED index serving (FAISS IDSelector / metadata-filter shape):
    // same persisted pipeline, neighbors restricted to vec_id % 3 = 0 by
    // a broadcast semi-join after partition pruning — the oracle is the
    // ann_ivf_index SQL with the predicate on the neighbor side.
    "ann_ivf_filtered" -> Q(
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_f").toString
        Similarity.writeIvfIndex(emb(s, d), s"$tmp/idx", nlist = 16, iters = 0)
        Similarity.ivfTopKFromIndex(s, s"$tmp/idx",
          emb(s, d).filter(col("vec_id") < 5), k = 3, nprobe = 4,
          allowed = Some(emb(s, d).filter(col("vec_id") % 3 === 0)
            .select(col("vec_id"))))
      },
      Some(s"""WITH $cosineNormsCte,
              |c AS (SELECT vec_id AS cid, embedding, nrm FROM n
              |      ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c) WHERE arn = 1),
              |probes AS (SELECT qid, cid FROM (
              |    SELECT q.vec_id AS qid, c.cid,
              |      row_number() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${cosExpr("q", "c")} DESC, c.cid) AS prn
              |    FROM n q, c WHERE q.vec_id < 5) WHERE prn <= 4),
              |p AS (SELECT pr.qid, a.nid, round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM probes pr
              |      JOIN asg a ON a.cid = pr.cid
              |      JOIN n q ON q.vec_id = pr.qid
              |      JOIN n x ON x.vec_id = a.nid
              |      WHERE a.nid <> pr.qid AND a.nid % 3 = 0),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // IVF with iters=1 over the FULL training set: one Lloyd step is
    // SQL-expressible — new centroid = per-list element-wise mean of the
    // vectors assigned under the iters=0 centroids (summed in ascending-id
    // order, the trainer's exact fold order), empty lists keep their seed
    // centroid. This hash-checks the TRAINED path one step further than
    // ann_ivf_flat; only the iterated fixpoint (ann_ivf) stays rows-only.
    "ann_ivf_lloyd1" -> Q(
      (s, d) => Similarity.ivfTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3,
        nlist = 16, nprobe = 4, iters = 1),
      Some(s"""WITH $cosineNormsCte,
              |c0 AS (SELECT vec_id AS cid, embedding, nrm FROM n
              |       ORDER BY vec_id LIMIT 16),
              |a0 AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c0 c) WHERE arn = 1),
              |dims AS (SELECT a.cid, t.i,
              |      list_sum(list(x.embedding[t.i]::DOUBLE ORDER BY a.nid))
              |        / count(*) AS v
              |    FROM a0 a JOIN n x ON x.vec_id = a.nid, range(1, 65) t(i)
              |    GROUP BY a.cid, t.i),
              |c1e AS (SELECT cid, list(v ORDER BY i) AS emb FROM dims GROUP BY cid),
              |c1 AS (SELECT c0.cid,
              |      coalesce(c1e.emb,
              |        list_transform(c0.embedding, x -> x::DOUBLE)) AS embedding,
              |      sqrt(list_sum(list_transform(coalesce(c1e.emb,
              |        list_transform(c0.embedding, x -> x::DOUBLE)),
              |        y -> y * y))) AS nrm
              |    FROM c0 LEFT JOIN c1e ON c0.cid = c1e.cid),
              |asg AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c1 c) WHERE arn = 1),
              |probes AS (SELECT qid, cid FROM (
              |    SELECT q.vec_id AS qid, c.cid,
              |      row_number() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${cosExpr("q", "c")} DESC, c.cid) AS prn
              |    FROM n q, c1 c WHERE q.vec_id < 5) WHERE prn <= 4),
              |p AS (SELECT pr.qid, a.nid, round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM probes pr
              |      JOIN asg a ON a.cid = pr.cid
              |      JOIN n q ON q.vec_id = pr.qid
              |      JOIN n x ON x.vec_id = a.nid
              |      WHERE a.nid <> pr.qid),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // IVF with iters=2 (round-5 growth on the lloyd1 CTE): the second
    // Lloyd round is one more assignment→mean pair — a1 assigns under c1,
    // c2 = per-list mean of a1 (empty lists keep their c1 centroid, which
    // is itself the seed if the list was empty before). Narrows the
    // rows-only gap to the iterated fixpoint alone (ann_ivf at iters=5).
    "ann_ivf_lloyd2" -> Q(
      (s, d) => Similarity.ivfTopK(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 3,
        nlist = 16, nprobe = 4, iters = 2),
      Some(s"""WITH $cosineNormsCte,
              |c0 AS (SELECT vec_id AS cid, embedding, nrm FROM n
              |       ORDER BY vec_id LIMIT 16),
              |a0 AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c0 c) WHERE arn = 1),
              |dims AS (SELECT a.cid, t.i,
              |      list_sum(list(x.embedding[t.i]::DOUBLE ORDER BY a.nid))
              |        / count(*) AS v
              |    FROM a0 a JOIN n x ON x.vec_id = a.nid, range(1, 65) t(i)
              |    GROUP BY a.cid, t.i),
              |c1e AS (SELECT cid, list(v ORDER BY i) AS emb FROM dims GROUP BY cid),
              |c1 AS (SELECT c0.cid,
              |      coalesce(c1e.emb,
              |        list_transform(c0.embedding, x -> x::DOUBLE)) AS embedding,
              |      sqrt(list_sum(list_transform(coalesce(c1e.emb,
              |        list_transform(c0.embedding, x -> x::DOUBLE)),
              |        y -> y * y))) AS nrm
              |    FROM c0 LEFT JOIN c1e ON c0.cid = c1e.cid),
              |a1 AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c1 c) WHERE arn = 1),
              |dims2 AS (SELECT a.cid, t.i,
              |      list_sum(list(x.embedding[t.i]::DOUBLE ORDER BY a.nid))
              |        / count(*) AS v
              |    FROM a1 a JOIN n x ON x.vec_id = a.nid, range(1, 65) t(i)
              |    GROUP BY a.cid, t.i),
              |c2e AS (SELECT cid, list(v ORDER BY i) AS emb FROM dims2 GROUP BY cid),
              |c2 AS (SELECT c1.cid,
              |      coalesce(c2e.emb, c1.embedding) AS embedding,
              |      sqrt(list_sum(list_transform(coalesce(c2e.emb, c1.embedding),
              |        y -> y * y))) AS nrm
              |    FROM c1 LEFT JOIN c2e ON c1.cid = c2e.cid),
              |asg AS (SELECT nid, cid FROM (
              |    SELECT x.vec_id AS nid, c.cid,
              |      row_number() OVER (PARTITION BY x.vec_id
              |        ORDER BY ${cosExpr("x", "c")} DESC, c.cid) AS arn
              |    FROM n x, c2 c) WHERE arn = 1),
              |probes AS (SELECT qid, cid FROM (
              |    SELECT q.vec_id AS qid, c.cid,
              |      row_number() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${cosExpr("q", "c")} DESC, c.cid) AS prn
              |    FROM n q, c2 c WHERE q.vec_id < 5) WHERE prn <= 4),
              |p AS (SELECT pr.qid, a.nid, round(${cosExpr("q", "x")}, 5) AS cos
              |      FROM probes pr
              |      JOIN asg a ON a.cid = pr.cid
              |      JOIN n q ON q.vec_id = pr.qid
              |      JOIN n x ON x.vec_id = a.nid
              |      WHERE a.nid <> pr.qid),
              |r AS (SELECT qid, nid, cos,
              |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |      FROM p)
              |SELECT qid, nid, cos, rn FROM r WHERE rn <= 3""".stripMargin)),

    // ---------- sampling / packing ----------
    // deterministic hash-membership sampling (data mixing): the kept set is
    // a pure function of the id — reproducible across runs/partitionings,
    // nested across rates. The arith mixer is exact integer arithmetic in
    // both engines, so the sample is hash-checked bit-for-bit.
    "sample_arith" -> Q(
      (s, d) => Sampling.arithSample(docs(s, d), "doc_id", permille = 100)
        .select("doc_id"),
      Some("SELECT doc_id FROM documents WHERE " +
        Sampling.arithSampleSql("doc_id", 100))),

    // train/val/test split (growth): deterministic id-keyed assignment —
    // a scan-side CASE over the arithmetic bucket, zero shuffles; the
    // train set at 900‰ is exactly arithSample(900)'s keep set.
    "sample_split" -> Q(
      (s, d) => Sampling.splitAssign(docs(s, d), "doc_id",
        trainPermille = 900, valPermille = 50).select("doc_id", "split"),
      Some("SELECT doc_id, " +
        Sampling.splitAssignSql("doc_id", 900, 50) +
        " AS split FROM documents")),

    // stratified rates per l_returnflag — one scan-side CASE filter; the
    // data-mixing pass (downsample one stratum, upsample another) at I/O
    // rate.
    "sample_stratified" -> Q(
      (s, d) => Sampling.stratifiedSample(Tables.t(s, d, "lineitem"),
        "l_returnflag", "l_orderkey",
        Map("A" -> 50, "N" -> 200, "R" -> 500))
        .select("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE " +
        Sampling.stratifiedSampleSql("l_returnflag", "l_orderkey",
          Map("A" -> 50, "N" -> 200, "R" -> 500)))),

    // token-BUDGET mixing: per-language token allowances (the way
    // pretraining mixtures are actually specified), admission in
    // deterministic (arithBucket, id) order until each stratum's budget is
    // spent — one window shuffle, hash-checked bit-for-bit.
    "sample_token_budget" -> Q(
      (s, d) => Sampling.tokenBudgetSample(
        docs(s, d).select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("lang"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        "lang", "doc_id", "n_tokens",
        Map("en" -> 5000L, "fr" -> 2000L, "de" -> 1000L))
        .select("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id,
              |    ${TextAnalysis.langIdSql("text")} AS lang,
              |    ${TextAnalysis.tokenCountSql("text")} AS n_tokens
              |  FROM documents)
              |SELECT doc_id FROM t
              |QUALIFY ${Sampling.tokenBudgetSampleSql("lang", "doc_id",
                  "n_tokens", Map("en" -> 5000L, "fr" -> 2000L, "de" -> 1000L))}
              |""".stripMargin)),

    // TEMPERATURE mixing (α = 0.5) over the real lang column (en is ~3×
    // any other language here): per-language doc slots ∝ ⌊√n⌋, filled in
    // deterministic (arithBucket, id) order. sqrt is IEEE-correctly-
    // rounded in both engines and everything else is integer arithmetic,
    // so the rebalanced subset hash-matches bit-for-bit.
    "sample_temperature" -> Q(
      (s, d) => Sampling.temperatureSample(
        docs(s, d).select("doc_id", "lang"), "lang", "doc_id", budget = 200L),
      Some(Sampling.temperatureSampleSql(
        "(SELECT doc_id, lang FROM documents)", "doc_id, lang",
        "lang", "doc_id", 200L))),

    // CURRICULUM interleave (stride scheduling applied to data mixing):
    // every doc gets a global training position with languages appearing
    // proportionally to their weights at EVERY point of the epoch (not in
    // concatenated blocks). Exact integer virtual times — the full
    // position assignment hash-checks.
    "sample_curriculum" -> Q(
      (s, d) => Sampling.curriculumOrder(
        docs(s, d).select("doc_id", "lang"), "lang", "doc_id",
        Map("en" -> 4L, "fr" -> 2L)),
      Some(Sampling.curriculumOrderSql(
        "(SELECT doc_id, lang FROM documents)", "lang", "doc_id",
        Map("en" -> 4L, "fr" -> 2L)))),

    // PER-STRATUM CAP: "at most 40 documents per language" — the per-host/
    // per-source cap every crawl corpus applies. Admission in the same
    // deterministic (arithBucket, id) order as the other samplers (NOT
    // ingest order — no crawl-recency bias), rank via the distributed
    // prefix count, hash-checked against the QUALIFY row_number mirror.
    "sample_cap_stratum" -> Q(
      (s, d) => Sampling.capPerStratum(
        docs(s, d).select("doc_id", "lang"), "lang", "doc_id", cap = 40L),
      Some(s"""SELECT doc_id, lang FROM documents
             |QUALIFY ${Sampling.capPerStratumSql("lang", "doc_id", 40L)}""".stripMargin)),

    // WEIGHT-PROPORTIONAL sampling: keep documents ∝ n_chars (the "sample
    // by token mass, not doc count" policy of pretraining mixtures) —
    // Madow systematic sampling in exact integer arithmetic over the
    // distributed prefix sum, per language. Deterministic where weighted
    // reservoir draws are not; bit-for-bit against the window mirror.
    "sample_weighted" -> Q(
      (s, d) => Sampling.weightedSystematicSample(
        docs(s, d).select("doc_id", "lang", "n_chars"),
        "lang", "doc_id", "n_chars", stride = 4000L),
      Some(s"""SELECT doc_id, lang, n_chars FROM documents
             |QUALIFY ${Sampling.weightedSystematicSampleSql(
                 "lang", "doc_id", "n_chars", 4000L)}""".stripMargin)),

    // SLIDING-WINDOW CHUNKING: embedding-prep windows (200 chars, 40
    // overlap) — codegen sequence→transform→posexplode, scan-side, no
    // shuffle; byte-for-byte hash-checked against the unnest(range())
    // mirror including the clipped last window and short-doc cases.
    "chunk_texts" -> Q(
      (s, d) => Packing.chunkTexts(docs(s, d), "text", "doc_id",
        chunkChars = 200, overlapChars = 40),
      Some(Packing.chunkTextsSql("documents", "doc_id", "text", 200, 40))),

    // EPOCH SHUFFLE: each row's 1-based position in seed 7's pseudorandom
    // permutation — deterministic across runs/partitionings/engines
    // (df.orderBy(rand(seed)) is NOT), computed as a range-partitioned
    // two-phase prefix count (no Window — ScaleSpec), oracled by the
    // single-window row_number formulation.
    "sample_epoch_shuffle" -> Q(
      (s, d) => Sampling.epochShuffle(
        docs(s, d).select("doc_id"), "doc_id", seed = 7L),
      Some(s"""SELECT doc_id, ${Sampling.epochShuffleSql("doc_id", 7L)}
             |FROM documents""".stripMargin)),

    // GPT-style concat-and-chunk packing: chunk id = exact global prefix
    // sum of token counts in id order / budget — computed distributed
    // (range partitions + per-partition offsets), oracled by the
    // single-window formulation.
    "pack_chunks" -> Q(
      (s, d) => Packing.packChunks(docs(s, d), "text", "doc_id", budget = 512),
      Some(s"""WITH t AS (SELECT doc_id,
             |        CAST(${TextAnalysis.tokenCountSql("text")} AS BIGINT) AS n_tokens
             |        FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          AS BIGINT) AS tokens_before
             |      FROM t)
             |SELECT doc_id, n_tokens, tokens_before // 512 AS chunk_id
             |FROM c""".stripMargin)),

    // the mixing→packing last mile COMPOSED: curriculum positions drive
    // the packing key, so training chunks fill in proportional-interleave
    // order — weighted strata stay mixed inside every chunk stream, not
    // concatenated by domain. Both distributed prefix passes + the pack
    // membership hash-check end to end.
    "pack_curriculum" -> Q(
      (s, d) => {
        val ordered = Sampling.curriculumOrder(
          docs(s, d).select(col("doc_id"), col("lang"), col("text")),
          "lang", "doc_id", Map("en" -> 4L, "fr" -> 2L))
        Packing.packChunks(ordered.select(col("train_pos"), col("text")),
          "text", "train_pos", budget = 512)
      },
      Some(s"""WITH cur AS (
              |  ${Sampling.curriculumOrderSql(
                   "(SELECT doc_id, lang, text FROM documents)",
                   "lang", "doc_id", Map("en" -> 4L, "fr" -> 2L))}),
              |t AS (SELECT train_pos,
              |        CAST(${TextAnalysis.tokenCountSql("text")} AS BIGINT)
              |          AS n_tokens
              |      FROM cur),
              |c AS (SELECT train_pos, n_tokens,
              |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY train_pos
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |          AS BIGINT) AS tokens_before
              |      FROM t)
              |SELECT train_pos, n_tokens, tokens_before // 512 AS chunk_id
              |FROM c""".stripMargin)),

    // materialized packed sequences (round-5 growth): the training-file
    // rows themselves — documents of each chunk concatenated in id order.
    // DuckDB mirrors the assembly with string_agg(ORDER BY doc_id), so
    // the packed text is hash-checked byte-for-byte.
    "pack_texts" -> Q(
      (s, d) => Packing.packTexts(docs(s, d), "text", "doc_id", budget = 512),
      Some(s"""WITH t AS (SELECT doc_id, text,
             |        CAST(${TextAnalysis.tokenCountSql("text")} AS BIGINT) AS n_tokens
             |        FROM documents),
             |c AS (SELECT doc_id, text, n_tokens,
             |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          AS BIGINT) // 512 AS chunk_id
             |      FROM t)
             |SELECT chunk_id, string_agg(text, ' ' ORDER BY doc_id) AS packed,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
             |FROM c GROUP BY chunk_id""".stripMargin)),

    // ---------- multimodal ----------
    "mm_decode" -> Q(
      (s, d) => Multimodal.decodeStub(
        Multimodal.ingestAsMedia(docs(s, d), "doc_id", "text", "source"))
        .select("media_id", "byte_len", "first_byte"),
      Some("""SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS byte_len,
             |  ascii(substr(text, 1, 1)) AS first_byte
             |FROM documents""".stripMargin)),

    // content-hash dedup of binary media (multimodal ∘ dedup): planted
    // byte-identical copies (doc_id+10000) collapse on md5(content);
    // keeper = min media_id. The asset-store dedup every multimodal
    // crawl needs — one 16-byte-key shuffle regardless of payload size.
    "mm_dedup" -> Q(
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("text"),
          lit("crawl").as("source"))
        val withCopies = base.unionByName(
          base.filter(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 10000).as("doc_id"), col("text"),
              lit("recrawl").as("source")))
        Multimodal.ingestAsMedia(withCopies, "doc_id", "text", "source")
          .groupBy(md5(col("content")).as("content_md5"))
          .agg(count(lit(1)).as("n_copies"),
            min(col("media_id")).as("keeper"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, text FROM documents
             |  UNION ALL SELECT doc_id + 10000, text FROM documents
             |  WHERE doc_id % 3 = 0)
             |SELECT md5(text) AS content_md5,
             |  CAST(count(*) AS BIGINT) AS n_copies,
             |  min(media_id) AS keeper
             |FROM m GROUP BY 1""".stripMargin)),

    "mm_frame_sample" -> Q(
      (s, d) => Multimodal.frameSample(
        Multimodal.ingestAsMedia(docs(s, d), "doc_id", "text", "source"), stride = 4)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames")),
      Some("""SELECT doc_id AS media_id,
             |  ((strlen(text) - 1) // 64) + 1 AS n_frames
             |FROM documents""".stripMargin))
  )
}
