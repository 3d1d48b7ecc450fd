package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.12;
  * driver-mandated north-star capability). All pure column expressions —
  * codegen'd, scan-side, zero shuffles, so they stream over 100 TB at
  * whatever rate the scan sustains.
  *
  * Each operator is written twice from one definition: a Spark Column and a
  * DuckDB oracle SQL string, kept adjacent so t2 can hash-match them.
  */
object TextAnalysis {

  /** whitespace tokens (plain split — FTS tokenization lives in graft.fts). */
  def tokens(text: Column): Column = split(text, " ")
  def tokensSql(c: String) = s"string_split($c, ' ')"

  def tokenCount(text: Column): Column = size(tokens(text))
  def tokenCountSql(c: String) = s"len(${tokensSql(c)})"

  /** BPE-ish subword count estimate: whitespace tokens + ~1 token per 4
    * chars of long words (the standard chars/4 heuristic, integer math so
    * both engines agree exactly). */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + greatest(lit(1L),
        floor((length(w) + lit(3)) / lit(4)).cast("long")))
  // CAST: DuckDB list_sum over ints is HUGEINT, which the driver's Arrow
  // fetch path renders as a float — BIGINT keeps it integral.
  def bpeTokenEstimateSql(c: String) =
    s"CAST(list_sum(list_transform(${tokensSql(c)}, w -> greatest(1, (length(w) + 3) // 4))) AS BIGINT)"

  // ---- language ID: stopword-dictionary hit counting with deterministic
  // argmax (tie order en > fr > de). Dictionaries are tiny on purpose — the
  // capability is the n-gram-heuristic *shape*, swap dictionaries for real
  // corpora.
  private val dicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))
  private def hitsSql(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = dicts.map { case (lang, ws) => lang -> hits(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.init.foldRight(lit(scores.last._1)) { case ((lang, s), els) =>
      when(s === best, lit(lang)).otherwise(els)
    }
  }
  def langIdSql(c: String): String = {
    val toksExpr = tokensSql(s"lower($c)")
    val scores = dicts.map { case (lang, ws) => lang -> hitsSql(toksExpr, ws) }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.init.map { case (lang, s) =>
      s"WHEN $s = $best THEN '$lang'"
    }.mkString(" ")
    s"(CASE $cases ELSE '${scores.last._1}' END)"
  }

  /** Per-document top term by TF-IDF (raw tf × ln(N/df)). Classic IR
    * weighting as pure dataflow: one explode + two aggregations + a
    * window — each a single shuffle with map-side combine, so the whole
    * thing is 3 passes regardless of corpus size. Scores are rounded
    * BEFORE ranking (ties → term asc) so ulp differences in ln() can't
    * reorder engines. */
  def tfidfTop(df: org.apache.spark.sql.DataFrame, textCol: String,
               idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n").cast("double") / col("df")), 4))
    // top-1 per doc as a hash aggregation (partial agg map-side) instead of
    // a window row_number — no per-doc repartition+sort. Ordering key is
    // (score desc, term asc), encoded as a struct-min: scores are 4-decimal
    // rounded, so ×-10000 as long is an exact integer (no -0.0 or
    // truncation hazards a negated double would have).
    scored.groupBy(col(idCol))
      .agg(min(struct(
        round(col("score") * lit(-10000), 0).cast("long").as("ns"),
        col("term").as("t"))).as("m"))
      .select(col(idCol), col("m.t").as("top_term"),
        // + 0.0 normalizes the -0.0 that ns=0 (score exactly 0) would yield
        (col("m.ns").cast("double") / lit(-10000.0) + lit(0.0)).as("score"))
  }

  // ---- repetition signals (Gopher-style quality filters, Rae et al. 2021
  // §A1.1): heavily repetitive documents are low-quality training data.
  // Both are integer-count ratios (exact double parity), rounded to 4.

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 - distinct/total. Pure scan-side expression. */
  def dupTokenFrac(text: Column): Column = {
    val toks = tokens(text)
    round(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks), 4)
  }
  def dupTokenFracSql(c: String): String = {
    val t = tokensSql(c)
    s"round(1.0 - len(list_distinct($t))::DOUBLE / len($t), 4)"
  }

  /** Fraction of the document's word n-grams taken by the single most
    * frequent n-gram (Gopher's "top n-gram fraction"). Documents shorter
    * than n tokens score 0. Per-document quadratic in DISTINCT n-grams —
    * bounded by document length, never corpus size, so still one scan. */
  def topNgramFrac(text: Column, n: Int): Column = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val toks = tokens(text)
    val cnt = size(toks)
    val grams = transform(sequence(lit(1), cnt - lit(n) + 1),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    val top = array_max(transform(array_distinct(grams),
      g => size(filter(grams, x => x === g))))
    when(cnt < n, lit(0.0))
      .otherwise(round(top.cast("double") / size(grams), 4))
  }
  def topNgramFracSql(c: String, n: Int): String = {
    val t = tokensSql(c)
    val gram = (0 until n).map(j => s"t[i${if (j == 0) "" else s"+$j"}]")
      .mkString(" || ' ' || ")
    s"""(CASE WHEN len($t) < $n THEN 0.0 ELSE (
       |  SELECT round(
       |    list_max(list_transform(list_distinct(g),
       |      u -> len(list_filter(g, x -> x = u))))::DOUBLE / len(g), 4)
       |  FROM (SELECT list_transform(range(1, len(t) - ${n - 2}),
       |          i -> $gram) AS g
       |        FROM (SELECT $t AS t))
       |) END)""".stripMargin
  }

  // ---- PII scrubbing (C4/Dolma-style redaction): replace emails, IPv4
  // addresses, and phone-shaped numbers with typed placeholder tokens.
  // Patterns stay inside the Java∩RE2 common regex subset (ASCII \d, \b,
  // bounded repetition) so Spark (Java regex) and DuckDB (RE2) transform
  // text identically.
  private[llm] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[llm] val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[llm] val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Redact PII in a fixed pass order (email → IPv4 → phone; the email
    * pass runs first so an address-embedded IP is already gone). Pure
    * column expression — the 100-TB scrub is a scan-rate map pass. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      emailRe, "<EMAIL>"), ipv4Re, "<IP>"), phoneRe, "<PHONE>")
  // SQL single-quoted strings pass backslashes through verbatim, so the
  // Scala pattern constants interpolate directly.
  def scrubPiiSql(c: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($c,
       |  '$emailRe', '<EMAIL>', 'g'),
       |  '$ipv4Re', '<IP>', 'g'),
       |  '$phoneRe', '<PHONE>', 'g')""".stripMargin

  /** Count of PII pattern hits on the RAW text (per-pattern counts summed;
    * overlapping matches across patterns each count — the audit number a
    * privacy review wants, not a dedup of the scrub). */
  def piiCount(text: Column): Column =
    (regexp_count(text, lit(emailRe)) + regexp_count(text, lit(ipv4Re)) +
      regexp_count(text, lit(phoneRe))).cast("long")
  def piiCountSql(c: String): String =
    s"""CAST(len(regexp_extract_all($c, '$emailRe'))
       | + len(regexp_extract_all($c, '$ipv4Re'))
       | + len(regexp_extract_all($c, '$phoneRe')) AS BIGINT)""".stripMargin

  // ---- text fixing (ftfy/C4-style cleanup): NFC-compose, strip control
  // characters, collapse whitespace runs. Character classes stay in the
  // Java∩RE2 common subset (explicit hex ranges — no \s, whose membership
  // differs between the engines on \x0B).
  private[llm] val controlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  private[llm] val wsRunRe = "[ \\t\\n\\r\\f]+"

  /** Canonical text cleanup: NFC normalization (custom codegen
    * [[graft.functions.NfcNormalize]] — Spark has no built-in), control
    * chars dropped, whitespace runs collapsed to one space, ends trimmed.
    * Pure scan-side expression; run it FIRST so dedup/fingerprinting see
    * one byte representation per canonically-equal document. */
  def fixText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.functions.NfcNormalize.nfc_normalize(text),
      controlRe, ""), wsRunRe, " "))
  def fixTextSql(c: String): String =
    s"""trim(regexp_replace(regexp_replace(nfc_normalize($c),
       |  '$controlRe', '', 'g'), '$wsRunRe', ' ', 'g'))""".stripMargin

  // ---- blocklist gate (C4's badwords filter shape): count word-boundary
  // blocklist hits; kept = zero hits. The alternation is non-capturing and
  // every term is required alphanumeric, so the pattern stays in the
  // Java∩RE2 subset and both engines count identically.
  private[llm] def blocklistRe(words: Seq[String]): String = {
    require(words.nonEmpty, "empty blocklist")
    words.foreach(w => require(w.matches("[a-z0-9]+"),
      s"blocklist terms must be lowercase alphanumeric: '$w'"))
    s"\\b(?:${words.mkString("|")})\\b"
  }

  /** Number of blocklisted-term occurrences in the (lowercased) text. */
  def blocklistHits(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(blocklistRe(words))).cast("long")
  def blocklistHitsSql(c: String, words: Seq[String]): String =
    s"CAST(len(regexp_extract_all(lower($c), '${blocklistRe(words)}')) AS BIGINT)"

  // ---- linear quality classifier (the fasttext-filter shape of
  // CCNet/GPT-3 data curation): a fixed-weight linear model over
  // integer-exact text features. Training happens offline; serving a
  // linear model is ONE scan-side expression, and because features and
  // weights are integers the logit is hash-exact cross-engine (the
  // sigmoid is monotone, so thresholding the logit IS thresholding the
  // probability — no exp() ulp hazards).
  final case class LinearModel(bias: Long, wTokens: Long, wStop: Long,
                               wDupFp: Long, wPii: Long)

  /** Integer logit of [[LinearModel]] over (token count, en-stopword
    * hits, dup-token fraction in 1e-4 fixed point, PII hits). */
  def classifierLogit(text: Column, m: LinearModel): Column = {
    val toks = tokens(lower(text))
    val dupFp = round(dupTokenFrac(text) * 10000, 0).cast("long")
    (lit(m.bias) + lit(m.wTokens) * size(toks).cast("long") +
      lit(m.wStop) * hits(toks, dicts.head._2).cast("long") +
      lit(m.wDupFp) * dupFp + lit(m.wPii) * piiCount(text)).cast("long")
  }
  def classifierLogitSql(c: String, m: LinearModel): String = {
    val toksExpr = tokensSql(s"lower($c)")
    s"""CAST(${m.bias} + ${m.wTokens} * len($toksExpr)
       | + ${m.wStop} * ${hitsSql(toksExpr, dicts.head._2)}
       | + ${m.wDupFp} * CAST(round(${dupTokenFracSql(c)} * 10000, 0) AS BIGINT)
       | + ${m.wPii} * ${piiCountSql(c)} AS BIGINT)""".stripMargin
  }

  /** Per-document unigram surprisal in whole bits (CCNet's LM-perplexity
    * quality signal, made hash-exact): train a unigram LM on the corpus
    * itself (one count aggregation), then score each token
    * `⌊log2 N⌋ − ⌊log2 cnt(term)⌋` — floor-log2 is `length(bin(x)) − 1`,
    * EXACT integer arithmetic in both Spark and DuckDB, so unlike a
    * float `ln()` sum the score can never drift between engines or
    * partition orders. High bits/token ⇒ improbable text under the
    * corpus distribution (gibberish or rare-domain) — the standard
    * perplexity-bucket filter, minus the float hazards.
    *
    * Plan: explode → term-count groupBy (map-side combine) → join scores
    * back on term → per-doc groupBy. The term-count table is
    * vocab-bounded, so at 100 TB the join side broadcasts (AQE picks it;
    * heavy-hitter vocab ≪ corpus). Three shuffles total, each with
    * partial aggregation. */
  def unigramSurprisal(df: org.apache.spark.sql.DataFrame, textCol: String,
                       idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol),
      explode(tokens(lower(col(textCol)))).as("term"))
    val cnt = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // total tokens from the vocab-bounded cnt table — NOT a third full
    // corpus pass (Σ cnt ≡ the explode count)
    val n = cnt.agg(sum(col("cnt")).as("n"))
    // ⌊log2 n⌋ − ⌊log2 cnt⌋ — the −1s cancel
    val surprisal = (length(bin(col("n"))) - length(bin(col("cnt")))).cast("long")
    toks.join(cnt, "term").crossJoin(broadcast(n))
      .select(col(idCol), surprisal.as("s"))
      .groupBy(col(idCol))
      .agg(sum(col("s")).as("surprisal_bits"),
        count(lit(1)).as("n_tokens"),
        round(sum(col("s")).cast("double") / count(lit(1)), 4)
          .as("bits_per_token"))
  }

  /** Bigram LM surprisal with Stupid-Backoff-style fallback, in whole bits
    * (exact integer arithmetic — same floor-log2 trick as
    * [[unigramSurprisal]], so Spark and DuckDB can never drift). The
    * CCNet/KenLM perplexity-bucket filter shape (reference tokenization:
    * /root/reference/server.py:732-739), upgraded from unigram to bigram
    * context with a held-out split so the backoff path is real:
    *
    *  - model trains on the `trainPred` subset of the corpus (bigram +
    *    unigram counts, total N);
    *  - token 1 of a doc scores by unigram: ⌊log2 N⌋ − ⌊log2 c(w)⌋, or
    *    ⌊log2 N⌋ + 1 when w is out-of-vocabulary (count-1 + 1-bit penalty);
    *  - token i>1 scores by conditional bigram ⌊log2 c(w_{i−1})⌋ −
    *    ⌊log2 c(w_{i−1}w_i)⌋ when the bigram was seen, else BACKS OFF to
    *    the unigram score + a 1-bit penalty (the integer stand-in for
    *    Stupid Backoff's ×0.4 ≈ +1.32 bits; exactness beats fidelity here).
    *
    * Returns (id, bits, n_tokens, n_backoff, bits_per_token); `n_backoff`
    * is itself a useful novelty signal (how much of the doc steps off the
    * training distribution).
    *
    * Plan: one explode to (prev, cur) pairs via a shifted `arrays_zip` —
    * scan-side, no self-join on position — then two count aggregations
    * over the TRAIN subset (vocab- and bigram-vocab-bounded), three
    * term-keyed joins back, one per-doc groupBy. At 100 TB the unigram
    * side always broadcasts; the bigram table is corpus-bounded but ≪
    * corpus (heavy-tail cutoff: it holds distinct pairs, not occurrences)
    * — AQE broadcasts it when it fits and falls back to a shuffle-hash
    * join on the pair key otherwise. Every aggregation is partial
    * (map-side combine), so the shuffles move vocab-sized data, not
    * corpus-sized. */
  def bigramSurprisal(df: org.apache.spark.sql.DataFrame, textCol: String,
                      idCol: String, trainPred: Column): org.apache.spark.sql.DataFrame = {
    val l = tokens(lower(col(textCol)))
    // prev-shifted zip: position i pairs (token i−1 | null, token i)
    val prevArr = concat(array(lit(null).cast("string")), slice(l, lit(1), size(l) - 1))
    val pairs = df.select(col(idCol), trainPred.as("is_train"),
      explode(arrays_zip(prevArr.as("prev"), l.as("cur"))).as("p"))
      .select(col(idCol), col("is_train"),
        col("p.prev").as("prev"), col("p.cur").as("cur"))
    val train = pairs.filter(col("is_train"))
    val uni = train.groupBy(col("cur").as("term")).agg(count(lit(1)).as("ucnt"))
    // total train tokens from the vocab-bounded table, not a second pass
    val n = uni.agg(sum(col("ucnt")).as("n"))
    val bi = train.filter(col("prev").isNotNull)
      .groupBy(col("prev").as("bprev"), col("cur").as("bcur"))
      .agg(count(lit(1)).as("bcnt"))
    val uc = uni.select(col("term").as("c_term"), col("ucnt").as("c_cnt"))
    val up = uni.select(col("term").as("p_term"), col("ucnt").as("p_cnt"))
    // ⌊log2 x⌋ = length(bin(x)) − 1; the −1s cancel in every difference,
    // and the OOV penalty folds to exactly length(bin(N))
    val uniBits = when(col("c_cnt").isNull, length(bin(col("n"))))
      .otherwise(length(bin(col("n"))) - length(bin(col("c_cnt"))))
    val s = when(col("prev").isNotNull && col("bcnt").isNotNull,
        length(bin(col("p_cnt"))) - length(bin(col("bcnt"))))
      .when(col("prev").isNotNull, lit(1) + uniBits)
      .otherwise(uniBits)
    val backoff = when(col("prev").isNotNull && col("bcnt").isNull, 1L).otherwise(0L)
    pairs
      .join(uc, col("cur") === col("c_term"), "left")
      .join(up, col("prev") === col("p_term"), "left")
      .join(bi, col("prev") === col("bprev") && col("cur") === col("bcur"), "left")
      .crossJoin(broadcast(n))
      .select(col(idCol), s.cast("long").as("s"), backoff.as("backoff"))
      .groupBy(col(idCol))
      .agg(sum(col("s")).as("bits"),
        count(lit(1)).as("n_tokens"),
        sum(col("backoff")).as("n_backoff"),
        round(sum(col("s")).cast("double") / count(lit(1)), 4)
          .as("bits_per_token"))
  }

  /** Distributed batch-perceptron TRAINING in exact integer arithmetic
    * (Rosenblatt's rule, batch form: one epoch = ONE aggregation) — the
    * quality-classifier TRAINER to [[classifierLogit]]'s scorer. Each
    * epoch sums the misclassified rows' y·x (and y for the bias) in a
    * single partial-agg pass and adds the integer delta to the weights:
    * w' = w + Σ_{y(w·x+b) ≤ 0} y·x. Everything is 64-bit integer — sums
    * commute, so the learned weights are bit-identical across runs,
    * partitionings, and engines (float SGD could never hash-check), and
    * the whole trainer is an unrolled-SQL oracle away from DuckDB.
    *
    * Contract: `yCol` is ±1; features are integral (counts, fixed-point
    * ratios — [[classifierLogit]]'s feature style); overflow headroom
    * |w| ≤ epochs·Σ|x| per dimension. Driver state = one weight vector;
    * each epoch reads the facts once (cache `df` upstream for small
    * fixtures). Linearly separable data converges by the perceptron
    * theorem; otherwise the returned weights are the last iterate (batch
    * updates, not pocket). Returns one row: w_<feature>… , bias. */
  def trainPerceptron(df: org.apache.spark.sql.DataFrame, xCols: Seq[String],
                      yCol: String, epochs: Int): org.apache.spark.sql.DataFrame = {
    require(xCols.nonEmpty && epochs >= 1 && epochs <= 16,
      s"need features and 1..16 epochs, got $xCols/$epochs")
    val spark = df.sparkSession
    // (round 16, guide §5) every epoch reads exactly these columns — persist
    // the PROJECTED feature frame (a few longs per row, tiny next to the
    // text it was derived from) so epochs 2..n skip the upstream scan +
    // feature derivation instead of re-tokenizing the corpus per epoch.
    // Recomputed per call, dropped before returning — nothing outlives the
    // operator. Integer sums commute, so the weights are bit-identical.
    val feats = df.select((xCols :+ yCol).map(c => col(c).cast("long").as(c)): _*)
    if (epochs > 1)
      feats.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var w = Array.fill(xCols.length + 1)(0L) // features ++ bias
    try (1 to epochs).foreach { _ =>
      val margin = xCols.zipWithIndex.foldLeft(lit(w.last)) {
        case (acc, (c, i)) => acc + col(c) * w(i)
      } * col(yCol)
      val mis = when(margin <= 0, col(yCol)).otherwise(lit(0L))
      val sums = (xCols.map(c => sum(mis * col(c))) :+ sum(mis))
        .zipWithIndex.map { case (e, i) => coalesce(e, lit(0L)).as(s"d$i") }
      val delta = feats.agg(sums.head, sums.tail: _*).collect().head
      w = w.indices.map(i => w(i) + delta.getLong(i)).toArray
    } finally if (epochs > 1) feats.unpersist(false)
    import spark.implicits._
    Seq(1).toDF("one").select(
      xCols.zipWithIndex.map { case (c, i) => lit(w(i)).as(s"w_$c") } :+
        lit(w.last).as("bias"): _*)
  }

  /** Registrable host of a URL, lowercased (the per-domain key every
    * crawl pipeline caps/dedups/rates on): the authority between `://`
    * and the first `/ : ? #`, ports and paths dropped. Pure regex in the
    * Java∩RE2 subset — both engines extract identically; non-URLs yield
    * the empty string (regexp_extract's no-match contract). */
  def urlDomain(url: Column): Column =
    regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
  def urlDomainSql(c: String): String =
    s"coalesce(regexp_extract(lower($c), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), '')"

  /** Tracking-parameter strip (utm_…, fbclid, gclid, msclkid — the
    * canonicalization step before URL dedup; without it every campaign
    * link is a distinct "page"): drop matching query params, then tidy
    * separator debris (`?&` → `?`, trailing `?`/`&`). Three global regex
    * replaces, Java∩RE2, scan-side. */
  def canonicalizeUrl(url: Column): Column = {
    val dropped = regexp_replace(url,
      "(utm_[a-zA-Z]+|fbclid|gclid|msclkid)=[^&#]*&?", "")
    regexp_replace(regexp_replace(dropped, "\\?&", "?"), "[?&]+(#|$)", "$1")
  }
  def canonicalizeUrlSql(c: String): String = {
    val dropped =
      s"regexp_replace($c, '(utm_[a-zA-Z]+|fbclid|gclid|msclkid)=[^&#]*&?', '', 'g')"
    s"""regexp_replace(regexp_replace($dropped, '\\?&', '?', 'g'),
       |  '[?&]+(#|${"$"})', '\\1', 'g')""".stripMargin
  }

  /** Quality score in [0,1]: integer-ratio components only (token count,
    * mean word length band, stopword ratio) so Spark and DuckDB compute
    * bit-identical doubles; rounded to 4 anyway. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = size(toks).cast("double")
    val stop = hits(toks, dicts.head._2).cast("double")
    val lenScore = least(lit(1.0), n / lit(64.0))
    val stopScore = least(lit(1.0), (stop / n) * lit(4.0))
    round((lenScore + stopScore) / lit(2.0), 4)
  }
  def qualityScoreSql(c: String): String = {
    val toksExpr = tokensSql(s"lower($c)")
    val stopExpr = hitsSql(toksExpr, dicts.head._2)
    s"""round((least(1.0, len($toksExpr) / 64.0)
       | + least(1.0, ($stopExpr::DOUBLE / len($toksExpr)) * 4.0)) / 2.0, 4)""".stripMargin
  }
}
