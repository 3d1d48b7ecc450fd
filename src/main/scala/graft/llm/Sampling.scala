package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing (SURVEY
  * §2.12 growth). At 100 TB, `df.sample()` is the wrong tool: its
  * per-partition RNG state makes the kept set depend on partitioning and
  * retries, so a re-run (or a speculative task) samples a DIFFERENT
  * subset. These operators decide membership from a pure hash of the row
  * id — reproducible across runs, partitionings, and engines, and a
  * sample at rate r is always a SUBSET of the sample at rate r' > r
  * (nested samples, the property data-mixing ablations need).
  *
  * Two mixers:
  *  - [[hashSample]]: xxhash64 (Spark's codegen'd built-in) — the
  *    production path, best mixing.
  *  - [[arithSample]]/[[stratifiedSample]]: a multiplicative-mod mix in
  *    exact integer arithmetic, chosen to be expressible in ANY SQL engine
  *    (DuckDB oracle included) so the kept set is hash-checkable
  *    bit-for-bit. The modulus keeps every intermediate below 2^63 —
  *    no overflow even under ANSI arithmetic at any id range.
  */
object Sampling {

  /** Per-mille bucket in [0, 1000) from xxhash64(id) — production mixer. */
  def hashBucket(id: Column): Column = pmod(xxhash64(id), lit(1000L))

  /** Keep ~permille/1000 of rows, decided by xxhash64(id). */
  def hashSample(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    df.filter(hashBucket(col(idCol)) < permille)
  }

  /** SQL-mirrorable mixer: ((id mod P) * K) mod P, P = 1e9+7 (prime),
    * K = 2654435761 (Knuth). (P-1) * K < 2^63, so the arithmetic is exact
    * in both engines. Per-mille bucket = mix mod 1000. */
  private val P = 1000000007L
  private val K = 2654435761L
  def arithBucket(id: Column): Column =
    pmod(pmod(pmod(id.cast("long"), lit(P)) * lit(K), lit(P)), lit(1000L))
  // SQL % keeps the dividend's sign while Spark's pmod is always
  // non-negative — the (x % P + P) % P shape matches pmod for negative ids
  // too (and every intermediate stays below 2^63)
  def arithBucketSql(c: String): String =
    s"((((($c % $P) + $P) % $P * $K) % $P) % 1000)"

  /** Keep ~permille/1000 of rows — the oracle-checkable twin of
    * [[hashSample]] (same nested-subset property, weaker mixing). */
  def arithSample(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    df.filter(arithBucket(col(idCol)) < permille)
  }
  def arithSampleSql(idExpr: String, permille: Int): String =
    s"${arithBucketSql(idExpr)} < $permille"

  /** Stratified deterministic sample: per-stratum keep rates (per-mille),
    * strata absent from the map keep `defaultPermille`. One scan, zero
    * shuffles — rate lookup is a literal CASE over the stratum column, so
    * the filter lands scan-side and at 100 TB this is a data-mixing pass
    * at I/O rate (e.g. downsample low-quality buckets, upsample rare
    * languages). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       permilleByStratum: Map[String, Int],
                       defaultPermille: Int = 0): DataFrame = {
    (permilleByStratum.values.toSeq :+ defaultPermille).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille out of range: $p"))
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (els, (k, p)) => when(col(stratumCol) === k, lit(p)).otherwise(els)
    }
    df.filter(arithBucket(col(idCol)) < rate)
  }
  def stratifiedSampleSql(stratumExpr: String, idExpr: String,
                          permilleByStratum: Map[String, Int],
                          defaultPermille: Int = 0): String =
    s"${arithBucketSql(idExpr)} < " +
      caseSql(stratumExpr, permilleByStratum.view.mapValues(_.toLong).toMap,
        defaultPermille.toLong)

  /** CASE over stratum literals; an empty map emits the bare default (a
    * zero-WHEN `CASE ELSE … END` is a parse error in SQL). */
  private def caseSql(stratumExpr: String, byStratum: Map[String, Long],
                      default: Long): String =
    if (byStratum.isEmpty) default.toString
    else {
      val cases = byStratum.toSeq.sortBy(_._1).map { case (k, v) =>
        s"WHEN $stratumExpr = '${k.replace("'", "''")}' THEN $v" }.mkString(" ")
      s"(CASE $cases ELSE $default END)"
    }

  /** Token-BUDGET mixing: pretraining mixtures are specified as "this many
    * tokens per domain", not a keep-rate — admit documents per stratum, in
    * deterministic (arithBucket, id) order, while the stratum's running
    * token total stays at or below its budget. The admitted set is a pure
    * function of (ids, token counts, budgets): reproducible across runs
    * and partitionings, and growing a budget only ever ADDS documents
    * (the admission order is budget-independent).
    *
    * One shuffle: a window sum partitioned by stratum. A stratum's rows
    * sort within its partition — at 100 TB a single giant stratum becomes
    * one sorting task, at which point swap the window for the
    * range-partitioned two-phase prefix sum used by
    * [[graft.llm.Packing.packChunks]] (same admission rule, distributed
    * running total); the operator's semantics don't change.
    *
    * @param tokensCol name of a precomputed per-row token-count column
    *                  (e.g. [[TextAnalysis.tokenCount]]) */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, idCol: String,
                        tokensCol: String, budgetByStratum: Map[String, Long],
                        defaultBudget: Long = 0L): DataFrame = {
    (budgetByStratum.values.toSeq :+ defaultBudget).foreach(b =>
      require(b >= 0, s"budget must be non-negative: $b"))
    require(!df.columns.contains("graft_cum"),
      "input already has a graft_cum column — rename it before sampling")
    val order = Window.partitionBy(col(stratumCol))
      .orderBy(arithBucket(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgetByStratum.foldLeft(lit(defaultBudget)) {
      case (els, (k, b)) => when(col(stratumCol) === k, lit(b)).otherwise(els)
    }
    df.withColumn("graft_cum", sum(col(tokensCol).cast("long")).over(order))
      .filter(col("graft_cum") <= budget)
      .drop("graft_cum")
  }
  def tokenBudgetSampleSql(stratumExpr: String, idExpr: String,
                           tokensExpr: String,
                           budgetByStratum: Map[String, Long],
                           defaultBudget: Long = 0L): String =
    s"""sum(CAST($tokensExpr AS BIGINT)) OVER (PARTITION BY $stratumExpr
       |  ORDER BY ${arithBucketSql(idExpr)}, $idExpr
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |  <= ${caseSql(stratumExpr, budgetByStratum, defaultBudget)}""".stripMargin

  /** TEMPERATURE-weighted source rebalancing (the α < 1 mixture reweighting
    * of multilingual/multi-domain pretraining — downweight head sources,
    * upweight tail ones): stratum `s` gets
    * `target_s = ⌊budget · w_s / Σw⌋` document slots where `w_s =
    * ⌊√n_s⌋` — i.e. α = 0.5 applied in EXACT arithmetic. IEEE-754 sqrt is
    * correctly rounded in both engines, floor and the integer
    * multiply/divide are exact, so the admitted set is bit-reproducible
    * cross-engine (a float `pow(n, α)` would not be). Slots fill in
    * deterministic (arithBucket, id) order — same admission convention as
    * [[tokenBudgetSample]], so re-runs and re-partitionings admit the
    * same documents, and a bigger budget only ever ADDS documents.
    *
    * Plan: stratum counts (one partial-agg shuffle over strata-cardinality
    * keys) → targets via a 1-row broadcast total → targets broadcast-join
    * back → ONE stratum-keyed window shuffle for the row_number admission.
    * At 100 TB the window's per-stratum sort is the same single-task
    * hazard as tokenBudgetSample's — swap in the range-partitioned
    * two-phase rank ([[Packing.packChunks]] pattern) if one stratum
    * dominates; the admission rule is unchanged.
    *
    * Rows with a NULL stratum are dropped (no slots can be allocated to
    * an unknown stratum — filter or fill upstream to keep them). */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        budget: Long): DataFrame = {
    // budget · w must stay below 2^63: w = ⌊√n⌋ ≤ 2^31.5 even at
    // impossible stratum sizes, so cap the budget at 2^31 slots.
    require(budget >= 0 && budget <= (1L << 31), s"budget out of range: $budget")
    require(!df.columns.exists(Set("graft_rn", "graft_target")),
      "input already has a graft_rn/graft_target column — rename it first")
    // NULL strata can never be admitted (the targets join drops them), so
    // they must not contribute weight to the denominator either — else
    // their sqrt share of the budget is allocated but unfillable.
    val known = df.filter(col(stratumCol).isNotNull)
    val weights = known.groupBy(col(stratumCol))
      .agg(floor(sqrt(count(lit(1)))).cast("long").as("graft_w"))
    val total = weights.agg(sum(col("graft_w")).as("graft_tw"))
    val targets = weights.crossJoin(broadcast(total))
      .select(col(stratumCol),
        expr(s"($budget * graft_w) div graft_tw").as("graft_target"))
    val order = Window.partitionBy(col(stratumCol))
      .orderBy(arithBucket(col(idCol)), col(idCol))
    df.join(broadcast(targets), stratumCol)
      .withColumn("graft_rn", row_number().over(order))
      .filter(col("graft_rn") <= col("graft_target"))
      .drop("graft_rn", "graft_target")
  }

  /** DuckDB mirror of [[temperatureSample]] — CTE chain + QUALIFY.
    * `src` must expose `$stratumExpr` and `$idExpr`; emits `SELECT cols`
    * of the admitted rows. */
  def temperatureSampleSql(src: String, cols: String, stratumExpr: String,
                           idExpr: String, budget: Long): String =
    s"""WITH gw AS (SELECT $stratumExpr AS g_s,
       |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w
       |  FROM $src WHERE $stratumExpr IS NOT NULL GROUP BY 1),
       |gt AS (SELECT g_s, CAST(($budget * w) // (SELECT sum(w) FROM gw)
       |    AS BIGINT) AS target FROM gw),
       |adm AS (SELECT s.*, t.target FROM $src s
       |  JOIN gt t ON s.$stratumExpr = t.g_s
       |  QUALIFY row_number() OVER (PARTITION BY $stratumExpr
       |    ORDER BY ${arithBucketSql(idExpr)}, $idExpr) <= target)
       |SELECT $cols FROM adm""".stripMargin
}
