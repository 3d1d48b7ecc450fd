package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Pin a frame's partitioning for the two-pass prefix-sum operators
    * ([[stratumCumSum]], [[graft.llm.Packing.packChunks]]): both passes
    * must see ONE materialized layout (range bounds are sampled, and the
    * broadcast offsets describe the exact layout the final pass reads).
    *
    * When the session has a RELIABLE checkpoint dir configured
    * (`spark.sparkContext.setCheckpointDir` — the production posture on a
    * multi-tenant cluster), the pin is `checkpoint()`: it survives
    * executor loss, at the cost of one distributed write. Otherwise the
    * pin is the [[persistRolling]]'d converted-row RDD the operators
    * build right after this call: the RDD DAG (including the range
    * exchange and its driver-side partitioner, bounds already sampled) is
    * instantiated exactly once, so an evicted block recomputes through
    * the SAME shuffle output with the same bounds — no localCheckpoint
    * needed. (Round 16: the previous `localCheckpoint()` here pinned a
    * SECOND corpus-sized copy per call that only a GC could release; a
    * full bench session accumulated ~50 such pins and measurably pushed
    * the 8 GiB driver into GC thrash — guide §5.) */
  private[llm] def pinPartitioning[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint()
    else ds

  /** Persist a two-pass prefix-sum RDD with a ROLLING release: the ring
    * keeps the two most recent pins (compositions like epochShuffle and
    * curriculum packing chain at most two live prefix sums) and releases
    * older ones, so a session's standing footprint is bounded at two
    * pinned corpora no matter how many sampler/packer calls it makes.
    * Lineage is kept (MEMORY_AND_DISK persist, never a checkpoint), so a
    * caller that still holds an older returned frame recomputes through
    * the retained shuffle files instead of failing — same rows, same
    * partitioning. */
  private val pinRing = new java.util.ArrayDeque[org.apache.spark.rdd.RDD[_]]()
  private[llm] def persistRolling[T](rdd: org.apache.spark.rdd.RDD[T])
      : org.apache.spark.rdd.RDD[T] = pinRing.synchronized {
    pinRing.addLast(rdd.asInstanceOf[org.apache.spark.rdd.RDD[_]])
    while (pinRing.size > 2) pinRing.removeFirst().unpersist(blocking = false)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

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

  /** Deterministic train/val/test split: one `split` label per row from
    * its [[arithBucket]] — bucket < train‰ → "train", the next val‰ →
    * "val", the rest → "test". A pure scan-side CASE (zero shuffles, works
    * as a partition-pruning predicate downstream); membership depends only
    * on the id, so re-runs, backfills, and cross-table joins on the same
    * id space land rows in the same split — and `train` at p‰ is exactly
    * [[arithSample]]'s keep set at p‰ (nested-subset property: shrinking
    * the train fraction only moves rows OUT of train, never across
    * val/test boundaries below it). */
  def splitAssign(df: DataFrame, idCol: String,
                  trainPermille: Int, valPermille: Int): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      s"permilles must be non-negative and sum ≤ 1000, " +
        s"got $trainPermille + $valPermille")
    val b = arithBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPermille, lit("train"))
        .when(b < trainPermille + valPermille, lit("val"))
        .otherwise(lit("test")))
  }
  def splitAssignSql(idExpr: String, trainPermille: Int,
                     valPermille: Int): String =
    s"CASE WHEN ${arithBucketSql(idExpr)} < $trainPermille THEN 'train' " +
      s"WHEN ${arithBucketSql(idExpr)} < ${trainPermille + valPermille} " +
      s"THEN 'val' ELSE 'test' END"

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

  /** Distributed per-stratum running total in (arithBucket(id), id) order —
    * the admission engine behind [[tokenBudgetSample]] and
    * [[temperatureSample]]. Semantically identical to
    * `sum(value) over (partition by stratum order by bucket, id rows
    * unbounded preceding)`, but that window plans every stratum into ONE
    * sort task — a giant stratum (English is most of any web corpus) is a
    * single-machine sort at 100 TB. Here the prefix sum is computed the
    * [[Packing.packChunks]] way, generalized from one global sequence to
    * per-stratum sequences:
    *
    *   1. range-repartition + sort on (stratum, bucket, id) — partitions
    *      are globally ordered key ranges, so each stratum is one
    *      CONTIGUOUS run of rows possibly spanning adjacent partitions,
    *      and a dominant stratum spreads over MANY partitions instead of
    *      collapsing into one sort task;
    *   2. one tiny job emits each partition's FIRST and LAST stratum-run
    *      sums (≤ 2 rows/partition — middle runs start and end inside the
    *      partition, so their prefix from earlier partitions is zero by
    *      contiguity; driver state is ≤ 2·nPart rows regardless of
    *      stratum cardinality);
    *   3. the driver turns those into per-partition starting offsets for
    *      the partition's first run (broadcast);
    *   4. one streaming pass adds offset + running local sum per run.
    *
    * The frame is localCheckpoint'ed so both passes see ONE pinned
    * partitioning (range bounds are sampled), and the per-partition passes
    * use the RDD's own `mapPartitionsWithIndex` index, not the stage
    * partition id (see packChunks' implementation note). NULL values
    * count as 0 (the samplers never feed NULLs; documented for reuse).
    *
    * Eager-execution / fault-tolerance trade (same as packChunks): the
    * pin runs the upstream plan NOW, truncates lineage, and holds the
    * materialized layout for the duration of the call. [[pinPartitioning]]
    * picks the mechanism: with a session checkpoint dir configured the pin
    * is a RELIABLE `checkpoint()` (survives executor loss — set one for
    * production-scale runs); without it, `localCheckpoint()` (fast, but
    * executor-pinned and not fault-tolerant). */
  private[llm] def stratumCumSum(df: DataFrame, stratumCol: String,
                                 idCol: String, value: Column,
                                 outCol: String,
                                 ord: Option[Column] = None): DataFrame = {
    val taken = Set("graft_ord", "graft_val", outCol)
    require(!df.columns.exists(taken),
      s"input already has one of ${taken.mkString("/")} — rename it first")
    val spark = df.sparkSession
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    val ranged = df
      // within-stratum order: (ord, id) — the samplers' admission order is
      // the default (arithBucket, id); epochShuffle passes its own seeded
      // full-range mixer
      .withColumn("graft_ord", ord.getOrElse(arithBucket(col(idCol))))
      .withColumn("graft_val", value.cast("long"))
      .repartitionByRange(nPart, col(stratumCol), col("graft_ord"), col(idCol))
      .sortWithinPartitions(stratumCol, "graft_ord", idCol)
      .transform(pinPartitioning(_)) // pin the sampled range bounds across both passes
    val sIdx = ranged.schema.fieldIndex(stratumCol)
    val vIdx = ranged.schema.fieldIndex("graft_val")
    // (round 16) persist the converted rows: BOTH passes read this RDD —
    // the edge-run collect and the emitting pass — and un-persisted each
    // re-ran the whole scan + range shuffle + sort + row conversion.
    // Rolling release (see persistRolling): ContextCleaner alone was
    // measured letting a full bench session pile up dozens of these.
    val rdd = persistRolling(ranged.rdd)
    def sameKey(a: Any, b: Any): Boolean = java.util.Objects.equals(a, b)
    // pass 1: (pid, first-run (stratum, sum), last-run (stratum, sum)) —
    // a one-run partition emits a single entry; collect is ≤ 2·nPart rows
    val edgeRuns: Array[(Int, Seq[(Any, Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var firstKey: Any = null; var firstSum = 0L; var haveFirst = false
        var curKey: Any = null; var curSum = 0L; var haveCur = false
        it.foreach { r =>
          val s = r.get(sIdx)
          val v = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
          if (!haveCur) { curKey = s; curSum = v; haveCur = true }
          else if (sameKey(curKey, s)) curSum += v
          else {
            if (!haveFirst) { firstKey = curKey; firstSum = curSum; haveFirst = true }
            curKey = s; curSum = v
          }
        }
        if (!haveCur) Iterator.empty
        else if (!haveFirst) Iterator.single((pid, Seq((curKey, curSum))))
        else Iterator.single((pid, Seq((firstKey, firstSum), (curKey, curSum))))
      }.collect()
    // pass 2 offsets: a partition's first run continues a stratum only if
    // earlier partitions end with the same stratum (contiguity) — sum
    // their emitted run totals. Later runs in a partition START there, so
    // their offset is always 0.
    val byPid = edgeRuns.toMap
    val offsets: Map[Int, Long] = edgeRuns.map { case (pid, runs) =>
      val s = runs.head._1
      pid -> (0 until pid).iterator.flatMap(q =>
        byPid.getOrElse(q, Nil).iterator
          .filter { case (k, _) => sameKey(k, s) }.map(_._2)).sum
    }.toMap
    val bcOff = spark.sparkContext.broadcast(offsets)
    val outSchema = ranged.schema.add(outCol, LongType, nullable = false)
    val withCum = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOff.value.getOrElse(pid, 0L)
      var curKey: Any = null; var haveCur = false
      it.map { r =>
        val s = r.get(sIdx)
        if (!haveCur) { curKey = s; haveCur = true }
        else if (!sameKey(curKey, s)) { curKey = s; run = 0L }
        run += (if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(withCum, outSchema).drop("graft_ord", "graft_val")
  }

  /** Token-BUDGET mixing: pretraining mixtures are specified as "this many
    * tokens per domain", not a keep-rate — admit documents per stratum, in
    * deterministic (arithBucket, id) order, while the stratum's running
    * token total stays at or below its budget. The admitted set is a pure
    * function of (ids, token counts, budgets): reproducible across runs
    * and partitionings, and growing a budget only ever ADDS documents
    * (the admission order is budget-independent).
    *
    * The running total is [[stratumCumSum]]'s range-partitioned two-phase
    * prefix sum — no per-stratum single-task window sort anywhere in the
    * plan (ScaleSpec asserts no Window node survives), so a dominant
    * stratum spreads over many partitions at 100 TB.
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
    val budget = budgetByStratum.foldLeft(lit(defaultBudget)) {
      case (els, (k, b)) => when(col(stratumCol) === k, lit(b)).otherwise(els)
    }
    stratumCumSum(df, stratumCol, idCol, col(tokensCol), "graft_cum")
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

  /** PER-STRATUM CAP — the "at most N documents per host/domain/source"
    * policy every crawl-derived pretraining corpus applies (a handful of
    * boilerplate-heavy hosts would otherwise dominate the mixture): keep
    * each stratum's first `cap` rows in deterministic (arithBucket, id)
    * admission order — same convention as [[tokenBudgetSample]], so
    * re-runs, re-partitionings, and engines admit the same rows, and a
    * larger cap only ever ADDS rows. The kept subset is a deterministic
    * uniform-ish sample WITHIN each stratum, not a prefix of ingest order
    * (no crawl-recency bias).
    *
    * The admission rank is [[stratumCumSum]] over value 1 — the
    * range-partitioned two-phase prefix count; no per-stratum Window,
    * no single-task sort, a dominant host spreads over many partitions. */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                    cap: Long): DataFrame = {
    require(cap >= 0, s"cap must be non-negative: $cap")
    require(!df.columns.contains("graft_rank"),
      "input already has a graft_rank column — rename it first")
    stratumCumSum(df, stratumCol, idCol, lit(1L), "graft_rank")
      .filter(col("graft_rank") <= cap)
      .drop("graft_rank")
  }
  /** DuckDB mirror of [[capPerStratum]] — a QUALIFY conjunct. */
  def capPerStratumSql(stratumExpr: String, idExpr: String, cap: Long): String =
    s"""row_number() OVER (PARTITION BY $stratumExpr
       |  ORDER BY ${arithBucketSql(idExpr)}, $idExpr) <= $cap""".stripMargin

  /** WEIGHT-PROPORTIONAL systematic sampling (Madow's method in exact
    * integer arithmetic) — "sample documents ∝ token count / quality
    * weight" made deterministic: lay the rows' integer weights end-to-end
    * per stratum in the samplers' (arithBucket, id) admission order and
    * keep every row whose weight interval (cum−w, cum] covers a multiple
    * of `stride`. A row is kept with frequency ~w/stride (certainty when
    * w ≥ stride), each stratum keeps ≤ ⌊total_w/stride⌋ rows — exactly
    * that many when no single weight exceeds stride (the row intervals
    * partition (0, total], one kept row per covered multiple) — and
    * membership is a pure function of
    * (ids, weights, stride): reproducible across runs, partitionings, and
    * engines, where the float inverse-CDF draw of weighted reservoir /
    * A-ES sampling could never hash-match. Rows with NULL or
    * non-positive weight are never kept (their interval is empty).
    *
    * The running weight total is [[stratumCumSum]]'s range-partitioned
    * two-phase prefix sum — no per-stratum Window sort; a dominant
    * stratum spreads over many partitions at 100 TB. */
  def weightedSystematicSample(df: DataFrame, stratumCol: String,
                               idCol: String, weightCol: String,
                               stride: Long): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    require(!df.columns.contains("graft_cum"),
      "input already has a graft_cum column — rename it first")
    stratumCumSum(df, stratumCol, idCol, col(weightCol), "graft_cum")
      // positive weights keep both operands non-negative, so truncating
      // `div` IS floor division in both engines
      .filter(col(weightCol) > 0 &&
        expr(s"graft_cum div $stride") >
          expr(s"(graft_cum - $weightCol) div $stride"))
      .drop("graft_cum")
  }
  /** DuckDB mirror of [[weightedSystematicSample]] — a QUALIFY conjunct
    * (`//` is DuckDB's integer division). */
  def weightedSystematicSampleSql(stratumExpr: String, idExpr: String,
                                  weightExpr: String, stride: Long): String = {
    val cum = s"""sum(CAST($weightExpr AS BIGINT)) OVER (PARTITION BY $stratumExpr
                 |  ORDER BY ${arithBucketSql(idExpr)}, $idExpr
                 |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
    s"$weightExpr > 0 AND ($cum) // $stride > (($cum) - $weightExpr) // $stride"
  }

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
    * back → the admission rank as [[stratumCumSum]] over value 1 (a
    * prefix COUNT is a prefix sum) — range-partitioned, no per-stratum
    * single-task window sort, same hazard-free shape as
    * [[tokenBudgetSample]].
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
    val joined = df.join(broadcast(targets), stratumCol)
    stratumCumSum(joined, stratumCol, idCol, lit(1L), "graft_rn")
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

  /** Seeded FULL-RANGE mixer for epoch shuffling: ((id mod P + seed) mod P
    * · K) mod P — unlike [[arithBucket]] (mod-1000, 1000 coarse buckets)
    * this keeps all ~1e9 values of the mix, so ordering by (mix, id) is a
    * near-total pseudorandom permutation with a different order per seed.
    * Exact integer arithmetic: every intermediate < 2^63 in both engines. */
  def epochOrd(id: Column, seed: Long): Column =
    pmod(pmod(pmod(id.cast("long"), lit(P)) + lit(((seed % P) + P) % P),
      lit(P)) * lit(K), lit(P))
  def epochOrdSql(c: String, seed: Long): String =
    s"((((((($c % $P) + $P) % $P) + ${((seed % P) + P) % P}) % $P) * $K) % $P)"

  /** Deterministic EPOCH SHUFFLE for training-data pipelines: assign each
    * row its 1-based position in the seed's pseudorandom permutation
    * (order by ([[epochOrd]], id)) as `outCol`. A training run sorts/
    * buckets by the position to read a differently-ordered corpus per
    * epoch — reproducible across runs, partitionings, and engines (the
    * property `df.orderBy(rand(seed))` does NOT have), with no curriculum
    * leakage from ingest order.
    *
    * Scale shape: position = prefix count over one global order — computed
    * by [[stratumCumSum]]'s range-partitioned two-phase pass (constant
    * stratum: the order spreads over ALL partitions; no Window, no
    * single-task sort anywhere — ScaleSpec asserts it). */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
                   outCol: String = "epoch_pos"): DataFrame = {
    require(!df.columns.contains("graft_stratum"),
      "input already has a graft_stratum column — rename it first")
    stratumCumSum(df.withColumn("graft_stratum", lit(0)), "graft_stratum",
      idCol, lit(1L), outCol, Some(epochOrd(col(idCol), seed)))
      .drop("graft_stratum")
  }

  /** DuckDB mirror of [[epochShuffle]]: row_number over the same seeded
    * order. */
  def epochShuffleSql(idExpr: String, seed: Long, outCol: String = "epoch_pos"): String =
    s"row_number() OVER (ORDER BY ${epochOrdSql(idExpr, seed)}, $idExpr) AS $outCol"

  private val StrideScale = 1000000L

  /** CURRICULUM / mixture interleaving by stride scheduling (Waldspurger &
    * Weihl's stride scheduler applied to data mixing): assign every row a
    * global training position such that strata interleave PROPORTIONALLY
    * to their weights throughout the epoch — stratum s's k-th document
    * (in deterministic id order) runs at virtual time ⌊k·SCALE/wₛ⌋, and
    * the epoch is the ascending (vtime, stratum, id) order. A weight-3
    * stratum appears ~3× as often as a weight-1 stratum at EVERY point of
    * training, which is what mixture schedules actually promise (contrast
    * concatenated corpora, where domains arrive in blocks). Exact integer
    * arithmetic end to end — reproducible across runs, partitionings, and
    * engines; headroom: n·SCALE < 2⁶³ holds to ~9×10¹² rows per stratum.
    *
    * Both passes are [[stratumCumSum]]'s range-partitioned two-phase
    * prefix count (per-stratum seq, then the global position over the
    * stride order) — no Window, no single-task sort; a dominant stratum
    * spreads over many partitions. Returns the input plus `outCol`
    * (1-based global position). */
  def curriculumOrder(df: DataFrame, stratumCol: String, idCol: String,
                      weightByStratum: Map[String, Long],
                      defaultWeight: Long = 1L,
                      outCol: String = "train_pos"): DataFrame = {
    (weightByStratum.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 1, s"weights must be >= 1, got $w"))
    val seqd = stratumCumSum(df, stratumCol, idCol, lit(1L), "graft_seq",
      Some(col(idCol)))
    val w = weightByStratum.foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val vtime = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(col("graft_seq") * StrideScale),
        org.apache.spark.sql.GraftBridge.expression(w)))
    stratumCumSum(
      seqd.withColumn("graft_vt", vtime)
        .withColumn("graft_all", lit(0)),
      "graft_all", idCol, lit(1L), outCol,
      Some(struct(col("graft_vt"), col(stratumCol))))
      .drop("graft_seq", "graft_vt", "graft_all")
  }

  /** DuckDB mirror of [[curriculumOrder]] as a full SELECT over `table`
    * (two window passes mirror the two prefix counts). */
  def curriculumOrderSql(table: String, stratumCol: String, idCol: String,
                         weightByStratum: Map[String, Long],
                         defaultWeight: Long = 1L,
                         outCol: String = "train_pos"): String = {
    val w = weightByStratum.foldLeft(s"$defaultWeight") {
      case (acc, (k, v)) => s"CASE WHEN $stratumCol = '$k' THEN $v ELSE $acc END"
    }
    s"""SELECT * EXCLUDE (graft_seq),
       |  row_number() OVER (ORDER BY (graft_seq * $StrideScale) // ($w),
       |    $stratumCol, $idCol) AS $outCol
       |FROM (SELECT *, row_number() OVER (PARTITION BY $stratumCol
       |        ORDER BY $idCol) AS graft_seq FROM $table)""".stripMargin
  }
}
