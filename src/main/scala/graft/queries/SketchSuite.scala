package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.sketch.{CountMin, Histo, Kmv, MisraGries}

/** KMV distinct-count sketches (graft.sketch.Kmv) — mergeable cardinality
  * summaries. Every query here is hash-checked: the sketch machinery is
  * exact-deterministic (mult-mod permutation hash, sorted-distinct-prefix
  * sketches, integer-division estimator), so DuckDB reproduces sketch
  * bytes AND estimates bit-for-bit via list arithmetic.
  *
  * k is sized against the fixtures to exercise BOTH estimator branches
  * across driver SFs: distinct users/event_type = 15 at sf0.001 (< k=64 →
  * exact-length branch) and 150 at sf0.01 (> k → (k-1)·P/h_k branch);
  * the 31-token vocab runs the estimator branch at k=16 everywhere.
  */
object SketchSuite extends Suite {

  private val P = Kmv.P

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "events")

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents")

  def defs: Map[String, Q] = Map(

    // EXACT heavy hitters over the token stream: Misra-Gries candidate
    // pruning (k counters per task — never a domain-sized shuffle) then
    // an exact count restricted to the candidates, so the result is
    // bit-identical to the naive HAVING plan the oracle runs. k=64 keeps
    // the ~31-word common vocab above threshold and the planted
    // u<doc_id> singletons below it at every driver SF.
    "heavy_hitters" -> Q(
      (s, d) => {
        val terms = docs(s, d).select(
          explode(split(lower(col("text")), " ")).as("term"))
        MisraGries.heavyHittersExact(terms, "term", 64)
      },
      Some("""WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS term
             |          FROM documents)
             |SELECT term, CAST(count(*) AS BIGINT) AS cnt
             |FROM t GROUP BY term
             |HAVING count(*) * 64 > (SELECT count(*) FROM t)""".stripMargin)),

    // distinct users per event type: sketch estimate next to the exact
    // count — the error-visible data-card row. 100 TB: the sketch build
    // is one bounded fold + one ≤ nPart·k shuffle; the exact column is
    // the thing you could NOT keep pre-aggregated.
    "sketch_distinct_users" -> Q(
      (s, d) => {
        val sk = Kmv.sketch(events(s, d), Seq("event_type"),
          Kmv.kmvHash(col("user_id")), 64)
        val exact = events(s, d).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact"))
        sk.join(exact, "event_type")
          .select(col("event_type"), Kmv.estimate(col("kmv"), 64).as("est"),
            col("exact"))
      },
      Some(s"""WITH h AS (SELECT event_type, ${Kmv.kmvHashSql("user_id")} AS hh
              |          FROM events),
              |sk AS (SELECT event_type, ${Kmv.sketchAggSql("hh", 64)} AS kmv
              |       FROM h GROUP BY event_type),
              |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact
              |       FROM events GROUP BY event_type)
              |SELECT sk.event_type, ${Kmv.estimateSql("kmv", 64)} AS est, exact
              |FROM sk JOIN ex ON sk.event_type = ex.event_type""".stripMargin)),

    // the MERGEABILITY story: per-(type, day) sketch rows — the shape a
    // 100 TB pipeline stores as a daily summary — fold per type, and the
    // union sketch's estimate must equal the direct one (k-min of a union
    // is a subset of the parts' k-mins; the fold is exact, not a bound).
    "sketch_merge_daily" -> Q(
      (s, d) => {
        val ev = events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
        val daily = Kmv.sketch(ev, Seq("event_type", "day"),
          Kmv.kmvHash(col("user_id")), 64)
        Kmv.merge(daily, Seq("event_type"), "kmv", 64)
          .select(col("event_type"), Kmv.estimate(col("kmv"), 64).as("est"))
      },
      Some(s"""WITH h AS (SELECT event_type,
              |            epoch_ns(ts) // 86400000000000 AS day,
              |            ${Kmv.kmvHashSql("user_id")} AS hh
              |          FROM events),
              |daily AS (SELECT event_type, day, ${Kmv.sketchAggSql("hh", 64)} AS kmv
              |          FROM h GROUP BY event_type, day),
              |m AS (SELECT event_type, ${Kmv.mergeAggSql("kmv", 64)} AS kmv
              |      FROM daily GROUP BY event_type)
              |SELECT event_type, ${Kmv.estimateSql("kmv", 64)} AS est FROM m""".stripMargin)),

    // audience-overlap jaccard between 'click' and every other event type,
    // estimated from the two sketches alone (|X ∩ A ∩ B| / |X| over the
    // union's k-min sample) next to the exact set jaccard — the pairwise
    // question sketch summaries answer without re-reading either side.
    "sketch_jaccard_types" -> Q(
      (s, d) => {
        val sk = Kmv.sketch(events(s, d), Seq("event_type"),
          Kmv.kmvHash(col("user_id")), 64)
        val clickSk = sk.filter(col("event_type") === "click")
          .select(col("kmv").as("kmv_a"))
        val others = sk.filter(col("event_type") =!= "click")
        val users = events(s, d).select("event_type", "user_id").distinct()
        val clickUsers = users.filter(col("event_type") === "click")
          .select("user_id")
        val inter = users.filter(col("event_type") =!= "click")
          .join(clickUsers, "user_id")
          .groupBy("event_type").agg(countDistinct(col("user_id")).as("inter"))
        val exact = users.filter(col("event_type") =!= "click")
          .groupBy("event_type").agg(countDistinct(col("user_id")).as("nb"))
          .join(inter, Seq("event_type"), "left").na.fill(0L, Seq("inter"))
          .crossJoin(clickUsers.agg(countDistinct(col("user_id")).as("na")))
          .select(col("event_type"),
            round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")).cast("double"), 4)
              .as("exact_jaccard"))
        others.crossJoin(clickSk)
          .select(col("event_type"),
            Kmv.jaccard(col("kmv_a"), col("kmv"), 64).as("est_jaccard"))
          .join(exact, "event_type")
      },
      Some(s"""WITH h AS (SELECT event_type, user_id,
              |            ${Kmv.kmvHashSql("user_id")} AS hh
              |          FROM events),
              |sk AS (SELECT event_type, ${Kmv.sketchAggSql("hh", 64)} AS kmv
              |       FROM h GROUP BY event_type),
              |ck AS (SELECT kmv AS kmv_a FROM sk WHERE event_type = 'click'),
              |u AS (SELECT DISTINCT event_type, user_id FROM events),
              |ex AS (SELECT b.event_type,
              |         round(count(DISTINCT CASE WHEN a.user_id IS NOT NULL
              |                 THEN b.user_id END)::DOUBLE /
              |           ((SELECT count(DISTINCT user_id) FROM u
              |             WHERE event_type = 'click')
              |            + count(DISTINCT b.user_id)
              |            - count(DISTINCT CASE WHEN a.user_id IS NOT NULL
              |                THEN b.user_id END)), 4) AS exact_jaccard
              |       FROM u b LEFT JOIN (SELECT user_id FROM u
              |                           WHERE event_type = 'click') a
              |         ON b.user_id = a.user_id
              |       WHERE b.event_type <> 'click'
              |       GROUP BY b.event_type)
              |SELECT sk.event_type,
              |  ${Kmv.jaccardSql("kmv_a", "kmv", 64)} AS est_jaccard,
              |  exact_jaccard
              |FROM sk CROSS JOIN ck JOIN ex ON sk.event_type = ex.event_type
              |WHERE sk.event_type <> 'click'""".stripMargin)),

    // distinct-vocabulary estimate over the corpus tokens — string keys
    // route through the rolling-hash codegen kernel (same modulus P), so
    // the token never shuffles: the sketch fold sees longs only.
    "sketch_vocab" -> Q(
      (s, d) => {
        val toks = docs(s, d)
          .select(explode(graft.fts.Fts.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
        val sk = Kmv.sketch(toks, Seq.empty,
          graft.functions.RollingHash.rolling_hash(col("tok")), 16)
        val exact = toks.agg(countDistinct(col("tok")).as("exact"))
        sk.crossJoin(exact)
          .select(Kmv.estimate(col("kmv"), 16).as("est"), col("exact"))
      },
      Some(s"""WITH toks AS (SELECT tok FROM (
              |    SELECT unnest(string_split(replace(lower(text), ',', ''), ' ')) AS tok
              |    FROM documents) WHERE tok <> ''),
              |h AS (SELECT list_reduce(
              |        list_prepend(CAST(0 AS BIGINT),
              |          list_transform(range(1, length(tok) + 1),
              |            i -> CAST(ord(substr(tok, i, 1)) AS BIGINT))),
              |        (acc, c) -> (acc * 131 + c) % $P) AS hh
              |      FROM toks),
              |sk AS (SELECT ${Kmv.sketchAggSql("hh", 16)} AS kmv FROM h),
              |ex AS (SELECT count(DISTINCT tok) AS exact FROM toks)
              |SELECT ${Kmv.estimateSql("kmv", 16)} AS est, exact
              |FROM sk CROSS JOIN ex""".stripMargin)),

    // Count-Min point frequencies: ONE d·w-long grid summarizes per-user
    // event counts over an unbounded id space; the heaviest users' true
    // counts sit next to the sketch estimate (always ≥, exact when no row
    // collides). 100 TB: the grid is 8 KB however many users exist — the
    // per-key count table it replaces is as big as the key space.
    "sketch_cm_user_freq" -> Q(
      (s, d) => {
        val ev = events(s, d)
        val cm = CountMin.sketch(ev, Seq.empty, col("user_id"), 4, 256)
        val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
          .orderBy(col("exact").desc, col("user_id")).limit(10)
        top.crossJoin(cm)
          .select(col("user_id"),
            CountMin.estimate(col("cm"), col("user_id"), 4, 256).as("est"),
            col("exact"))
      },
      Some(s"""WITH cnt AS (SELECT idx, count(*) AS n FROM (
              |    SELECT ${CountMin.slotsUnnestSql("user_id", 4, 256)} AS idx
              |    FROM events) GROUP BY idx),
              |cm AS (SELECT list(coalesce(n, 0) ORDER BY s) AS cm
              |       FROM range(0, 1024) t(s) LEFT JOIN cnt ON cnt.idx = t.s),
              |ex AS (SELECT user_id, count(*) AS exact FROM events
              |       GROUP BY user_id ORDER BY exact DESC, user_id LIMIT 10)
              |SELECT user_id, ${CountMin.estimateSql("cm", "user_id", 4, 256)} AS est,
              |       exact
              |FROM ex CROSS JOIN cm""".stripMargin)),

    // the grid MERGE story: per-day grids (the summary a pipeline stores)
    // zip-sum into the union's grid; the oracle rebuilds the grid from ALL
    // facts directly, so the hash-match IS the mergeability proof —
    // elementwise sum of daily grids ≡ one grid over everything.
    // mergeable equi-width histogram grids (the sketch family's quantile
    // member): per-type value histograms in cents (step = $10, 64 bins)
    // plus integer-arithmetic p50/p95 estimates from the grid — grid
    // bytes AND estimates hash-checked. Exact quantiles can't
    // pre-aggregate; these grids can (see sketch_histo_merge_daily).
    "sketch_histogram" -> Q(
      (s, d) => {
        val cents = round(col("value") * 100, 0).cast("long")
        // grid rendered comma-joined: the comparator can't sort arrays,
        // and the string carries every bucket count bit-for-bit
        Histo.sketch(events(s, d), Seq("event_type"), cents,
            lo = 0L, step = 1000L, w = 64)
          .select(col("event_type"), col("hist"),
            Histo.quantile(col("hist"), 500, 0L, 1000L).as("p50"),
            Histo.quantile(col("hist"), 950, 0L, 1000L).as("p95"))
          // second select: re-aliasing hist in the SAME projection makes
          // the quantile exprs lateral-reference the string instead of
          // the input array
          .select(col("event_type"),
            concat_ws(",", transform(col("hist"), _.cast("string"))).as("hist"),
            col("p50"), col("p95"))
      },
      Some(s"""WITH ${Histo.sketchCtesSql("events", "event_type",
                 "CAST(round(value * 100) AS BIGINT)", 0L, 1000L, 64)}
              |SELECT event_type, array_to_string(hist, ',') AS hist,
              |  ${Histo.quantileSql("hist", 500, 0L, 1000L)} AS p50,
              |  ${Histo.quantileSql("hist", 950, 0L, 1000L)} AS p95
              |FROM h""".stripMargin)),

    // the pre-aggregation story: per-(type, day) grid rows — the daily
    // summary a 100 TB pipeline stores — fold per type by elementwise
    // sum, and the folded grid's quantiles must equal the direct grid's
    // (the oracle computes the direct grid; the engine folds dailies).
    "sketch_histo_merge_daily" -> Q(
      (s, d) => {
        val cents = round(col("value") * 100, 0).cast("long")
        val ev = events(s, d).withColumn("day", expr("ts div 86400000000000"))
        val daily = Histo.sketch(ev, Seq("event_type", "day"), cents,
          lo = 0L, step = 1000L, w = 64)
        Histo.merge(daily, Seq("event_type"), "hist", 64)
          .select(col("event_type"),
            Histo.quantile(col("hist"), 500, 0L, 1000L).as("p50"),
            Histo.quantile(col("hist"), 990, 0L, 1000L).as("p99"))
      },
      Some(s"""WITH ${Histo.sketchCtesSql("events", "event_type",
                 "CAST(round(value * 100) AS BIGINT)", 0L, 1000L, 64)}
              |SELECT event_type,
              |  ${Histo.quantileSql("hist", 500, 0L, 1000L)} AS p50,
              |  ${Histo.quantileSql("hist", 990, 0L, 1000L)} AS p99
              |FROM h""".stripMargin)),

    // SLIDING-WINDOW distinct counts from the daily sketch store: each
    // day folds its trailing-3-day sketches (a banded self-join over the
    // tiny summary table — facts never re-touched) next to the exact
    // windowed count. The rollup shape windowed distinct counts need at
    // 100 TB, impossible with stored exact counts.
    "sketch_window_3d" -> Q(
      (s, d) => {
        val ev = events(s, d).withColumn("day", expr("ts div 86400000000000"))
        val daily = Kmv.sketch(ev, Seq("day"), Kmv.kmvHash(col("user_id")), 64)
        val win = daily.select(col("day").as("d0"))
          .join(daily.select(col("day").as("d1"), col("kmv")),
            col("d1").between(col("d0") - 2, col("d0")))
        val folded = Kmv.merge(
          win.select(col("d0").as("day"), col("kmv")), Seq("day"), "kmv", 64)
        val exact = ev.select(col("day").as("d0")).distinct()
          .join(ev.select(col("day").as("d1"), col("user_id")),
            col("d1").between(col("d0") - 2, col("d0")))
          .groupBy(col("d0").as("day"))
          .agg(countDistinct(col("user_id")).as("exact"))
        folded.join(exact, "day")
          .select(col("day"), Kmv.estimate(col("kmv"), 64).as("est"), col("exact"))
      },
      Some(s"""WITH e AS (SELECT epoch_ns(ts) // 86400000000000 AS day, user_id
              |          FROM events),
              |h AS (SELECT day, ${Kmv.kmvHashSql("user_id")} AS hh FROM e),
              |daily AS (SELECT day, ${Kmv.sketchAggSql("hh", 64)} AS kmv
              |          FROM h GROUP BY day),
              |win AS (SELECT a.day, ${Kmv.mergeAggSql("b.kmv", 64)} AS kmv
              |        FROM daily a JOIN daily b
              |          ON b.day BETWEEN a.day - 2 AND a.day
              |        GROUP BY a.day),
              |ex AS (SELECT a.day, count(DISTINCT b.user_id) AS exact
              |       FROM (SELECT DISTINCT day FROM e) a JOIN e b
              |         ON b.day BETWEEN a.day - 2 AND a.day
              |       GROUP BY a.day)
              |SELECT win.day, ${Kmv.estimateSql("kmv", 64)} AS est, exact
              |FROM win JOIN ex ON win.day = ex.day""".stripMargin)),

    "sketch_cm_merge_daily" -> Q(
      (s, d) => {
        val ev = events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
        val daily = CountMin.sketch(ev, Seq("day"), col("user_id"), 4, 256)
        val merged = CountMin.merge(daily, Seq.empty, "cm", 4, 256)
        val probes = ev.select(col("user_id")).distinct()
          .orderBy("user_id").limit(20)
        probes.crossJoin(merged)
          .select(col("user_id"),
            CountMin.estimate(col("cm"), col("user_id"), 4, 256).as("est"))
      },
      Some(s"""WITH cnt AS (SELECT idx, count(*) AS n FROM (
              |    SELECT ${CountMin.slotsUnnestSql("user_id", 4, 256)} AS idx
              |    FROM events) GROUP BY idx),
              |cm AS (SELECT list(coalesce(n, 0) ORDER BY s) AS cm
              |       FROM range(0, 1024) t(s) LEFT JOIN cnt ON cnt.idx = t.s),
              |p AS (SELECT DISTINCT user_id FROM events
              |      ORDER BY user_id LIMIT 20)
              |SELECT user_id, ${CountMin.estimateSql("cm", "user_id", 4, 256)} AS est
              |FROM p CROSS JOIN cm""".stripMargin))
  )
}
