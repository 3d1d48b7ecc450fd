package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical anomaly flagging (growth beyond the reference — it has no
  * aggregation beyond count, server.py — and the builder brief's
  * event-analytics surface).
  *
  * Z-score outlier detection in EXACT integer arithmetic: flag row x in
  * its group iff `(n·x − Σ)² > k²·(n·Σx² − Σ²)`, which is algebraically
  * `z² > k²` for the population z-score z = (x − mean)/σ — the whole
  * inequality multiplied through by n²σ²·n ≥ 0. No division, no float, so
  * Spark and DuckDB agree bit-for-bit where a `(x-avg)/stddev` comparison
  * would be one ULP away from flipping rows at the threshold.
  *
  * Overflow contract: values are integer (e.g. cents); the caller picks a
  * group granularity such that `n · max|x|  <  3·10⁹` per group (then
  * both squared terms stay under 2⁶³). Day- or hour-bucketed groups — the
  * shape anomaly detection wants anyway — satisfy this at any corpus
  * size; one global group over 100 TB would not.
  *
  * Plan shape: one partial-aggregated shuffle builds the per-group
  * (n, Σ, Σx²) stats — one row per group — which broadcast back onto the
  * fact scan; the filter is scan-side codegen. Nothing corpus-sized
  * shuffles twice and nothing sorts.
  */
object Anomaly {

  /** Rows of `df` whose `valueCol` (integral) deviates from its group's
    * mean by more than `k` population standard deviations. NULL values are
    * neither flagged nor counted in the stats. Stats columns are dropped
    * from the output. σ = 0 groups (all-equal values) flag nothing. */
  def zscoreOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val v = col(valueCol)
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(v).as("graft_n"), sum(v).as("graft_s"),
        sum(v * v).as("graft_q"))
    val num = col("graft_n") * v - col("graft_s")
    df.join(broadcast(stats), groupCols)
      .filter(num * num >
        lit(k.toLong * k) *
          (col("graft_n") * col("graft_q") - col("graft_s") * col("graft_s")))
      .drop("graft_n", "graft_s", "graft_q")
  }

  /** DuckDB mirror: emits a `WITH`-body fragment pair — callers inline
    * `statsSql` as a CTE over the same fact selection and reuse the
    * predicate. Kept simple: the oracle queries write the two-CTE shape
    * directly (see TimeSuite.time_zscore). */
  def predicateSql(n: String, s: String, q: String, v: String, k: Int): String =
    s"($n * $v - $s) * ($n * $v - $s) > ${k.toLong * k} * ($n * $q - $s * $s)"
}
