package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each left row with every right row whose
  * event time falls in `[leftTime - before, leftTime + after]` — with NO
  * equi-key between the sides.
  *
  * The reference has no such operator (its only join is hash equi-join,
  * SURVEY §2.3); this is driver-mandated time-series capability growth.
  *
  * Naively this is a pure range-condition join, which Spark must plan as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) compares and a broadcast of a whole
  * side, both fatal at 100 TB. Instead we BUCKETIZE time: with bucket width
  * `w = before + after`, a left row's window overlaps at most two
  * consecutive buckets, and a right row lives in exactly one. Exploding the
  * left side to its (≤2) overlapped buckets turns the range join into an
  * equi-join on the bucket id — hash-partitionable, AQE-balanceable — with
  * the exact range predicate applied as a post-filter. Each qualifying pair
  * meets exactly once (the right bucket is unique), so no distinct is
  * needed.
  *
  * Skew note: a hot bucket (event burst) shuffles to one partition; at
  * scale either widen w (fewer, bigger buckets trade compare work for
  * balance) or salt the bucket id on both sides. AQE's skew-join splitting
  * also applies, since this is a plain shuffled equi-join.
  */
object RangeJoin {

  /** @param left       probe side; keeps all its columns
    * @param right      match side; keeps all its columns (caller should
    *                   pre-select/rename to avoid collisions)
    * @param leftTime   TimestampType column on `left`
    * @param rightTime  TimestampType column on `right`
    * @param beforeUs   microseconds of window reaching back from leftTime
    * @param afterUs    microseconds of window reaching forward
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTime: String, rightTime: String,
                   beforeUs: Long, afterUs: Long): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      "window must be non-empty")
    val w = beforeUs + afterUs
    // integer floor-div that stays exact in Column arithmetic: epoch-micros
    // are positive, so (a - a mod w) / w is an exact long division.
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(w))) / lit(w)).cast("long")
    val l = left
      .withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__bucket", explode(array_distinct(array(
        bucketOf(col("__lt") - lit(beforeUs)),
        bucketOf(col("__lt") + lit(afterUs))))))
    val r = right
      .withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__bucket", bucketOf(col("__rt")))
    l.join(r, Seq("__bucket"))
      .filter(col("__rt") >= col("__lt") - lit(beforeUs) &&
        col("__rt") <= col("__lt") + lit(afterUs))
      .drop("__bucket", "__lt", "__rt")
  }
}
