package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row `(key, t)`, attach the latest right row
  * with the same key and `rightTime <= t`.
  *
  * The reference has no such operator (SURVEY §2.3 "not present"); it's
  * driver-mandated capability growth for time-series workloads. Implemented
  * the scale-safe way: instead of a range-condition join (which Spark plans
  * as a per-key cross join — quadratic in events-per-key), we UNION the two
  * sides, make ONE shuffle on the key, and run a single window pass carrying
  * the last-seen right payload forward. Wall-clock is O(n log n) in
  * partition size, state is one row, and skewed keys still sort locally
  * instead of exploding.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its payload gets attached)
    * @param leftKey    join key column name on `left`
    * @param rightKey   join key column name on `right`
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    columns of `right` to carry (renamed as given)
    * @param tolerance  maximum allowed |leftTime − matched rightTime|
    *                   (pandas merge_asof's `tolerance`): a match farther
    *                   away comes out NULL, exactly like no match.
    *                   Measured after a cast-to-long of both time columns
    *                   — SECONDS for timestamps, native units for
    *                   numerics. The windowed carry is unchanged; only
    *                   the emitted match is gap-gated, so this costs one
    *                   scan-side comparison. None = unbounded (default).
    * @return left columns + payload columns (null where no prior right row)
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Map[String, String],
           tolerance: Option[Long] = None): DataFrame =
    asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      forward = false, tolerance)

  /** Forward as-of join: for each left row `(key, t)`, attach the EARLIEST
    * right row with the same key and `rightTime >= t` — the "next
    * scheduled event after this observation" lookup (next order after a
    * click, next deploy after an alert). Same single-shuffle union+window
    * plan as [[asOf]], with the time axis reversed; among right rows tied
    * on (key, time) the deterministic winner is the SMALLEST orderable
    * payload tuple (mirroring asOf's greatest-tuple rule under reversal).
    */
  def asOfForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  payload: Map[String, String],
                  tolerance: Option[Long] = None): DataFrame =
    asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      forward = true, tolerance)

  private def asOfImpl(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Map[String, String], forward: Boolean,
           tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadSchema = right.select(payload.keys.toSeq.map(col): _*).schema
    // tie-break only on ORDERABLE payload fields: a MapType (or other
    // unorderable) payload column must still be carried, but including it in
    // the ordering struct would fail analysis at orderBy.
    val tieCols = payloadSchema.fields.toSeq
      .filter(f => orderable(f.dataType)).map(f => f.name)
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
      .withColumn("__payload",
        lit(null).cast((payloadSchema.fields :+
          org.apache.spark.sql.types.StructField("__rt",
            right.schema(rightTime).dataType))
          .foldLeft(new org.apache.spark.sql.types.StructType())(_ add _)))
    // the matched right row's own time rides in the struct (reserved
    // field __rt) so the tolerance gate can measure the gap; it is NOT a
    // tie-break key (tieCols come from the declared payload only)
    val r = right
      .select((Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__isLeft"),
        struct((payload.keys.toSeq.map(col) :+
          col(rightTime).as("__rt")): _*).as("__payload"))): _*)
    val unioned = l.select(
      (leftCols.map(col) ++ Seq(col("__k"), col("__t"), col("__isLeft"), col("__payload"))): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal __t → `<=` semantics.
    // The orderable payload fields are the final tie-breaker: when several
    // right rows share (key, t), last() deterministically attaches the
    // greatest such tuple instead of whichever row the shuffle happened to
    // deliver last. Left rows all carry null payloads, so the extra key
    // never reorders them. (If NO payload field is orderable, equal-(key,t)
    // right rows have no deterministic winner — matching the pre-tie-break
    // behavior for that corner.)
    // forward mode reverses the time axis (so "last preceding" becomes
    // "first following") and the tie-break direction (so the winner among
    // equal-(key,t) right rows is the smallest tuple, not the largest).
    val tieStruct = struct(tieCols.map(c => col(s"__payload.$c")): _*)
    val tieKeys =
      if (tieCols.isEmpty) Nil
      else Seq(if (forward) tieStruct.desc else tieStruct.asc)
    val tOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy((Seq(tOrd, col("__isLeft").asc) ++ tieKeys): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match",
      last(col("__payload"), ignoreNulls = true).over(w))
    // tolerance gate: a carried match farther than `tolerance` from the
    // probe time is emitted as NULL — same output as no match at all.
    // One scan-side comparison; the window pass is untouched.
    // temporal columns go through a timestamp cast first (TIMESTAMP_NTZ
    // has no direct long cast; the session timezone applies identically
    // to both sides, so the DIFFERENCE is tz-free)
    def asEpoch(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case _: org.apache.spark.sql.types.TimestampNTZType |
             _: org.apache.spark.sql.types.TimestampType |
             _: org.apache.spark.sql.types.DateType =>
          c.cast("timestamp").cast("long")
        case _ => c.cast("long")
      }
    val gated = tolerance.fold(carried)(tol =>
      carried.withColumn("__match",
        when(abs(asEpoch(col("__t"), left.schema(leftTime).dataType) -
          asEpoch(col("__match.__rt"), right.schema(rightTime).dataType))
          <= tol, col("__match"))))
    gated.filter(col("__isLeft") === 1)
      .select(leftCols.map(col) ++
        payload.map { case (src, dst) => col(s"__match.$src").as(dst) }.toSeq: _*)
  }

  /** Can this type appear in an ORDER BY? (Mirrors Catalyst's orderability:
    * maps are not orderable; structs/arrays are iff their parts are.) */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
    case _ => true
  }
}
