package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder mandate: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join handles skew in sort-merge joins automatically; salting
  * is the explicit tool for the cases AQE can't split (e.g. shuffled hash
  * aggregation onto one hot key, or a hot build side). Mechanics:
  * the skewed (large) side gets a uniform random salt in [0, salts); the
  * other side is replicated `salts` ways with every salt value; the join
  * key becomes (key, salt), spreading one hot key over `salts` reducers.
  * Row multiplicity is unchanged — each left row joins the single replica
  * carrying its salt.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with `left` treated as the
    * skewed side. `right` is replicated `salts`× (keep it the smaller
    * side). */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, salts: Int): DataFrame = {
    val l = left.withColumn("__salt",
      (rand(seed = 7) * salts).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
