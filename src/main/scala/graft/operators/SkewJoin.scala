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

  /** Bloom-pruned inner equi-join — the SELECTIVE-dimension shape: when
    * the dim side is too big to broadcast whole rows but its KEY SET's
    * bloom (~10 bits/key at fpp 1%) broadcasts fine, probe the bloom
    * scan-side on the fact table BEFORE the shuffle, so the exchange
    * moves only ~(selectivity + fpp) of the fact rows. This is what
    * AQE's runtime bloom filters do opportunistically, expressed as an
    * explicit, always-on operator. EXACT: blooms have no false
    * negatives, and false positives are dropped by the join itself — the
    * result is bit-identical to the plain join (the oracle).
    *
    * Costs (same contract as Dedup.seenFilter): one pass over the dim
    * keys to build the bloom (count + aggregation) and one non-codegen
    * UDF probe per fact row — O(fact scan), never O(dim)·O(fact). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedKeys: Long = 0L, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"need fpp in (0,1), got $fpp")
    val n = if (expectedKeys > 0) expectedKeys else math.max(1L, dim.count())
    val bloom = dim.select(xxhash64(col(dimKey)).as("h"))
      .stat.bloomFilter("h", n, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
    fact.filter(mightContain(xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
