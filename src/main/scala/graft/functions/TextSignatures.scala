package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document signature kernels for the dedup family (SURVEY §2.12),
  * as native codegen'd Catalyst expressions.
  *
  * Why not Column HOFs: `transform`/`aggregate` lambdas are interpreted
  * (never whole-stage-codegen'd), and the simhash/minhash formulations via
  * explode+groupBy buy a full shuffle for what is a per-row computation.
  * These expressions run the whole signature loop scan-side inside
  * WholeStageCodegen — at 100 TB signatures ride the scan with zero
  * shuffles, and the only shuffled data is (id, signature).
  *
  * Hash parity: token/shingle hashing is `XXH64.hashUTF8String(_, 42L)` —
  * bit-identical to Spark's `xxhash64(col)` — so signatures equal the
  * round-1 HOF formulation's output exactly.
  */
object TextKernels {

  /** 2^31-1, Mersenne prime — the minhash universe. */
  final val P = 2147483647L

  /** deterministic per-i affine hash params (splitmix-style mixing) */
  def hashA(i: Int): Long = math.abs((i * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L) % (P - 1)) + 1
  def hashB(i: Int): Long = math.abs((i * 0xD6E8FEB86659FD93L + 0x2545F4914F6CDD1DL) % P)

  private def pmod(a: Long, p: Long): Long = { val m = a % p; if (m < 0) m + p else m }

  /** Fts.tokens parity: lowercase, strip commas, split on single space
    * (trailing empties kept, like Spark's split with limit -1). */
  def tokenize(text: String): Array[String] =
    text.toLowerCase.replace(",", "").split(" ", -1)

  /** Sorted distinct xxhash64 of n-word shingles — semantics of
    * `array_distinct(transform(Dedup.shingles(Fts.tokens(text)), xxhash64))`
    * (docs shorter than n yield their single whole-text shingle). */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val toks = tokenize(text.toString)
    val last = math.max(toks.length - n, 0)
    val hs = new Array[Long](last + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
      hs(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run
    var w = 0
    i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** LSH band hashes from a doc's shingle-hash set: k = bands×rowsPerBand
    * affine minhashes over Z_P, then per-band xxhash64-chain (seed 42) —
    * identical to `xxhash64(m_i..m_j)` over the round-1 signature columns. */
  def minhashBandHashes(sh: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s < sh.length) {
      val h = pmod(sh(s), P)
      var i = 0
      while (i < k) {
        val v = pmod(h * hashA(i) + hashB(i), P)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    val out = new Array[Long](bands)
    var bi = 0
    while (bi < bands) {
      var h = 42L
      var r = bi * rowsPerBand
      while (r < (bi + 1) * rowsPerBand) { h = XXH64.hashLong(mins(r), h); r += 1 }
      out(bi) = h
      bi += 1
    }
    out
  }

  /** 64-bit SimHash: per-token xxhash64, strict per-bit majority vote over
    * all tokens (duplicates counted, matching the round-1 explode+groupBy
    * formulation — and without its 8-bit-counter cap). */
  def simhash64(text: UTF8String): Long = {
    val toks = tokenize(text.toString)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(toks(t)), 42L)
      var i = 0
      while (i < 64) { counts(i) += ((h >>> i) & 1L).toInt; i += 1 }
      t += 1
    }
    val n = toks.length
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) * 2 > n) sig |= (1L << i); i += 1 }
    sig
  }

  // ---- Column wrappers ----
  def shingle_hashes(c: Column, n: Int = 3): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), n))
  def minhash_band_hashes(c: Column, bands: Int, rowsPerBand: Int): Column =
    GraftBridge.column(MinHashBandHashes(GraftBridge.expression(c), bands, rowsPerBand))
  def simhash_64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}

/** string → sorted distinct Array[Long] of n-word-shingle xxhash64s. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextKernels.shingleHashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels.shingleHashes($c, $n));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Array[Long] shingle hashes → Array[Long] of `bands` LSH band hashes. */
case class MinHashBandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextKernels.minhashBandHashes(
        input.asInstanceOf[ArrayData].toLongArray(), bands, rowsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels.minhashBandHashes(
         |    $c.toLongArray(), $bands, $rowsPerBand));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

/** string → 64-bit SimHash signature. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
