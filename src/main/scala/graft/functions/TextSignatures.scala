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

  /** Distinct xxhash64-chain hashes of EXACT n-token windows (round-16
    * optimization of the contamination family): the hashed twin of
    * `array_distinct(transform(...windows...,concat_ws(' ', slice(toks,i,n))))`
    * — documents shorter than n tokens yield the EMPTY array (unlike
    * [[shingleHashes]], which falls back to the whole-text shingle).
    *
    * Tokens hash once each (`XXH64.hashUTF8String`, seed 42) and windows
    * chain the n token hashes (`XXH64.hashLong`), so the pass allocates
    * no gram strings and costs O(len) string hashing + O(len·n) long
    * mixing. Two windows chain to the same hash iff their token
    * sequences are equal (modulo 2⁻⁶⁴ collisions — the same accepted
    * equivalence as the [[shingleHashes]]-based jaccard family, whose
    * oracles compare string shingles): tokens cannot contain the space
    * separator, so token-sequence equality coincides with the string
    * n-gram equality the DuckDB oracles spell. */
  def ngramHashes(text: UTF8String, n: Int): Array[Long] = {
    val toks = tokenize(text.toString)
    if (toks.length < n) return Array.emptyLongArray
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      th(i) = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
      i += 1
    }
    val out = new Array[Long](toks.length - n + 1)
    i = 0
    while (i < out.length) {
      var h = 42L
      var j = i
      while (j < i + n) { h = XXH64.hashLong(th(j), h); j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** Sorted distinct xxhash64 of every 3-char window of `text` (round-16
    * optimization of the trigram posting index): the hashed twin of
    * `array_distinct(transform(sequence(1, len-2), i -> substr(text,i,3)))`.
    * Texts shorter than 3 chars index nothing, mirroring
    * [[graft.fts.Fts.trigramIndex]]'s length gate. Hashing is over the
    * UTF-16 code units of the 3-char substring (seed 42) — both the index
    * side and the query side ([[graft.fts.Fts.substringSearch]]'s pattern
    * grams) hash through THIS method, so present-substring grams always
    * match; hash collisions can only ADD candidates, which the verifying
    * `contains` pass removes — the search result is exactly the string
    * formulation's on any input. */
  def trigramHashes(text: UTF8String): Array[Long] = {
    val s = text.toString
    if (s.length < 3) return Array.emptyLongArray
    val out = new Array[Long](s.length - 2)
    var i = 0
    while (i < out.length) {
      out(i) = XXH64.hashUTF8String(
        UTF8String.fromString(s.substring(i, i + 3)), 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
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

  /** [[bpeApplyMerge]] over Catalyst ArrayData — the codegen entry point. */
  def bpeApplyMergeData(in: ArrayData, a: String, b: String): ArrayData = {
    val syms = in.toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bpeApplyMerge(syms, a, b).map(UTF8String.fromString))
  }

  /** [[bpeEncodeWord]] over Catalyst types — the codegen entry point. */
  def bpeEncodeWordData(word: UTF8String, as: Array[String],
                        bs: Array[String], eow: String): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bpeEncodeWord(word, as, bs, eow).map(UTF8String.fromString))

  /** One greedy left-to-right BPE merge (a, b) → a+b over a symbol array
    * (round 16): the native twin of [[graft.llm.Bpe.applyMerge]]'s
    * Sep-joined `aggregate` fold (HOF folds interpret per row). The
    * fold's merge test `acc.endsWith(Sep + a)` is exactly "the previous
    * COMPLETE symbol equals a": a freshly merged a+b can never equal a
    * (b is non-empty), so within-round cascades are impossible in both
    * formulations. Equivalence assumes symbols do not contain U+001F —
    * the fold's own documented precondition (its separator). */
  def bpeApplyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new java.util.ArrayList[String](syms.length)
    var j = 0
    while (j < syms.length) {
      val s = syms(j)
      if (!out.isEmpty && out.get(out.size - 1) == a && s == b)
        out.set(out.size - 1, a + b)
      else out.add(s)
      j += 1
    }
    out.toArray(new Array[String](out.size))
  }

  /** BPE-encode one WORD through an ordered merge chain (round 16): the
    * native twin of `chars(word) :+ eow` followed by the chained
    * [[bpeApplyMerge]] folds — one kernel call instead of merges+1
    * interpreted HOF passes per word. Splitting is by code point,
    * matching Spark's character-positioned `substr`. */
  def bpeEncodeWord(word: UTF8String, as: Array[String], bs: Array[String],
                    eow: String): Array[String] = {
    val w = word.toString
    var syms = new Array[String](0)
    val buf = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      buf.add(w.substring(i, i + cc))
      i += cc
    }
    buf.add(eow)
    syms = buf.toArray(new Array[String](buf.size))
    var m = 0
    while (m < as.length) {
      syms = bpeApplyMerge(syms, as(m), bs(m))
      m += 1
    }
    syms
  }

  // ---- Column wrappers ----
  def shingle_hashes(c: Column, n: Int = 3): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), n))
  def ngram_hashes(c: Column, n: Int): Column =
    GraftBridge.column(NgramHashes(GraftBridge.expression(c), n))
  def trigram_hashes(c: Column): Column =
    GraftBridge.column(TrigramHashes(GraftBridge.expression(c)))
  def bpe_apply_merge(c: Column, a: String, b: String): Column =
    GraftBridge.column(BpeApplyMergeExpr(GraftBridge.expression(c), a, b))
  def bpe_encode_word(c: Column, merges: Seq[(String, String)],
                      eow: String): Column =
    GraftBridge.column(BpeEncodeWordExpr(GraftBridge.expression(c),
      merges.map(_._1).toArray, merges.map(_._2).toArray, eow))
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

/** string → sorted distinct Array[Long] of exact-n-word-gram hashes. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextKernels.ngramHashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels.ngramHashes($c, $n));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** string → sorted distinct Array[Long] of 3-char-window hashes. */
case class TrigramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextKernels.trigramHashes(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels.trigramHashes($c));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TrigramHashes =
    copy(child = newChild)
}

/** array<string> symbols → array<string> after one greedy BPE merge. */
case class BpeApplyMergeExpr(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_apply_merge"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeApplyMergeData(input.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", a, "java.lang.String")
    val bRef = ctx.addReferenceObj("bpeB", b, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.bpeApplyMergeData($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMergeExpr =
    copy(child = newChild)
}

/** string word → array<string> BPE tokens through an ordered merge chain. */
case class BpeEncodeWordExpr(child: Expression, as: Array[String],
                             bs: Array[String], eow: String)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_word"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncodeWordData(input.asInstanceOf[UTF8String], as, bs, eow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("bpeAs", as, "java.lang.String[]")
    val bsRef = ctx.addReferenceObj("bpeBs", bs, "java.lang.String[]")
    val eowRef = ctx.addReferenceObj("bpeEow", eow, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.bpeEncodeWordData($c, $asRef, $bsRef, $eowRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWordExpr =
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
