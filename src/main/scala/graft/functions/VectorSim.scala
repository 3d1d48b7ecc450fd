package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Vector kernels as codegen'd Catalyst expressions.
  *
  * The Column-HOF formulations (`aggregate(zip_with(...))` folds) interpret
  * per element per row and never enter whole-stage codegen; these run fused
  * primitive loops inside WSCG. Arithmetic is the same ascending-index
  * double left-fold as `Similarity.dot` and the DuckDB oracle, so scores
  * are bit-identical for float inputs — and every element type is widened
  * EXACTLY (float fused as before; double stays double; int/long widen to
  * double losslessly — never the silent float downcast of round 2).
  *
  * Mismatched array lengths return NULL, preserving the semantics of the
  * zip_with/aggregate HOF the cosine kernel replaced.
  */
object VectorKernels {

  // element-type codes baked into generated code: 0=float 1=double 2=int 3=long
  private[functions] def codeOf(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case _ => -1
  }

  def asDoubles(a: ArrayData, code: Int): Array[Double] = code match {
    case 1 => a.toDoubleArray()
    case 2 =>
      val v = a.toIntArray(); val out = new Array[Double](v.length)
      var i = 0; while (i < v.length) { out(i) = v(i).toDouble; i += 1 }; out
    case 3 =>
      val v = a.toLongArray(); val out = new Array[Double](v.length)
      var i = 0; while (i < v.length) { out(i) = v(i).toDouble; i += 1 }; out
    case _ =>
      val v = a.toFloatArray(); val out = new Array[Double](v.length)
      var i = 0; while (i < v.length) { out(i) = v(i).toDouble; i += 1 }; out
  }

  /** single fused pass: dot, |a|², |b|² → cosine. `aCode`/`bCode` are
    * codegen-time constants (the JIT folds the branch away). */
  def cosine(a: ArrayData, b: ArrayData, aCode: Int, bCode: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    if (aCode == 0 && bCode == 0) {
      val av = a.toFloatArray()
      val bv = b.toFloatArray()
      var i = 0
      while (i < av.length) {
        val x = av(i).toDouble; val y = bv(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      val av = asDoubles(a, aCode)
      val bv = asDoubles(b, bCode)
      var i = 0
      while (i < av.length) {
        val x = av(i); val y = bv(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** memoized plane matrices keyed by (offset, planes, dims) — the splitmix
    * mixing is pure, so each matrix is computed once per executor JVM
    * instead of 3 integer mixes per element per row. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()
  private def planesFor(offset: Int, planes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((offset, planes, dims), { key =>
      val (off, p, d) = key
      Array.tabulate(p, d)((pi, di) => graft.llm.Similarity.coeff(off + pi, di))
    })

  /** Banded random-hyperplane bucket id in one fused loop (codegen'd twin
    * of the `Similarity.lshBucket` HOF spec — same splitmix coefficients,
    * same ascending-index dot fold, bit-identical buckets when `dims` ==
    * vector length). `dims` <= 0 means the full vector; a positive `dims`
    * buckets on that coordinate prefix (requires dims <= vector length). */
  def lshBucket(v: ArrayData, planes: Int, offset: Int, dims: Int, code: Int): Long = {
    val arr = asDoubles(v, code)
    val n = if (dims <= 0) arr.length else math.min(dims, arr.length)
    val mat = planesFor(offset, planes, n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val plane = mat(p)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += arr(d) * plane(d); d += 1 }
      if (dot >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  def lsh_bucket(vec: Column, planes: Int, offset: Int = 0, dims: Int = 0): Column =
    GraftBridge.column(LshBucket(GraftBridge.expression(vec), planes, offset, dims))

  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$fn expects an integer literal, got $other")
  }

  /** SQL-arg builders shared by [[register]] and GraftExtensions, with
    * arity checks so a wrong-arity call reads as a signature error rather
    * than an IndexOutOfBoundsException. */
  def sqlCosineSim(exprs: Seq[Expression]): CosineSim = {
    require(exprs.length == 2,
      s"cosine_sim expects 2 arguments (a, b), got ${exprs.length}")
    CosineSim(exprs(0), exprs(1))
  }
  def sqlLshBucket(exprs: Seq[Expression]): LshBucket = {
    require(exprs.length >= 2 && exprs.length <= 4,
      s"lsh_bucket expects 2-4 arguments (vec, planes[, offset[, dims]]), got ${exprs.length}")
    LshBucket(exprs(0),
      litInt(exprs(1), "lsh_bucket"),
      if (exprs.length > 2) litInt(exprs(2), "lsh_bucket") else 0,
      if (exprs.length > 3) litInt(exprs(3), "lsh_bucket") else 0)
  }

  /** Register for SQL use: `SELECT cosine_sim(a, b)`,
    * `SELECT lsh_bucket(vec, planes[, offset[, dims]])`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => sqlCosineSim(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket", exprs => sqlLshBucket(exprs), "scala_udf")
  }
}

/** (array<float|double|int|long>, same) → double cosine similarity;
  * NULL on length mismatch. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  import VectorKernels.codeOf
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    if (codeOf(left.dataType) >= 0 && codeOf(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double|int|long> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else VectorKernels.cosine(av, bv, codeOf(left.dataType), codeOf(right.dataType))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorKernels.cosine(
         |    $a, $b, ${codeOf(left.dataType)}, ${codeOf(right.dataType)});
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** array<float|double|int|long> → long banded LSH bucket id. */
case class LshBucket(child: Expression, planes: Int, offset: Int, dims: Int)
    extends UnaryExpression {
  import VectorKernels.codeOf
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (codeOf(child.dataType) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float|double|int|long>, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.lshBucket(v.asInstanceOf[ArrayData], planes, offset, dims,
      codeOf(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.lshBucket($v, $planes, $offset, $dims, ${codeOf(child.dataType)})")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}
