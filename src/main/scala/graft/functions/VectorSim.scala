package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over embedding arrays as a codegen'd kernel.
  *
  * The Column-HOF formulation (`aggregate(zip_with(...))` for dot and the
  * two norms) interprets per element per pair — three lambda folds that
  * never enter whole-stage codegen. This expression runs one fused loop
  * over the arrays inside WSCG. Arithmetic is the same ascending-index
  * double left-fold as `Similarity.dot` and the DuckDB oracle, so scores
  * are bit-identical for float inputs — and double inputs stay double
  * (no silent float downcast; each element type gets its own extraction,
  * all accumulation is double either way).
  *
  * Mismatched array lengths return NULL, preserving the semantics of the
  * zip_with/aggregate HOF this kernel replaced.
  */
object VectorKernels {

  /** single fused pass: dot, |a|², |b|² → cosine. `aFloat`/`bFloat` are
    * codegen-time constants (the JIT folds the branch away). */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    if (aFloat && bFloat) {
      val av = a.toFloatArray()
      val bv = b.toFloatArray()
      var i = 0
      while (i < av.length) {
        val x = av(i).toDouble; val y = bv(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      val av = if (aFloat) floatsToDoubles(a.toFloatArray()) else a.toDoubleArray()
      val bv = if (bFloat) floatsToDoubles(b.toFloatArray()) else b.toDoubleArray()
      var i = 0
      while (i < av.length) {
        val x = av(i); val y = bv(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def floatsToDoubles(a: Array[Float]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i).toDouble; i += 1 }
    out
  }

  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Banded random-hyperplane bucket id in one fused loop (codegen'd twin
    * of the `Similarity.lshBucket` HOF spec — same splitmix coefficients,
    * same ascending-index dot fold, bit-identical buckets). */
  def lshBucket(v: ArrayData, planes: Int, offset: Int, isFloat: Boolean): Long = {
    val arr = if (isFloat) null else v.toDoubleArray()
    val arrF = if (isFloat) v.toFloatArray() else null
    val n = if (isFloat) arrF.length else arr.length
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) arrF(d).toDouble else arr(d)
        dot += x * graft.llm.Similarity.coeff(offset + p, d)
        d += 1
      }
      if (dot >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  def lsh_bucket(vec: Column, planes: Int, offset: Int = 0): Column =
    GraftBridge.column(LshBucket(GraftBridge.expression(vec), planes, offset))
}

/** array<float|double> → long banded LSH bucket id. */
case class LshBucket(child: Expression, planes: Int, offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float> or array<double>, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.lshBucket(v.asInstanceOf[ArrayData], planes, offset, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.lshBucket($v, $planes, $offset, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** (array<float|double>, array<float|double>) → double cosine similarity;
  * NULL on length mismatch. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float> or array<double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else VectorKernels.cosine(av, bv, elemIsFloat(left), elemIsFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorKernels.cosine(
         |    $a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)});
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
