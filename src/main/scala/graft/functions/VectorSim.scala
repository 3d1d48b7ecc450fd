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
