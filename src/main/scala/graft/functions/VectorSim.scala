package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity over float-embedding arrays as a codegen'd kernel.
  *
  * The Column-HOF formulation (`aggregate(zip_with(...))` for dot and the
  * two norms) interprets per element per pair — three lambda folds that
  * never enter whole-stage codegen. This expression runs one fused loop
  * over the float arrays inside WSCG. Arithmetic is the same
  * ascending-index double left-fold as `Similarity.dot` and the DuckDB
  * oracle, so scores are bit-identical. */
object VectorKernels {

  /** single fused pass: dot, |a|², |b|² → cosine. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val av = a.toFloatArray()
    val bv = b.toFloatArray()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < av.length) {
      val x = av(i).toDouble; val y = bv(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a.cast("array<float>")),
      GraftBridge.expression(b.cast("array<float>"))))
}

/** (array<float>, array<float>) → double cosine similarity. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
