package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash
  * `h = Σ charᵢ · B^(n-1-i)  (mod M)` with B=131, M=1e9+7 (both chosen so
  * every intermediate fits in a signed 64-bit: h·B + c < 2^38).
  *
  * Implemented as a native Catalyst `Expression` WITH `doGenCode` — the
  * whole loop inlines into whole-stage codegen, so fingerprinting rides the
  * scan at full speed (no UDF boxing, no codegen fence). SURVEY §2.12
  * "document fingerprinting (rolling hash)".
  *
  * The same fold is expressible in DuckDB (`list_reduce` over `ord()`s) —
  * see LlmSuite's text_fingerprint oracle — so even this custom expression
  * is t2 hash-checked.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  final val B = 131L
  final val M = 1000000007L

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * B + s.charAt(i)) % M; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $str = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $h = ($h * ${B}L + $str.charAt($i)) % ${M}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftBridge

  /** Column wrapper (Spark 4.x: Column wraps a ColumnNode, so the classic
    * Expression bridge goes through GraftBridge/ExpressionUtils). */
  def rolling_hash(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))

  /** Register for SQL use: `SELECT rolling_hash(text) FROM …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
}
