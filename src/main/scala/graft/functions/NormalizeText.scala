package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst `Expression` with
  * `doGenCode` — canonically composes decomposed sequences (`e` +
  * U+0301 → `é`) so that downstream exact/near dedup, tokenization and
  * fingerprinting see ONE byte representation per canonically-equal
  * string. Web-crawl corpora mix NFC and NFD producers; without this pass
  * exact dedup silently misses canonically-identical documents.
  *
  * Spark has no built-in normalizer, so this is the custom-Expression
  * escape hatch (builder preference order (b)): the call inlines into
  * whole-stage codegen — no UDF boxing, no codegen fence — and the JDK's
  * `java.text.Normalizer` (ICU-equivalent tables) does the composition.
  * The fast path `Normalizer.isNormalized` skips allocation for the
  * (overwhelmingly common) already-NFC case.
  *
  * DuckDB exposes the same operation as `nfc_normalize`, so the operator
  * is t2 hash-checkable (LlmSuite `text_nfc`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.GraftBridge

  /** Static kernel shared by eval and generated code. ASCII-only strings
    * (numBytes == numChars) can't change under NFC — skip the String
    * round-trip entirely, which keeps the 100-TB common case at scan
    * rate. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // pure ASCII: NFC-invariant
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  /** Arity-checked SQL constructor (sibling-function convention). */
  def sqlExpr(exprs: Seq[Expression]): NfcNormalize = {
    require(exprs.length == 1,
      s"nfc_normalize takes 1 argument, got ${exprs.length}")
    NfcNormalize(exprs.head)
  }

  /** Register for SQL use: `SELECT nfc_normalize(text) FROM …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", sqlExpr, "scala_udf")
}
