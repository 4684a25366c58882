package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode NFC normalization — the first step of every
  * text-curation pipeline (dedup keys, tokenizer inputs and PII scans
  * must see one canonical byte sequence for visually-identical text:
  * U+00E9 vs e+U+0301 would otherwise fingerprint as different
  * documents).
  *
  * Why an Expression and not a UDF: `doGenCode` inlines the
  * normalization into whole-stage codegen with an `isNormalized` fast
  * path that returns the INPUT UTF8String untouched — for the common
  * case (already-NFC text, i.e. almost every real document) the cost
  * is one scan of the char array and zero allocation, where a UDF
  * would convert UTF8String → String → UTF8String on every row.
  *
  * Oracle twin: DuckDB `nfc_normalize` (both sides implement Unicode
  * canonical composition, so outputs are byte-identical).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects a string input, got " +
          child.dataType.simpleString)

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalizeExpr.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

object NfcNormalizeExpr {

  /** Shared interpreted/codegen kernel. Pure-ASCII input (numBytes ==
    * numChars — one allocation-free scan) is NFC by definition and
    * returns the input UTF8String untouched; non-ASCII input pays an
    * `isNormalized` probe and only strings that actually recompose pay
    * the full String round-trip. */
  def normalize(s: UTF8String): UTF8String = {
    if (s.numBytes() == s.numChars()) return s // ASCII ⊂ NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  /** Column-level entry point: `graft_nfc(s)`. */
  def nfc(c: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(c)))
}
