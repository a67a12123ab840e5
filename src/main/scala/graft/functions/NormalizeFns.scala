package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(text)` — Unicode NFC normalization as a native
  * codegen'd expression. Spark has no built-in normalizer, and the
  * cleaning stage every web-scale text pipeline starts with (C4,
  * CCNet, RefinedWeb all normalize before hashing/dedup) must not
  * drop out of whole-stage codegen on its very first step. Backed by
  * `java.text.Normalizer` (the canonical JDK implementation of
  * UAX #15); DuckDB's `nfc_normalize` implements the same algorithm
  * — verified equal on composition, compatibility-exempt ligatures,
  * and multi-combining-mark cases — so normalized output is
  * oracle-comparable.
  *
  * The fast path costs nothing on already-normalized text:
  * `Normalizer.isNormalized` is a cheap quick-check scan (true for
  * all-ASCII), and only failures pay the full normalization pass —
  * the right trade for corpora that are overwhelmingly NFC already.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
