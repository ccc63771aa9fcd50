package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst `Expression` (Spark has
  * no builtin; a UDF would break WholeStageCodegen in the ingest hot
  * path). Canonical composition sits directly upstream of every
  * content-hash in the dedup families — "e" + COMBINING ACUTE and the
  * precomposed "é" are the same text but different bytes, so an
  * un-normalized corpus silently defeats exact dedup (d1) and shifts
  * every shingle hash after the first decomposed character.
  *
  * Cross-engine parity: `java.text.Normalizer.normalize(s, NFC)` and
  * DuckDB's `nfc_normalize` both implement Unicode canonical composition
  * (UAX #15); the t23 oracle exercises the combining-sequence and
  * already-composed cases on both engines.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize($c.toString(),
          java.text.Normalizer.Form.NFC));
    """)
}

object NfcNormalize {
  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** The matching DuckDB fragment. */
  def sql(s: String): String = s"nfc_normalize($s)"
}
