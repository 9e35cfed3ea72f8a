package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(str)` as a native codegen Expression: Unicode NFC
  * canonical composition, the first step of every text-curation
  * normalizer — a combining-sequence "e"+U+0301 and the precomposed "é"
  * must hash, shingle and dedup identically, so normalization has to
  * run before any fingerprint/shingle operator. Fast path:
  * `Normalizer.isNormalized` scans without allocating, so
  * ASCII-dominated corpora pay one read-only pass and keep the original
  * UTF8String.
  *
  * Same realization as [[PorterStemExpression]]: whole-stage codegen
  * calls the static forwarder directly — no UDF serialization, no row
  * boxing.
  */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpression.nfcUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalizeExpression.nfcUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpression {
  /** Static forwarder target for generated code. */
  def nfcUTF8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalizeExpression].getName, "nfc_normalize")
}
