package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis

/** `rolling_fingerprint(string)` — the q38 winnowing-style content
  * signature ([[TextAnalysis.fingerprintOf]]: min of all 8-char
  * Karp–Rabin window hashes) as a native Catalyst expression with
  * whole-stage codegen, replacing the Scala UDF on the fingerprint hot
  * path: no UDF serialization, no row boxing, and an ASCII fast path
  * that runs the rolling recurrence directly over the `UTF8String`
  * bytes without materializing a Java String at all (for an all-ASCII
  * corpus — the fixture, and most crawled text after q128
  * normalization — the scan is allocation-free per row).
  *
  * Semantics are EXACTLY [[TextAnalysis.fingerprintOf]] for every
  * input: the fast path requires `numBytes == numChars` (pure ASCII ⇒
  * UTF-8 bytes == UTF-16 code units == what `charAt` feeds the
  * recurrence); anything else falls back to `toString` + the reference
  * kernel. Locked bit-identical in `RollingFingerprintExpressionSpec`.
  */
case class RollingFingerprintExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(s: Any): Any =
    RollingFingerprintExpression.fingerprint(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.RollingFingerprintExpression.fingerprint($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprintExpression {

  /** Static kernel target for generated code. */
  def fingerprint(s: UTF8String): Long = {
    val nb = s.numBytes()
    if (nb < TextAnalysis.FingerprintK) {
      // < K bytes implies < K chars in every encoding: the 0 sentinel
      0L
    } else if (nb == s.numChars()) {
      asciiFingerprint(s, nb)
    } else {
      TextAnalysis.fingerprintOf(s.toString)
    }
  }

  /** All-ASCII path: bytes ARE the UTF-16 code units `charAt` would
    * yield, so the reference recurrence runs over `getByte` directly.
    * ASCII bytes are non-negative, so no sign-extension masking is
    * needed to match `charAt`'s unsigned values.
    */
  private def asciiFingerprint(s: UTF8String, n: Int): Long = {
    val K = TextAnalysis.FingerprintK
    val B = TextAnalysis.FingerprintB
    var pow = 1L
    var i = 0
    while (i < K - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < K) { h = h * B + s.getByte(i); i += 1 }
    var min = h
    i = K
    while (i < n) {
      h = (h - s.getByte(i - K) * pow) * B + s.getByte(i)
      if (h < min) min = h
      i += 1
    }
    min
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingFingerprintExpression].getName, "rolling_fingerprint")
}
