package graft.functions

import graft.text.Porter
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `porter_stem(str)` as a native Catalyst expression with whole-stage
  * codegen — the generated code calls the static forwarder below directly,
  * so the stemmer stays inside the WSCG pipeline (no UDF serialization,
  * no InternalRow boxing). SURVEY.md §2.8/§7.4: a codegen Expression is
  * the preferred realization of the reference's scalar kernels
  * (`DirtDriver.java:106-371`).
  */
case class PorterStemExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "porter_stem"

  override protected def nullSafeEval(input: Any): Any =
    PorterStemExpression.stemUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PorterStemExpression.stemUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PorterStemExpression {
  /** Static forwarder target for generated code. */
  def stemUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(Porter.stem(s.toString))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PorterStemExpression].getName, "porter_stem")
}

/** Column-API and SQL-registration surface for the engine's scalar
  * kernels. `register` installs them into an existing session's function
  * registry (usable from `spark.sql`); `GraftExtensions` does the same
  * through the `spark.sql.extensions` config for sessions the user builds.
  */
object GraftFunctions {

  /** Column-API entry; requires `register(spark)` (or the extensions
    * config) first — Spark 4 resolves it through the function registry.
    */
  def porterStem(c: Column): Column =
    org.apache.spark.sql.functions.call_function("porter_stem", c)

  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)

  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)

  def rollingFingerprint(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_fingerprint", c)

  def langIdModel(c: Column): Column =
    org.apache.spark.sql.functions.call_function("lang_id_model", c)

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "porter_stem",
      exprs => PorterStemExpression(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimExpression(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => NfcNormalizeExpression(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint",
      exprs => RollingFingerprintExpression(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_id_model",
      exprs => LangIdExpression(exprs.head),
      "scala_udf")
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * engine functions at session build time.
  */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("porter_stem"),
      PorterStemExpression.info,
      (exprs: Seq[Expression]) => PorterStemExpression(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      CosineSimExpression.info,
      (exprs: Seq[Expression]) => CosineSimExpression(exprs(0), exprs(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      NfcNormalizeExpression.info,
      (exprs: Seq[Expression]) => NfcNormalizeExpression(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_fingerprint"),
      RollingFingerprintExpression.info,
      (exprs: Seq[Expression]) => RollingFingerprintExpression(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("lang_id_model"),
      LangIdExpression.info,
      (exprs: Seq[Expression]) => LangIdExpression(exprs.head)))
  }
}
