package graft.functions

import graft.operators.LangId
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id_model(str)` — the trained hashed-char-n-gram NB language
  * identifier ([[graft.operators.LangId]]) as a native Catalyst
  * expression: the generated code calls the static forwarder directly,
  * so [[graft.operators.TextAnalysis.analyze]]'s projection stays one
  * WholeStageCodegen span with the model in executor class constants.
  * nullIntolerant like the sibling expressions (NULL text -> NULL);
  * callers that want the operator contract (null ≡ empty ≡ 'und')
  * coalesce to [[LangId.Unknown]] — the rolling_fingerprint discipline.
  */
case class LangIdExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id_model"

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpression.predictUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LangIdExpression.predictUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpression {
  /** Static forwarder target for generated code. */
  def predictUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(LangId.predict(s.toString))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LangIdExpression].getName, "lang_id_model")
}
