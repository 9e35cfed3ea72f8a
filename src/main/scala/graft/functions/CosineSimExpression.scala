package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `cosine_sim(array<float>, array<float>)` as a native Catalyst
  * expression with whole-stage codegen: the generated code calls the
  * static kernel below on the raw `ArrayData` — no UDF serialization, no
  * row boxing, no interpreted higher-order functions (the brief's
  * preference order: native Expression > Scala UDF > HOFs for hot scalar
  * kernels; see `VectorSearch.dot`'s HOF warning).
  *
  * Semantics are EXACTLY [[graft.operators.VectorSearch.cosineArrays]]:
  * per-element float→double widening, left-to-right accumulation,
  * `dot/(sqrt·sqrt)`; ragged lengths or null elements yield NaN, a null
  * array yields null. Locked bit-identical in CosineSimExpressionSpec.
  */
case class CosineSimExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpression.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CosineSimExpression.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpression {
  /** Static kernel target for generated code: works directly on
    * `ArrayData` (no materialized JVM array), same IEEE accumulation
    * order as `VectorSearch.cosineArrays`.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimExpression].getName, "cosine_sim")
}
