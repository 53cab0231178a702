package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays as a native Catalyst `Expression` with
  * codegen — the hot scalar of every similarity operator (cosine top-k, LSH
  * hyperplane projections, near-dup verify). The
  * `aggregate(zip_with(a, b, _*_), 0, _+_)` composition it replaces runs
  * interpreted (Spark's higher-order functions don't participate in
  * whole-stage codegen) and allocates the zipped array per pair; this is
  * one fused multiply-add loop over the two `ArrayData`s with no boxing.
  *
  * Contract: element types float or double (checked at resolution); the
  * shorter length wins when lengths differ; NULL ELEMENTS COUNT AS 0.0
  * (embedding corpora carry none — the zip_with form would instead poison
  * the whole sum to null).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {

  def dot(x: ArrayData, y: ArrayData, xFloat: Boolean, yFloat: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val a = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val b = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
        s += a * b
      }
      i += 1
    }
    s
  }

  /** Register `dot_product` in the session's function registry (the public
    * bridge while Spark 4 keeps its Column↔Expression utils `private[sql]`);
    * call via `functions.call_function("dot_product", a, b)`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
}
