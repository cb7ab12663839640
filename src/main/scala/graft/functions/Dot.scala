package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd in-order dot product of two array<double> columns (the
  * `Σ aᵢbᵢ` left fold — identical value to the aggregate/zip_with form for
  * equal-length inputs; ragged inputs FAIL LOUD where the declarative form
  * silently nulls — an intentional divergence, since every caller pairs
  * fixed-dimension vectors and a ragged pair is corrupt data). */
case class Dot(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = DotUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$util.dot($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    // ragged inputs are corrupt (every caller pairs fixed-dim vectors):
    // truncating to the shorter array would return a PLAUSIBLE value
    // computed over a prefix — silently wrong ANN rankings — while the
    // declarative zip_with form nulls; failing loud beats both
    require(a.numElements() == b.numElements(),
      s"dot: vector lengths differ (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

object Dot {
  def of(a: Column, b: Column): Column =
    ColumnBridge.column(Dot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
