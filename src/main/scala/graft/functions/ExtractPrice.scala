package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls — a top-level object so Janino can
  * reference the static forwarder `ExtractPriceUtil.extract`. */
object ExtractPriceUtil {
  /** Price-string normalization, semantics-compatible with the reference's
    * only UDF (/root/reference/services/spark_batch_processor.py:50-58):
    * `"899USD$8.99"` → last `$`-delimited token as float; no `$` → 0.0;
    * unparsable/null/empty → 0.0. Total — never throws. */
  def extract(s: UTF8String): Float = {
    if (s == null) return 0.0f
    val str = s.toString
    val idx = str.lastIndexOf('$')
    if (idx < 0) return 0.0f
    try java.lang.Float.parseFloat(str.substring(idx + 1))
    catch { case _: NumberFormatException => 0.0f }
  }
}

/** Native replacement for the reference's Python `price_udf` (U1 in SURVEY.md
  * §2.9) — a codegen'd Catalyst expression, so the hot path stays inside
  * whole-stage codegen instead of fencing it behind a UDF eval boundary. */
case class ExtractPrice(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = FloatType
  override def nullable: Boolean = false // null input ⇒ 0.0f, like the UDF

  override def eval(input: InternalRow): Any =
    ExtractPriceUtil.extract(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val util = ExtractPriceUtil.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        ${c.code}
        float ${ev.value} = $util.extract(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExtractPrice {
  /** Column-API entry point: `ExtractPrice.of($"ListPrice")`. */
  def of(c: Column): Column =
    ColumnBridge.column(ExtractPrice(ColumnBridge.expression(c)))
}
