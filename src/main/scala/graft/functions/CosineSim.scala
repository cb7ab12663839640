package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd cosine similarity over two array<double> columns.
  *
  * Bit-identical to the declarative form
  * `aggregate(zip_with(a,b,(x,y)->x*y),0d,(acc,x)->acc+x) / (sqrt(Σa²)·sqrt(Σb²))`
  * — each accumulator is an independent in-order left fold, so swapping the
  * HOF chain for this tight loop changes nothing in the result (the DuckDB
  * oracle stays green) while staying inside whole-stage codegen; Spark's
  * higher-order functions are CodegenFallback and fence codegen per row.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimUtil.cosine(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = CosineSimUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$util.cosine($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimUtil {
  /** In-order folds. Ragged inputs fail loud — a prefix-truncated cosine
    * is a plausible-but-wrong similarity (see [[DotUtil.dot]]). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    require(a.numElements() == b.numElements(),
      s"cosine_sim: vector lengths differ " +
        s"(${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object CosineSim {
  def of(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
