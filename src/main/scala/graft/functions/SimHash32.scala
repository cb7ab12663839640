package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 32-bit SimHash over an array<bigint> of token hashes: output bit j is
  * set when the ±1 vote sum of the tokens' j-th bits is positive.
  *
  * Value-identical to the declarative nested-aggregate form
  * ([[graft.ops.TextOps.simhash32]], kept as the reference and the DuckDB
  * oracle formulation) — integer-only math, so equality is exact — but a
  * single codegen'd pass per row instead of a CodegenFallback-interpreted
  * 32×-nested fold: one vote-counter sweep over the token hashes, not 32
  * independent array traversals.
  */
case class SimHash32(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(a: Any): Any =
    SimHash32Util.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = SimHash32Util.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, a => s"$util.simhash($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32Util {
  def simhash(tokenHashes: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = tokenHashes.numElements()
    var i = 0
    while (i < n) {
      val t = tokenHashes.getLong(i)
      var j = 0
      while (j < 32) {
        if (((t >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

object SimHash32 {
  def of(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
}
