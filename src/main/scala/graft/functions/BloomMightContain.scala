package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] (Spark's public
  * split-block sketch, the same class `df.stat.bloomFilter` returns).
  *
  * The filter is embedded in the expression and ships to executors with the
  * task binary — at 100 TB this is the shape of a bloom-pruned semi-join:
  * the big side streams through a broadcast-sized bit set and only rows that
  * *might* match pay the exact-join shuffle. No false negatives, so
  * `bloom-filter → exact semi-join` is value-identical to the exact join
  * alone while moving a fraction of the rows.
  *
  * Codegen'd via a plan reference object (no per-row deserialization); the
  * interpreted path calls the same method.
  */
case class BloomMightContain(bloom: BloomFilter, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Probe `c` (a `bigint` column) against `bloom`. */
  def of(bloom: BloomFilter, c: Column): Column =
    ColumnBridge.column(BloomMightContain(bloom, ColumnBridge.expression(c)))
}
