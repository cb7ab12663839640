package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency estimate from a pre-built [[CountMinSketch]] (Spark's public
  * mergeable sketch, the same class `df.stat.countMinSketch` returns).
  *
  * CMS guarantees `estimate >= exact` and, with width `ceil(e/eps)`,
  * `estimate <= exact + eps·N` with probability `confidence` — the standard
  * approximate-frequency primitive for corpus statistics at 100 TB, where
  * the sketch (a few MB regardless of cardinality) merges associatively
  * across partitions while exact per-key counts would shuffle every key.
  *
  * The sketch ships with the task binary via a plan reference object;
  * probing is codegen'd. Long keys only (the `addLong` hash path — matches
  * what `stat.countMinSketch` uses for a bigint column).
  */
case class CmsEstimate(cms: CountMinSketch, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, v => s"$ref.estimateCount((Object) $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsEstimate {
  /** Estimated frequency of `c` (a `bigint` column) under `cms`. */
  def of(cms: CountMinSketch, c: Column): Column =
    ColumnBridge.column(CmsEstimate(cms, ColumnBridge.expression(c)))
}
