package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous top-k-per-key idiom
  *
  *   Filter(rn <= k, Window(row_number() over (partition BY p ORDER BY o)))
  *
  * into the [[TopKPerKeyNode]] operator, whose physical form is a bounded
  * per-key heap (plus a map-side partial) instead of WindowExec's full
  * partition sort. Semantics-preserving by construction: row_number with
  * its mandatory ROWS UNBOUNDED PRECEDING..CURRENT ROW frame and a
  * rank-limit predicate is exactly the operator's contract; the rank
  * attribute keeps its exprId so downstream references stay resolved.
  *
  * Conservative matching: exactly one window expression (row_number), a
  * bare `rn <= lit` / `rn < lit` predicate on it, optionally through a
  * pass-through Project. Anything else keeps the stock plan.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(projectList, w: Window))
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, w)
        .map(topk => Project(projectList, topk))
        .getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    for {
      (rankAttr, k) <- rankLimit(cond, w)
      node <- asTopK(w, rankAttr, k)
    } yield node
  }

  /** Match the rank-limit predicate shapes against the window's single rank
    * attribute: `rn <= k`, `rn < k+1`, their flipped forms, and `rn = 1`
    * (the dominant keep-latest-per-key dedup idiom — Spark's own
    * InferWindowGroupLimit matches it for the same reason). */
  private def rankLimit(cond: Expression, w: Window): Option[(Attribute, Int)] = {
    val rankAttrs = w.windowExpressions.map(_.toAttribute)
    def isRank(a: AttributeReference) = rankAttrs.exists(_.exprId == a.exprId)
    cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
          if isRank(a) && k >= 1 => Some((a, k))
      case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
          if isRank(a) && k >= 1 => Some((a, k))
      case LessThan(a: AttributeReference, IntegerLiteral(k))
          if isRank(a) && k >= 2 => Some((a, k - 1))
      case GreaterThan(IntegerLiteral(k), a: AttributeReference)
          if isRank(a) && k >= 2 => Some((a, k - 1))
      case EqualTo(a: AttributeReference, IntegerLiteral(1)) if isRank(a) =>
        Some((a, 1))
      case EqualTo(IntegerLiteral(1), a: AttributeReference) if isRank(a) =>
        Some((a, 1))
      case _ => None
    }
  }

  /** Above this k the bounded heaps stop being a win over WindowExec's
    * spillable sort (they hold k row copies per key in memory, no spill). */
  val MaxRewriteK = 1024

  private def asTopK(w: Window, rankAttr: Attribute, k: Int): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(_: RowNumber, spec), _))
          if alias.exprId == rankAttr.exprId && rowNumberFrame(spec) &&
            spec.orderSpec.nonEmpty &&
            // empty partitionSpec = global top-k: ClusteredDistribution(Nil)
            // is illegal, and a single giant heap is the wrong plan anyway
            spec.partitionSpec.nonEmpty &&
            k <= MaxRewriteK =>
        Some(TopKPerKeyNode(
          spec.partitionSpec, spec.orderSpec, k, alias.toAttribute, w.child))
      case _ => None
    }

  private def rowNumberFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }
}
