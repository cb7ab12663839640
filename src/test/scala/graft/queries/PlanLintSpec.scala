package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Global plan lint over the whole query surface: at 100 TB any
  * BroadcastNestedLoopJoin or CartesianProduct that isn't a deliberate
  * broadcast-sized cross join is a query that never finishes, and any
  * single-partition Exchange carrying unaggregated data (an empty
  * `Window.partitionBy()`, a stray `coalesce(1)`/`repartition(1)`) is one
  * task doing the whole cluster's work. Every query's physical plan is
  * checked; the small allowlists document the intentional exceptions so a
  * future edit that silently degrades a plan fails here instead of in
  * production. */
class PlanLintSpec extends SparkSpec {

  /** Queries allowed to contain a BroadcastNestedLoopJoin, with why. Every
    * entry broadcasts a BOUNDED side — k probe vectors or a one-row scalar
    * aggregate — never data × data. CartesianProduct is never allowed. */
  private val allowed: Map[String, String] = Map(
    "q12_cosine_topk" -> "broadcast k probe vectors x corpus (brute baseline)",
    "q29_date_arith" -> "broadcast 1-row data-relative cutoff aggregate",
    "q50_quantized_topk" -> "broadcast k probe vectors x quantized corpus",
    "q52_tfidf" -> "broadcast 1-row corpus-size aggregate (idf)",
    "q70_bm25" -> "broadcast 1-row N/avgdl aggregate",
    "q80_triangles" -> "three 1-row stat aggregates cross-joined",
    "q85_mix_weights" -> "broadcast 1-row normalizer aggregate",
    "q86_bigram_lm" -> "broadcast 1-row vocabulary-size aggregate",
    "q89_scd2_snapshot" -> "broadcast 1-row snapshot-instant aggregate",
    "q100_rfm_segmentation" -> "broadcast 1-row recency-cutoff aggregate",
    "q103_pagerank_dangling" -> "broadcast 1-row dangling-mass aggregate per iteration",
    "q120_temperature_sample" -> "broadcast 1-row sqrt-mass normalizer aggregate",
    "q123_kl_drift" -> "broadcast 1-row corpus-token-total aggregate",
    "q127_skew_report" -> "two bounded 1-row summary aggregates cross-joined",
    "q140_ppl_buckets" -> "broadcast 1-row corpus-count aggregate",
    "q155_equidepth_hist" -> "broadcast 1-row corpus-count aggregate")

  private lazy val plans: Seq[(String, SparkPlan)] = {
    graft.plans.GraftExtensions.register(spark)
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution.executedPlan
    }
  }

  /** Every node of the plan including AQE-wrapped subtrees and (scalar /
    * in) subquery plans — `collect` alone stops at AdaptiveSparkPlanExec,
    * which is a leaf. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.inputPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(nodes)
  }

  test("no query plans an unintended nested-loop join, and none a cartesian product") {
    val rendered = plans.map { case (n, p) => n -> p.toString }
    val cartesian = rendered.collect {
      case (name, p) if p.contains("CartesianProduct") => name
    }
    assert(cartesian.isEmpty,
      s"CartesianProduct (data x data, never acceptable) in: ${cartesian.mkString(", ")}")
    val nestedLoop = rendered.collect {
      case (name, p) if p.contains("BroadcastNestedLoopJoin") &&
        !allowed.contains(name) => name
    }
    assert(nestedLoop.isEmpty,
      s"unexpected BroadcastNestedLoopJoin in: ${nestedLoop.mkString(", ")}")
    // the allowlist must not rot: every entry still plans the node it excuses
    val stale = allowed.keys.filterNot(n =>
      rendered.toMap.get(n).exists(_.contains("BroadcastNestedLoopJoin")))
    assert(stale.isEmpty, s"allowlist entries no longer needed: ${stale.mkString(", ")}")
  }

  /** A single-partition shuffle is fine exactly when its input is already
    * collapsed to ~one row per task by a partial aggregate (the final
    * stage of a global aggregate); anything else funnels full data through
    * one task. Global sort+limit never shows up here — Spark collapses it
    * to TakeOrderedAndProject with no Exchange. */
  private def isPartialAgg(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty &&
        a.aggregateExpressions.forall(ae =>
          ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial ||
            ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.PartialMerge)
    case _ => false
  }

  test("no query funnels unaggregated data through a single-partition exchange") {
    val offenders = plans.flatMap { case (name, plan) =>
      nodes(plan).collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition && !isPartialAgg(e.child) =>
            s"$name: Exchange SinglePartition over ${e.child.nodeName}"
      }
    }
    assert(offenders.isEmpty,
      s"single-partition exchanges over unaggregated data:\n${offenders.mkString("\n")}")
  }
}
