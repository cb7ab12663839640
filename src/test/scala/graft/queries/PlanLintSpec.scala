package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Global plan lint over the whole query surface: at 100 TB any
  * BroadcastNestedLoopJoin or CartesianProduct that isn't a deliberate
  * broadcast-sized cross join is a query that never finishes. Every query's
  * physical plan is checked; the small allowlist documents the intentional
  * exceptions (broadcast one-row scalar joins and broadcast-probe scans)
  * so a future edit that silently degrades a hash join into a nested loop
  * fails here instead of in production. */
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
    "q100_rfm_segmentation" -> "broadcast 1-row recency-cutoff aggregate")

  test("no query plans an unintended nested-loop join, and none a cartesian product") {
    graft.plans.GraftExtensions.register(spark)
    val plans = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution.executedPlan.toString
    }
    val cartesian = plans.collect {
      case (name, p) if p.contains("CartesianProduct") => name
    }
    assert(cartesian.isEmpty,
      s"CartesianProduct (data x data, never acceptable) in: ${cartesian.mkString(", ")}")
    val nestedLoop = plans.collect {
      case (name, p) if p.contains("BroadcastNestedLoopJoin") &&
        !allowed.contains(name) => name
    }
    assert(nestedLoop.isEmpty,
      s"unexpected BroadcastNestedLoopJoin in: ${nestedLoop.mkString(", ")}")
    // the allowlist must not rot: every entry still plans the node it excuses
    val stale = allowed.keys.filterNot(n =>
      plans.toMap.get(n).exists(_.contains("BroadcastNestedLoopJoin")))
    assert(stale.isEmpty, s"allowlist entries no longer needed: ${stale.mkString(", ")}")
  }
}
