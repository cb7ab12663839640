package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

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
    "q155_equidepth_hist" -> "broadcast 1-row corpus-count aggregate",
    "q165_temperature_resample" -> "broadcast 1-row sqrt-mass normalizer aggregate")

  /** Queries whose BODIES execute statements only the graft PARSER owns
    * (SQL UPDATE / MERGE / time travel) — built with the shared
    * extensions-enabled session ([[graft.TestSessions]]) so their
    * returned plans are linted like everyone else's instead of being
    * silently skipped. */
  private val needsGraftParser = graft.TestSessions.parserQueries

  private lazy val plans: Seq[(String, SparkPlan)] = {
    graft.plans.GraftExtensions.register(spark)
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (needsGraftParser(name))
        name -> graft.TestSessions.withExtensionsActive(s =>
          fn(s, sfDir).queryExecution.executedPlan)
      else name -> fn(spark, sfDir).queryExecution.executedPlan
    }
  }

  /** Every node of the plan including AQE-wrapped subtrees and (scalar /
    * in) subquery plans — `collect` alone stops at AdaptiveSparkPlanExec,
    * which is a leaf. Descends the AQE node's CURRENT plan (= the initial
    * plan pre-execution, deterministic here since these frames never run),
    * NOT `inputPlan`: inputPlan predates EnsureRequirements, so it contains
    * no Exchange nodes at all and exchange lints against it are blind. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
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

  /** Queries allowed a single-partition Exchange over a non-partial-agg
    * child, with why. Every entry funnels a BOUNDED relation: rows already
    * collapsed to ≤ #strata by a grouped aggregate (the ordered Σ√n prefix
    * sum must see them in one sequence), or a LocalLimit's ≤ limit rows. */
  private val allowedSinglePartition: Map[String, String] = Map(
    "q92_cms_freq" -> "global limit: only LocalLimit rows cross the funnel",
    "q120_temperature_sample" ->
      "ordered sqrt-mass prefix sum over <= #strata aggregate rows",
    "q165_temperature_resample" ->
      "ordered sqrt-mass prefix sum over <= #strata aggregate rows")

  test("no query funnels unaggregated data through a single-partition exchange") {
    val offendersByQuery = plans.map { case (name, plan) =>
      name -> nodes(plan).collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition && !isPartialAgg(e.child) =>
            s"$name: Exchange SinglePartition over ${e.child.nodeName}"
      }
    }
    val offenders = offendersByQuery.collect {
      case (name, os) if os.nonEmpty && !allowedSinglePartition.contains(name) => os
    }.flatten
    assert(offenders.isEmpty,
      s"single-partition exchanges over unaggregated data:\n${offenders.mkString("\n")}")
    // the allowlist must not rot
    val stale = allowedSinglePartition.keys.filterNot(n =>
      offendersByQuery.toMap.get(n).exists(_.nonEmpty))
    assert(stale.isEmpty,
      s"single-partition allowlist entries no longer needed: ${stale.mkString(", ")}")
  }

  // ---- exchange-count drift lint ------------------------------------
  // The two lints above catch catastrophic shapes (nested loop, cartesian,
  // single-partition funnel); a silently ADDED Exchange — a lost bucketing,
  // a broken broadcast threshold turning a broadcast join into a shuffle
  // join — passes them. This pins the per-query (shuffle, broadcast)
  // exchange counts to a recorded baseline and fails on ANY drift, so a
  // plan regression anywhere in the 164-query surface fails here instead
  // of as a 100 TB shuffle in production. Regenerate after an INTENTIONAL
  // plan change with:
  //   GRAFT_REGEN_EXCHANGE_BASELINE=1 sbt "testOnly graft.queries.PlanLintSpec"
  // and review the diff like any other code change.

  private val baselineFile =
    new java.io.File("src/test/resources/plan_exchange_counts.tsv")

  private def exchangeCounts(p: SparkPlan): (Int, Int) = {
    val ns = nodes(p)
    (ns.count(_.isInstanceOf[ShuffleExchangeExec]),
      ns.count(_.isInstanceOf[BroadcastExchangeExec]))
  }

  test("per-query exchange/broadcast counts match the recorded baseline") {
    val actual = plans.map { case (n, p) => n -> exchangeCounts(p) }
    if (sys.env.contains("GRAFT_REGEN_EXCHANGE_BASELINE")) {
      val body = actual.map { case (n, (s, b)) => s"$n\t$s\t$b" }
        .mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(baselineFile.toPath.getParent)
      java.nio.file.Files.writeString(baselineFile.toPath, body)
      info(s"regenerated ${baselineFile.getPath} (${actual.size} queries)")
    } else {
      assert(baselineFile.exists(),
        s"missing ${baselineFile.getPath} — regenerate with " +
          "GRAFT_REGEN_EXCHANGE_BASELINE=1")
      val baseline = scala.io.Source.fromFile(baselineFile).getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, s, b) = l.split("\t"); n -> (s.toInt, b.toInt)
        }.toMap
      val drift = actual.collect {
        case (n, c) if baseline.get(n).exists(_ != c) =>
          val e = baseline(n)
          s"$n: expected ${e._1} shuffles/${e._2} broadcasts, got ${c._1}/${c._2}"
        case (n, _) if !baseline.contains(n) =>
          s"$n: not in baseline (new query — regenerate)"
      }
      val gone = baseline.keySet -- actual.map(_._1).toSet
      assert(drift.isEmpty && gone.isEmpty,
        s"exchange-count drift:\n${drift.mkString("\n")}" +
          (if (gone.nonEmpty) s"\nqueries gone from registry: ${gone.mkString(", ")}" else "") +
          "\nIf the plan change is intentional, regenerate with " +
          "GRAFT_REGEN_EXCHANGE_BASELINE=1 and review the diff.")
    }
  }

  test("the exchange counter detects a lost broadcast (de-broadcast drill)") {
    // a join Spark broadcasts by default: lineitem x nation-sized dim
    val dim = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("k"), col("n_name"))
    val fact = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_nationkey").as("k"), col("c_acctbal"))
    def counts() = exchangeCounts(
      fact.join(dim, "k").groupBy("n_name")
        .agg(org.apache.spark.sql.functions.sum("c_acctbal"))
        .queryExecution.executedPlan)
    val (s0, b0) = counts()
    assert(b0 >= 1, s"dim join must broadcast by default: $s0 shuffles/$b0 broadcasts")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (s1, b1) = counts()
      // the de-broadcast must be VISIBLE to the counter: broadcasts drop,
      // shuffles rise — exactly the drift the baseline lint would flag
      assert(b1 < b0 && s1 > s0,
        s"counter blind to de-broadcast: ($s0,$b0) -> ($s1,$b1)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }
}
