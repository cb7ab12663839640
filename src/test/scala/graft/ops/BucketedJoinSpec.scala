package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables ([[Layout.writeBucketed]]): both
  * sides bucketed by the join key → the join plans with NO shuffle
  * exchange at all, while the plain-parquet join shuffles both sides.
  * This is the layout decision that amortizes the orders⋈lineitem shuffle
  * across every downstream query at scale. */
class BucketedJoinSpec extends SparkSpec {

  /** Walk a runtime AQE plan: AdaptiveSparkPlanExec is a leaf wrapping the
    * final plan, and executed exchanges hide inside QueryStageExec leaves
    * (`ShuffleQueryStageExec.plan` holds the ShuffleExchangeExec). */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: nodes(q.plan)
    case _ => p +: p.children.flatMap(nodes)
  }

  /** Force the shapes under test: no broadcast (the sf0.001 sides are tiny
    * enough to broadcast, which hides the shuffle contrast) and no
    * auto-disabling of bucketed scans (the planner turns them off when it
    * sees no benefit, e.g. a single-table filter). */
  private def withConfs[T](body: => T): T = {
    val broadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try body finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcast)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", auto)
    }
  }

  test("bucketed-by-key join plans zero exchanges; plain join shuffles") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")

    Layout.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    Layout.writeBucketed(lineitem, "bkt_lineitem", "l_orderkey", 8)
    try withConfs {
      val bucketed = spark.table("bkt_orders").join(spark.table("bkt_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))

      // collect() runs through each Dataset's OWN lazy queryExecution, so
      // the AQE plans inspected below are the runtime-finalized ones (a
      // count() would build a separate QueryExecution and leave these
      // plans un-executed)
      assert(bucketed.collect().length === plain.collect().length)

      val bucketedShuffles = nodes(bucketed.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(bucketedShuffles.isEmpty,
        s"bucketed join must not shuffle, found: $bucketedShuffles")

      val plainShuffles = nodes(plain.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(plainShuffles.nonEmpty, "plain parquet join should shuffle")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  test("bucket pruning: an equality predicate on the bucket key reads one bucket") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(orders, "bkt_prune", "o_orderkey", 8)
    try withConfs {
      val one = spark.table("bkt_prune").filter(col("o_orderkey") === 32L)
      // correctness of the pruned read
      assert(one.count() ===
        orders.filter(col("o_orderkey") === 32L).count())
      // the scan must report bucket pruning (1 of 8 buckets selected)
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket-pruned scan, got:\n$scan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_prune")
    }
  }
}
