package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  test("custom TopKPerKey matches window row_number exactly") {
    val orders = Tables.load(spark, sfDir, "orders")
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .collect().map(_.toSeq).toSet
    }
    val viaCustom = TopKPerKey(
      orders,
      keys = Seq("o_custkey"),
      order = Seq(TopKPerKey.Order("o_totalprice", desc = true),
        TopKPerKey.Order("o_orderkey")),
      k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .collect().map(_.toSeq).toSet
    assert(viaCustom == viaWindow)
    assert(viaCustom.nonEmpty)
  }

  test("physical plan uses TopKPerKeyExec, not WindowExec or Sort") {
    val orders = Tables.load(spark, sfDir, "orders")
    val df = TopKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.Order("o_totalprice", desc = true),
        TopKPerKey.Order("o_orderkey")), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("!TopKPerKey"), "plan marked invalid (!):\n" + plan)
    assert(!plan.contains("Window"), "should not fall back to WindowExec:\n" + plan)
    assert(!plan.contains("Sort "), "no partition sort expected:\n" + plan)
  }

  test("map-side partial top-k sits below the shuffle") {
    val orders = Tables.load(spark, sfDir, "orders")
    val plan = TopKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.Order("o_totalprice", desc = true),
        TopKPerKey.Order("o_orderkey")), 3)
      .queryExecution.executedPlan.toString
    // expected shape: TopKPerKey <- Exchange <- TopKPartial <- Scan
    val iFinal = plan.indexOf("TopKPerKey ")
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    val iPartial = plan.indexOf("TopKPartial")
    assert(iFinal >= 0 && iExchange > iFinal && iPartial > iExchange, plan)
  }

  test("invalid arguments fail fast with clear messages") {
    import spark.implicits._
    val df = Seq((1, 10.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      TopKPerKey(df, Seq("k"), Seq(TopKPerKey.Order("v")), 0)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey(df, Seq("nope"), Seq(TopKPerKey.Order("v")), 1)
    }
    // case-insensitive resolution follows the session conf (default off)
    val resolved = TopKPerKey(df, Seq("K"), Seq(TopKPerKey.Order("V")), 1)
    assert(resolved.count() == 1)
  }

  test("near-unique keys complete under a tiny heap budget, results equal " +
    "the window formulation (both stages forced past the budget)") {
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("g", pmod(col("o_orderkey"), lit(1000)))
    def run(): Set[Seq[Any]] = TopKPerKey(orders,
      keys = Seq("g"),
      order = Seq(TopKPerKey.Order("o_totalprice", desc = true),
        TopKPerKey.Order("o_orderkey")),
      k = 2)
      .select("g", "o_orderkey", "o_totalprice", "rn")
      .collect().map(_.toSeq).toSet
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("g", "o_orderkey", "o_totalprice", "rn")
        .collect().map(_.toSeq).toSet
    }
    val unbudgeted = run()
    // ~1000 distinct keys vs a 64-row budget: the partial stage must
    // flush-and-reset and the final stage must take the external
    // sort-merge path — results must not change
    spark.conf.set("graft.topk.budgetRows", "64")
    try assert(run() == viaWindow && unbudgeted == viaWindow)
    finally spark.conf.unset("graft.topk.budgetRows")
    assert(viaWindow.size > 900, s"want near-unique keys, got ${viaWindow.size}")
  }

  test("early-terminated consumption (LIMIT) over the spill path completes cleanly") {
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("g", pmod(col("o_orderkey"), lit(1000)))
    spark.conf.set("graft.topk.budgetRows", "64")
    try {
      // LIMIT stops the merge iterator mid-stream on every task; the
      // task-completion listener must close chunk streams + delete spills
      val few = TopKPerKey(orders, Seq("g"),
        Seq(TopKPerKey.Order("o_totalprice", desc = true),
          TopKPerKey.Order("o_orderkey")), 2)
        .limit(7).collect()
      assert(few.length == 7)
      // a second full run in the same JVM still works (no leaked state)
      val full = TopKPerKey(orders, Seq("g"),
        Seq(TopKPerKey.Order("o_totalprice", desc = true),
          TopKPerKey.Order("o_orderkey")), 2).count()
      assert(full > 1000)
    } finally spark.conf.unset("graft.topk.budgetRows")
  }

  test("k larger than group size emits whole groups, ranked") {
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 30.0), (2, 20.0)).toDF("k", "v")
    val out = TopKPerKey(df, Seq("k"), Seq(TopKPerKey.Order("v", desc = true)), 5)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2))).toSet
    assert(out == Set((1, 30.0, 1), (1, 10.0, 2), (2, 20.0, 1)))
  }
}
