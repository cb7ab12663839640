package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Own session: the rule is injected via SparkSessionExtensions, exactly how
  * a user of the library would activate it. */
class TopKRewriteRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  // An extensions-bearing session must NOT be the JVM's default session:
  // getOrCreate would otherwise hand back the shared plain session (without
  // extensions), or leak this one into other suites. Clear the default
  // around creation and restore afterwards; never stop the shared context.
  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rule-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prevDefault match {
      case Some(d) => SparkSession.setDefaultSession(d)
      case None => SparkSession.clearDefaultSession()
    }
    prevActive match {
      case Some(a) => SparkSession.setActiveSession(a)
      case None => SparkSession.clearActiveSession()
    }
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def ranked(k: Int) = {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("stock window-rank plans are rewritten to TopKPerKey automatically") {
    val df = ranked(3).select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), "WindowExec should be rewritten away:\n" + plan)
  }

  test("rewritten plan returns the window-rank results") {
    // expected values computed via the stock plan on a plain session
    val plain = graft.SparkSpec.session
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = graft.Tables.load(plain, "/root/testdata/sf0.001", "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .collect().map(_.toSeq).toSet
    val actual = ranked(3).select("o_custkey", "o_orderkey", "rn")
      .collect().map(_.toSeq).toSet
    assert(actual == expected)
  }

  test("non-row_number ranks are left to the stock planner") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val df = orders.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "rank() must keep WindowExec:\n" + plan)
    assert(!plan.contains("TopKPerKey"), plan)
  }

  test("rn = 1 (keep-latest-per-key dedup idiom) is rewritten too") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"), plan)
    // one row per customer
    val n = df.count()
    assert(n == orders.select("o_custkey").distinct().count())
  }

  test("global top-k (no partitionBy) keeps the stock plan") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
    assert(df.count() == 10) // and it still executes
  }

  test("huge k keeps the stock (spillable) plan") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10000000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.contains("TopKPerKey"), plan)
  }

  test("rank used beyond the limit predicate still works (projection on top)") {
    val df = ranked(2).groupBy("rn").count().orderBy("rn")
    val rows = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set(1, 2))
    assert(rows(1) >= rows(2)) // every customer has a rank-1, not all have rank-2
  }
}
