package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Own extensions-bearing session, same discipline as TopKRewriteRuleSpec
  * (never the JVM default, never stops the shared context). */
class RangeJoinRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rangejoin-rule-test")
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

  private def fixtures(): Unit = {
    import spark.implicits._
    (0L until 400L).map(i => (i, i * 3 % 997)).toDF("p_id", "p")
      .createOrReplaceTempView("pts")
    (0L until 30L).map(i => (i, i * 30, i * 30 + 45)).toDF("iv_id", "lo", "hi")
      .createOrReplaceTempView("ivs")
  }

  private val rangeSql =
    """SELECT p_id, iv_id FROM pts JOIN ivs ON p >= lo AND p < hi"""

  /** Result/plan of `sql` with the rule disabled — the genuine naive join. */
  private def naive(sql: String): (Set[(Long, Long)], String) = {
    spark.conf.set(RangeJoinRule.ConfKey, "0")
    try {
      val df = spark.sql(sql)
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        df.queryExecution.executedPlan.toString)
    } finally spark.conf.unset(RangeJoinRule.ConfKey)
  }

  test("explicit-width rewrite: SQL range join plans as a bin equi-join and matches the naive result") {
    fixtures()
    val (expected, naivePlan) = naive(rangeSql)
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"baseline should be a nested loop:\n$naivePlan")

    spark.conf.set(RangeJoinRule.ConfKey, "45")
    try {
      val df = spark.sql(rangeSql)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
      val rewritten = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rewritten == expected)
      assert(expected.nonEmpty)
    } finally spark.conf.unset(RangeJoinRule.ConfKey)
  }

  test("auto default: width derived from interval stats, derivation memoized across plannings") {
    fixtures()
    val (expected, _) = naive(rangeSql)
    val before = RangeJoinRule.derivations(spark)
    // conf unset → auto. Plan the SAME query twice (two independent
    // DataFrames → two optimizer passes) and run one of them.
    val df1 = spark.sql(rangeSql)
    val plan1 = df1.queryExecution.executedPlan.toString
    assert(plan1.contains("__pbin") && !plan1.contains("BroadcastNestedLoopJoin"),
      s"auto rewrite did not fire:\n$plan1")
    val df2 = spark.sql(rangeSql)
    df2.queryExecution.executedPlan // force a second optimization
    val got = df1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty)
    val jobs = RangeJoinRule.derivations(spark) - before
    assert(jobs <= 1L,
      s"derivation must be memoized per interval subtree, ran $jobs jobs")
  }

  test("auto bails out: empty interval side, oversized interval side") {
    fixtures()
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("e_id", "e_lo", "e_hi")
      .createOrReplaceTempView("eivs")
    val emptyPlan = spark.sql(
      "SELECT p_id, e_id FROM pts JOIN eivs ON p >= e_lo AND p < e_hi")
      .queryExecution.executedPlan.toString
    assert(!emptyPlan.contains("__pbin"),
      s"empty interval side must not rewrite under auto:\n$emptyPlan")

    // size-stat gate: with the cap below the table's estimated size, auto
    // must refuse to run the plan-time scan (explicit width still rewrites)
    spark.conf.set(RangeJoinRule.AutoMaxBytesKey, "1")
    try {
      val capped = spark.sql(rangeSql).queryExecution.executedPlan.toString
      assert(capped.contains("BroadcastNestedLoopJoin"),
        s"auto must not scan an interval side above the size cap:\n$capped")

      // the gate must look THROUGH aggregates at the leaf scan: an
      // ungrouped aggregate estimates ~1 output row but the plan-time job
      // still pays for the full input scan
      val aggPlan = spark.sql(
        """SELECT p_id FROM pts JOIN (
          |  SELECT MIN(lo) AS a_lo, MAX(hi) AS a_hi FROM ivs) b
          |ON p >= a_lo AND p < a_hi""".stripMargin)
        .queryExecution.executedPlan.toString
      assert(aggPlan.contains("BroadcastNestedLoopJoin"),
        "auto must not scan a fact-sized leaf behind a tiny-output " +
          s"aggregate:\n$aggPlan")
    } finally spark.conf.unset(RangeJoinRule.AutoMaxBytesKey)
  }

  test("auto bails out for a streaming interval side instead of failing to plan") {
    fixtures()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    mem.addData((0L, 0L, 45L), (1L, 30L, 75L))
    val ivs = mem.toDF().toDF("s_id", "s_lo", "s_hi")
    // stream-static inner join with the STREAM as the interval side: under
    // auto, deriveWidth over the streaming plan would throw a batch-action
    // AnalysisException at every micro-batch plan time; the rule must bail
    // (no rewrite, no derivation job) and let the join run naive
    val before = RangeJoinRule.derivations(spark)
    val joined = spark.table("pts")
      .join(ivs, $"p" >= $"s_lo" && $"p" < $"s_hi")
      .select("p_id", "s_id")
    val q = joined.writeStream.format("memory")
      .queryName("rj_stream_ivs").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("rj_stream_ivs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = spark.table("pts").collect().map(_.getLong(1)).zip(
      spark.table("pts").collect().map(_.getLong(0)))
      .flatMap { case (p, pid) =>
        Seq((0L, 0L, 45L), (1L, 30L, 75L)).collect {
          case (sid, lo, hi) if p >= lo && p < hi => (pid, sid)
        }
      }.toSet
    assert(got == expected && expected.nonEmpty)
    assert(RangeJoinRule.derivations(spark) == before,
      "a streaming interval side must never run a plan-time derivation job")
  }

  test("auto clamps the width against outlier-long intervals and matches naive") {
    import spark.implicits._
    (0L until 4000L).map(i => (i, i * 5 % 4999)).toDF("s_id", "s")
      .createOrReplaceTempView("spts")
    // 200 short intervals (length 10) + one outlier spanning the whole line:
    // avg ≈ 507, max = 100000 → clamped width ≥ 100000/64 = 1563, so the
    // outlier replicates into ≤ 64 bins instead of ~200
    val ivs = (0L until 200L).map(i => (i, i * 25, i * 25 + 10)) :+
      (200L, 0L, 100000L)
    ivs.toDF("o_id", "o_lo", "o_hi").createOrReplaceTempView("oivs")
    val sql = "SELECT s_id, o_id FROM spts JOIN oivs ON s >= o_lo AND s < o_hi"
    val (expected, _) = naive(sql)
    val df = spark.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__pbin"), s"auto rewrite did not fire:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("no rewrite when disabled (0), with an equi-conjunct, or for fractional bounds") {
    fixtures()
    import spark.implicits._
    // conf "0" → disabled → untouched
    spark.conf.set(RangeJoinRule.ConfKey, "0")
    try {
      assert(spark.sql(rangeSql).queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(RangeJoinRule.ConfKey)

    spark.conf.set(RangeJoinRule.ConfKey, "45")
    try {
      // equi-conjunct present → hash join, no binning replication
      val equi = spark.sql(
        "SELECT p_id, iv_id FROM pts JOIN ivs ON p_id = iv_id AND p >= lo AND p < hi")
        .queryExecution.executedPlan.toString
      assert(!equi.contains("__pbin"), s"should not bin an equi-join:\n$equi")

      // fractional bounds → (hi-1) bin math would be wrong; must not fire
      (0L until 50L).map(i => (i, i / 2.0)).toDF("q_id", "q")
        .createOrReplaceTempView("fpts")
      (0L until 5L).map(i => (i, i * 5.0, i * 5.0 + 7.5)).toDF("fiv_id", "flo", "fhi")
        .createOrReplaceTempView("fivs")
      val frac = spark.sql(
        "SELECT q_id, fiv_id FROM fpts JOIN fivs ON q >= flo AND q < fhi")
        .queryExecution.executedPlan.toString
      assert(!frac.contains("__pbin"), s"fractional rewrite must not fire:\n$frac")
    } finally spark.conf.unset(RangeJoinRule.ConfKey)
  }

  test("date-typed range join rewrites on epoch days and matches the naive result") {
    import spark.implicits._
    (0L until 400L).map(i => (i, java.sql.Date.valueOf(
        java.time.LocalDate.of(1992, 1, 1).plusDays(i * 7 % 997))))
      .toDF("d_id", "d").createOrReplaceTempView("dpts")
    (0L until 12L).map(i => (i,
        java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i * 90)),
        java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i * 90 + 130))))
      .toDF("w_id", "d_lo", "d_hi").createOrReplaceTempView("divs")
    val sql = "SELECT d_id, w_id FROM dpts JOIN divs ON d >= d_lo AND d < d_hi"
    val (expected, _) = naive(sql)
    spark.conf.set(RangeJoinRule.ConfKey, "90")
    try {
      val df = spark.sql(sql)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__pbin") && !plan.contains("BroadcastNestedLoopJoin"),
        s"date rewrite did not fire:\n$plan")
      val rewritten = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rewritten == expected && expected.nonEmpty)
    } finally spark.conf.unset(RangeJoinRule.ConfKey)
  }

  test("mixed date/integral range pair does not rewrite") {
    import spark.implicits._
    (0L until 50L).map(i => (i, java.sql.Date.valueOf(
        java.time.LocalDate.of(1992, 1, 1).plusDays(i))))
      .toDF("m_id", "md").createOrReplaceTempView("mpts")
    (0L until 5L).map(i => (i, i * 10, i * 10 + 15)).toDF("n_id", "n_lo", "n_hi")
      .createOrReplaceTempView("nivs")
    spark.conf.set(RangeJoinRule.ConfKey, "10")
    try {
      // date point vs integral bounds never type-checks in SQL directly;
      // assert the guard by planning the integral query against a date
      // upper bound via unix_date on one side only — the rule must not bin
      val plan = spark.sql(
        """SELECT m_id, n_id FROM mpts JOIN nivs
          |ON unix_date(md) >= n_lo AND unix_date(md) < n_hi""".stripMargin)
        .queryExecution.executedPlan.toString
      // unix_date(md) is an expression, not an attribute — conservative
      // match skips it
      assert(!plan.contains("__pbin"), s"must not bin non-attribute points:\n$plan")
    } finally spark.conf.unset(RangeJoinRule.ConfKey)
  }

  test("extra conjuncts survive the rewrite as residual predicates") {
    fixtures()
    val sql =
      """SELECT p_id, iv_id FROM pts JOIN ivs
        |ON p >= lo AND p < hi AND p_id % 2 = iv_id % 2""".stripMargin
    val (expected, _) = naive(sql)
    spark.conf.set(RangeJoinRule.ConfKey, "45")
    try {
      val withRule = spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(withRule == expected && expected.nonEmpty)
    } finally spark.conf.unset(RangeJoinRule.ConfKey)
  }
}
