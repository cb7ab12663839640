package graft.queries

import graft.SparkSpec

/** Smoke + shape checks for the §7.5 core set at sf0.001. Value-level
  * correctness is gated by the driver's DuckDB oracle (and was verified
  * manually at sf0.01); these specs pin row counts / shapes so regressions
  * surface in `sbt test` without DuckDB. */
class CoreQueriesSpec extends SparkSpec {

  test("every core query runs non-empty at sf0.001 with its declared columns") {
    CoreQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("q2 groups by returnflag x linestatus with exact counts") {
    val rows = CoreQueries.q2GroupAgg(spark, sfDir).collect()
    assert(rows.map(_.getLong(8)).sum == 6000L) // all lineitems accounted for
    assert(rows.length <= 6)
  }

  test("q5 emits at most 3 rows per customer, ranked") {
    val rows = CoreQueries.q5WindowTopK(spark, sfDir).collect()
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 3))
    assert(perCust.values.forall(g => g.map(_.getInt(3)).sorted.sameElements(1 to g.length)))
  }

  test("q6 pivot counts sum to total events") {
    val df = CoreQueries.q6Pivot(spark, sfDir)
    assert(df.columns.toSeq == Seq("user_id", "click", "error", "purchase", "signup", "view"))
    val total = df.collect().map(r => (1 to 5).map(r.getLong(_)).sum).sum
    assert(total == 1000L)
  }

  test("q12 returns exactly 5 neighbors per probe, self excluded, sim in [-1,1]") {
    val rows = CoreQueries.q12CosineTopK(spark, sfDir).collect()
    assert(rows.length == 25)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }
}
