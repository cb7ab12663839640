package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** SQL-interface surface proof for the join/window/agg core: the same
  * engine consumed through `spark.sql` over registered views must return
  * EXACTLY what the DataFrame query registry returns.
  *
  * The SQL text is each query's oracle twin (`SparkEntry.oracleSql`) — for
  * the queries below it is pure ANSI that Spark SQL and DuckDB both parse,
  * so one string is simultaneously (a) the DuckDB correctness oracle and
  * (b) the SQL-consumer entry point, and this spec pins that the two
  * consumption paths cannot drift. Queries whose oracle leans on DuckDB
  * dialect (list_*, `//`, epoch_ns, date−date arithmetic, range(n) AS
  * r(i)) are out of scope here — their SQL surface is exercised through
  * q33/q49's hand-written Spark SQL instead.
  *
  * Guards the extension/registry path too: the session runs with
  * [[graft.plans.GraftExtensions]] active, so a regression that only SQL
  * consumers would hit (a broken function registration, a bad optimizer
  * rewrite on parsed plans — q5's ROW_NUMBER top-k rewrites through
  * TopKPerKeyExec) fails here. */
class SqlSurfaceSpec extends SparkSpec {

  /** Dual-dialect queries: oracle SQL is valid Spark SQL with identical
    * semantics. Spans scans+filters (q1), decimal-exact aggregates (q2),
    * multi-joins (q3), anti/semi joins (q4, q33), ranked windows (q5),
    * sort+limit (q8), rollup (q25), set ops (q37), full outer join (q40),
    * analytic window suite (q55), correlated subqueries (q57), and
    * unpivot-by-union (q59). */
  private val dual = Seq(
    "q1_filter_project", "q2_group_agg", "q3_join_revenue", "q4_anti_join",
    "q5_window_topk", "q8_sort_limit", "q25_rollup", "q33_sql_surface",
    "q37_intersect", "q40_full_outer", "q55_window_suite",
    "q57_correlated_subquery", "q59_unpivot")

  test("spark.sql over registered views returns exactly the DataFrame result") {
    graft.plans.GraftExtensions.register(spark)
    Tables.register(spark, sfDir)
    val diffs = dual.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val sql = spark.sql(SparkEntry.oracleSql(name))
      val dfCols = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val sqlCols = sql.schema.fields.map(f => (f.name, f.dataType)).toSeq
      if (dfCols != sqlCols)
        Some(s"$name: schema drift df=$dfCols sql=$sqlCols")
      else {
        val a = df.collect().toSeq
        val b = sql.collect().toSeq
        if (a != b)
          Some(s"$name: ${a.size} vs ${b.size} rows; first diff: " +
            a.zip(b).find { case (x, y) => x != y }
              .orElse(Some((a.size, b.size))).get)
        else None
      }
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
