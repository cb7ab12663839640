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
    "q5_window_topk", "q8_sort_limit", "q6_pivot", "q25_rollup", "q27_cube",
    "q33_sql_surface", "q37_intersect", "q40_full_outer",
    "q49_grouping_sets", "q55_window_suite", "q57_correlated_subquery",
    "q59_unpivot", "q69_lateral")

  /** Hand-written Spark-dialect twins for constructs whose oracle text is
    * either DuckDB-flavored or (like FILTER-based pivot emulation) not the
    * construct itself: the PIVOT clause proper. Compared against the same
    * DataFrame registry entry as the `dual` queries. */
  private val sparkDialect: Map[String, String] = Map(
    "q6_pivot" ->
      """SELECT user_id,
        |  coalesce(click, 0L) AS click, coalesce(error, 0L) AS error,
        |  coalesce(purchase, 0L) AS purchase, coalesce(signup, 0L) AS signup,
        |  coalesce(view, 0L) AS view
        |FROM (SELECT user_id, event_type FROM events)
        |PIVOT (COUNT(*) FOR event_type IN
        |  ('click' AS click, 'error' AS error, 'purchase' AS purchase,
        |   'signup' AS signup, 'view' AS view))
        |ORDER BY user_id""".stripMargin)

  private def compare(name: String, sqlText: String): Option[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val sql = spark.sql(sqlText)
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

  test("spark.sql over registered views returns exactly the DataFrame result") {
    graft.plans.GraftExtensions.register(spark)
    Tables.register(spark, sfDir)
    val diffs = dual.flatMap(n => compare(n, SparkEntry.oracleSql(n)))
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("Spark-dialect twins (PIVOT clause) return exactly the DataFrame result") {
    graft.plans.GraftExtensions.register(spark)
    Tables.register(spark, sfDir)
    val diffs = sparkDialect.toSeq.flatMap { case (n, s) => compare(n, s) }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("manifest tables are consumable from pure SQL via graft-manifest") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-manifest-sql").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.mode("overwrite").parquet(dir)
    graft.ops.TableManifest.init(spark, dir)
    // a second committed version so head != v1
    graft.ops.TableManifest.publish(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "s"), dir)

    // pure-SQL consumption: a catalog table over the provider (Spark
    // restricts FROM `fmt`.`path` direct queries to V1 FileFormats, so
    // CREATE TABLE ... USING is the DSv2 SQL entry point), reading the
    // HEAD snapshot
    spark.sql("DROP TABLE IF EXISTS graft_manifest_sql_tbl")
    spark.sql(s"CREATE TABLE graft_manifest_sql_tbl USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    val viaSql = spark
      .sql(s"SELECT id, s FROM graft_manifest_sql_tbl ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaApi = graft.ops.TableManifest.readTable(spark, dir)
      .orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("s"))))
      .toSeq
    assert(viaSql == viaApi && viaSql.map(_._1) == Seq(1L, 2L, 3L, 4L))

    // time travel through the same provider (reader options surface)
    val v1 = spark.read.format("graft-manifest")
      .option("versionAsOf", "1").load(dir)
      .orderBy("id").select("id").as[Long].collect().toSeq
    assert(v1 == Seq(1L, 2L, 3L), s"versionAsOf=1 read $v1")

    // the snapshot is explicit file paths: predicate pushdown + pruning
    // still come from the delegated parquet scan
    val plan = spark.sql(
      "SELECT id FROM graft_manifest_sql_tbl WHERE id = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(id,2)"), s"filter not pushed:\n$plan")
    spark.sql("DROP TABLE graft_manifest_sql_tbl")
  }

  test("a catalog table over graft-manifest tracks the HEAD across commits (no stale pin)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-manifest-fresh").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    graft.ops.TableManifest.init(spark, dir)
    spark.sql("DROP TABLE IF EXISTS graft_manifest_fresh_tbl")
    spark.sql(s"CREATE TABLE graft_manifest_fresh_tbl USING " +
      s"`graft-manifest` OPTIONS (path '$dir')")
    def n(): Long = spark
      .sql("SELECT count(*) AS n FROM graft_manifest_fresh_tbl")
      .head().getLong(0)
    assert(n() == 1L)
    // a commit AFTER the table exists and was read once: the next SELECT
    // must resolve the NEW head — a provider/table instance cached across
    // resolutions with a head pin that never invalidates would serve the
    // stale snapshot forever
    graft.ops.TableManifest.publish(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    assert(n() == 2L, "catalog SELECT must see the post-commit head")
    // and the reader-API path the same
    assert(spark.read.format("graft-manifest").load(dir).count() == 2L)
    spark.sql("DROP TABLE graft_manifest_fresh_tbl")
  }
}
