package graft

import org.apache.spark.sql.SparkSession

/** A shared GraftExtensions-enabled session for suites that must execute
  * statements only the graft PARSER owns (UPDATE / MERGE INTO / VERSION
  * AS OF / maintenance SQL on graft-manifest tables). Built beside —
  * never replacing — [[SparkSpec.session]]: the two share one
  * SparkContext, and the default/active slots are restored so the plain
  * session keeps serving every other suite (the MaintenanceSqlSpec
  * isolation pattern, hoisted for reuse). */
object TestSessions {

  /** Queries whose BODIES execute statements only the graft PARSER owns
    * (SQL UPDATE / MERGE / time travel / ALTER ADD COLUMNS) — suites
    * that sweep the whole query surface with the plain session must run
    * these through [[withExtensionsActive]] instead. */
  val parserQueries: Set[String] =
    Set("q175_sql_update", "q176_sql_merge", "q177_sql_time_travel",
      "q179_schema_evolution", "q181_restore",
      "q186_partitioned_update", "q187_partitioned_merge",
      "q188_partitioned_optimize", "q190_drop_columns", "q191_sql_zorder",
      "q192_sql_cdc", "q193_sql_create_partitioned",
      "q194_alter_column_widen", "q195_partitioned_cdc",
      "q197_rename_column", "q198_rename_dml", "q199_dv_dml")

  lazy val withExtensions: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Paths.get("target/tmp/warehouse-ext")
          .toAbsolutePath.toString)
      .withExtensions(new graft.plans.GraftExtensions)
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

  /** Run `f` with the extensions session ACTIVE (parse-time resolution in
    * GraftDmlRewrite reads the active session), restoring the previous
    * active session after. */
  def withExtensionsActive[A](f: SparkSession => A): A = {
    val s = withExtensions
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(s)
    try f(s)
    finally prev match {
      case Some(p) => SparkSession.setActiveSession(p)
      case None => SparkSession.clearActiveSession()
    }
  }
}
