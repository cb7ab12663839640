package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

/** The SQL maintenance statements (`VACUUM` / `OPTIMIZE` /
  * `DESCRIBE HISTORY` over a quoted path, [[GraftSqlParser]]): a
  * SQL-only operator can run the whole table lifecycle — and every
  * statement the delegating parser does NOT own must reach Spark's
  * parser untouched. */
class MaintenanceSqlSpec extends AnyFunSuite {

  // extensions-enabled session, isolated from the shared SparkSpec one
  // (same pattern as TopKRewriteRuleSpec)
  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-maint-sql-test")
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

  test("VACUUM / OPTIMIZE / DESCRIBE HISTORY run the lifecycle from SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gm-maint-sql").toString
    (1L to 100L).toDF("id").repartition(8)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)

    // OPTIMIZE compacts the 8 fragments through the CAS swap
    val opt = spark.sql(s"OPTIMIZE '$dir'").head()
    assert(opt.getLong(0) == 8L && opt.getLong(1) == 1L,
      s"unexpected OPTIMIZE stats: $opt")
    assert(spark.sql(s"SELECT COUNT(*) FROM parquet.`$dir/" +
      TableManifest.readHead(spark, dir).get._2.head + "`")
      .head().getLong(0) == 100L)

    // DESCRIBE HISTORY: newest first, commit wall-clock, adds/removes ledger
    val h = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
    assert(h.length == 2)
    assert(h.head.getLong(0) == 2L && h.head.getLong(2) == 1L &&
      h.head.getLong(5) == 8L, s"head ledger row: ${h.head}")
    assert(h.last.getLong(0) == 1L && h.last.getLong(2) == 8L)
    assert(h.forall(r => r.getTimestamp(1) != null) &&
      !h.head.getTimestamp(1).before(h.last.getTimestamp(1)),
      s"body-recorded commit times, newest first: ${h.toSeq}")

    // bare VACUUM defaults to the 168h grace (the lakehouse convention) —
    // the just-delisted fragments survive a retention-less statement...
    assert(spark.sql(s"VACUUM '$dir'").count() == 0L)
    assert(spark.sql(s"VACUUM '$dir' RETAIN 168 HOURS").count() == 0L)
    // ...and immediate reclamation is an explicit RETAIN 0 HOURS opt-in
    val deleted = spark.sql(s"VACUUM '$dir' RETAIN 0 HOURS").as[String].collect()
    assert(deleted.length == 8, s"deleted: ${deleted.toSeq}")
    assert(TableManifest.readTable(spark, dir).count() == 100L)

    // everything else still parses through Spark's own grammar
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) == 2)
    assert(spark.sql("DESCRIBE FUNCTION abs").count() > 0)
    intercept[Exception] { spark.sql("VACUUM") } // malformed → Spark's parser
  }

  test("DESCRIBE DETAIL serves the operational snapshot from one head read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gm-detail").toString
    (1L to 10L).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq(11L).toDF("id"), batchId = 3L, dir) // v2, hwm = 3
    val d = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
    assert(d.getString(0) == dir)
    assert(d.getLong(1) == 2L, s"version: $d") // init + append
    assert(d.getLong(2) == 3L, s"n_files: $d") // 2 fragments + 1 batch file
    assert(!d.isNullAt(3) && d.getLong(3) > 0L, s"size from inventory: $d")
    assert(d.getLong(4) == 3L, s"hwm: $d")
    assert(d.getLong(5) == 1L, s"n_columns: $d")
    assert(!d.getBoolean(6), s"flat layout: $d")
    assert(d.getLong(7) == 2L, s"n_versions: $d")
    // loud on an untracked dir
    val plain = java.nio.file.Files.createTempDirectory("gm-detail-plain").toString
    val e = intercept[Exception] { spark.sql(s"DESCRIBE DETAIL '$plain'") }
    assert(e.getMessage.contains("not manifest-tracked"), e.getMessage)
  }

  test("DESCRIBE DETAIL surfaces n_dv_files / dv_deleted_rows / dv_max_density") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gm-detail-dv").toString
    (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    val clean = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
    assert(clean.getLong(9) == 0L && clean.getLong(10) == 0L &&
      clean.isNullAt(11), s"dv-free table reports zeros/NULL: $clean")
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    try TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L, 2L))
    finally spark.conf.unset("spark.graft.dml.deletionVectors")
    val d = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
    assert(d.getLong(9) == 1L, s"one dv'd file: $d")
    assert(d.getLong(10) == 2L, s"two deleted rows: $d")
    assert(math.abs(d.getDouble(11) - 0.2) < 1e-9,
      s"2 of 10 rows deleted = density 0.2 from the footer row count: $d")
    // past the distribute threshold the same footers are read as a Spark
    // job (a many-dv table must not serialize thousands of driver-side
    // opens); identical numbers either way
    spark.conf.set("spark.graft.detail.distributeThreshold", "1")
    try {
      val dd = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
      assert(dd.getLong(9) == d.getLong(9) &&
        dd.getLong(10) == d.getLong(10) &&
        math.abs(dd.getDouble(11) - d.getDouble(11)) < 1e-12,
        s"distributed footer reads match the driver path: $dd vs $d")
    } finally spark.conf.unset("spark.graft.detail.distributeThreshold")
  }
}
