package graft.plans

import graft.SparkSpec
import graft.ops.TableManifest

/** The manifest protocol's table-valued SQL functions
  * ([[GraftTableFunctions]]): CDC (`graft_table_changes`), exact row
  * diff (`graft_row_diff`), and the commit ledger (`graft_history`) as
  * relations SQL composes over — path-addressed and name-addressed, with
  * non-literal arguments rejected at analysis. */
class TableFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gm-tvf").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((3L, "c")).toDF("k", "s"), 1L, dir) // v2
    TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L)) // v3
    dir
  }

  test("graft_table_changes / graft_row_diff / graft_history from SQL") {
    val dir = fixture()
    graft.TestSessions.withExtensionsActive { s =>
      // CDC: rows ADDED in (v1, v2] = the streamed batch
      val added = s.sql(s"SELECT k, s FROM graft_table_changes('$dir', 1, 2)")
        .as[(Long, String)].collect().toSeq
      assert(added == Seq((3L, "c")), s"added: $added")
      // the TVF is a real relation: composable (join + aggregate)
      val n = s.sql(
        s"""SELECT CAST(COUNT(*) AS BIGINT)
           |FROM graft_table_changes('$dir', 1, 2) c
           |JOIN graft_table_changes('$dir', 0, 2) a ON c.k = a.k""".stripMargin)
        .head().getLong(0)
      assert(n == 1L)
      // exact multiset diff across the erase: k=1 lost one copy
      val diff = s.sql(s"SELECT k, s, delta FROM graft_row_diff('$dir', 2, 3)")
        .as[(Long, String, Long)].collect().toSeq
      assert(diff == Seq((1L, "a", -1L)), s"diff: $diff")
      // ledger relation: 3 versions, hwm visible where it landed
      val hist = s.sql(
        s"SELECT version, hwm FROM graft_history('$dir') ORDER BY version")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      assert(hist == Seq((1L, -1L), (2L, 1L), (3L, 1L)), s"ledger: $hist")

      // NAME-addressed: the catalog-table convention
      val tbl = s"gtvf_${java.util.UUID.randomUUID().toString.take(8)}"
      s.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      try {
        assert(s.sql(s"SELECT COUNT(*) FROM graft_table_changes('$tbl', 1, 2)")
          .head().getLong(0) == 1L)
      } finally s.sql(s"DROP TABLE $tbl")

      // rejections are loud and named: non-literal versions, bad arity,
      // non-graft names
      assert(intercept[Exception] {
        s.sql(s"SELECT * FROM graft_table_changes('$dir', 1, (SELECT 2))")
          .collect()
      }.getMessage != null)
      assert(intercept[Exception] {
        s.sql(s"SELECT * FROM graft_history('$dir', 1)").collect()
      }.getMessage.contains("expects 1 argument"))
      assert(intercept[Exception] {
        s.sql("SELECT * FROM graft_history('no_such_table_xyz')").collect()
      }.getMessage.contains("not a graft-manifest table"))
    }
  }

  test("TVF hardening: empty-range schema, named range errors, partitioned CDC target") {
    val dir = fixture()
    graft.TestSessions.withExtensionsActive { s =>
      // the common CDC poll — an UNCHANGED range — projects columns fine
      // and returns zero rows (round-15 advice: this failed analysis as a
      // zero-column frame before)
      val empty = s.sql(s"SELECT k FROM graft_table_changes('$dir', 2, 2)")
      assert(empty.schema.fieldNames.toSeq == Seq("k") && empty.count() == 0L)
      def bad(sql: String, needle: String): Unit = {
        val e = intercept[Exception](s.sql(sql).collect())
        assert(e.getMessage.contains(needle),
          s"expected '$needle' in: ${e.getMessage}")
      }
      bad(s"SELECT * FROM graft_table_changes('$dir', 3, 1)",
        "backwards range")
      bad(s"SELECT * FROM graft_table_changes('$dir', -2, 1)", ">= 0")
      bad(s"SELECT * FROM graft_table_changes('$dir', 1, 99)",
        "retention pruned")
      // CDC over a PARTITIONED target: adds deliver with their
      // name-carried partition values
      val pdir = java.nio.file.Files.createTempDirectory("gm-tvf-part").toString
      TableManifest.publishPartitioned(
        Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("k", "s", "b"),
        pdir, Seq("b")) // v1
      graft.streaming.ManifestAppendSink.applyBatch(
        Seq((3L, "c", 1L)).toDF("k", "s", "b").coalesce(1), 1L, pdir) // v2
      val padd = s.sql(
        s"SELECT k, s, CAST(b AS BIGINT) AS b FROM graft_table_changes('$pdir', 1, 2)")
        .as[(Long, String, Long)].collect().toSeq
      assert(padd == Seq((3L, "c", 1L)), s"partitioned CDC adds: $padd")
      // and the empty partitioned range serves partition columns too
      val pempty = s.sql(s"SELECT b FROM graft_table_changes('$pdir', 2, 2)")
      assert(pempty.count() == 0L)
    }
  }
}
