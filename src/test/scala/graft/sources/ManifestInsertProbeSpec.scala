package graft.sources

import graft.SparkSpec

/** `INSERT INTO` a graft-manifest catalog table must be rejected at
  * ANALYSIS, not die mid-write: the delegated parquet FileTable advertises
  * BATCH_WRITE, and without the read-only facade an insert would write
  * AROUND the manifest commit protocol (misleading runtime FS error on a
  * tracked dir; silently unlinearized files on an untracked fallback).
  * Writes belong to the committing surfaces (publish / ManifestAppendSink
  * / replaceWhereEq). */
class ManifestInsertProbeSpec extends SparkSpec {

  test("INSERT INTO a graft-manifest table fails at analysis; manifest intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gm-insert").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    graft.ops.TableManifest.init(spark, dir)
    val before = graft.ops.TableManifest.readHead(spark, dir).get
    spark.sql("DROP TABLE IF EXISTS gmi_probe")
    spark.sql(s"CREATE TABLE gmi_probe USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("INSERT INTO gmi_probe VALUES (2, 'b')")
      }
      assert(e.getMessage.toLowerCase.contains("does not support append") ||
        e.getMessage.toLowerCase.contains("unsupported"),
        s"expected an unsupported-append analysis error, got: ${e.getMessage}")
      // nothing written, nothing committed, no stray part- files
      val after = graft.ops.TableManifest.readHead(spark, dir).get
      assert(after == before, "manifest changed by a rejected insert")
      assert(graft.ops.TableManifest.readTable(spark, dir).count() == 1L)
      val stray = new java.io.File(dir).listFiles
        .count(f => f.getName.startsWith("part-") &&
          !before._2.contains(f.getName))
      assert(stray == 0, s"rejected insert left $stray stray files")
      // reads still work through the facade
      assert(spark.sql("SELECT COUNT(*) FROM gmi_probe").head().getLong(0) == 1L)
    } finally spark.sql("DROP TABLE gmi_probe")
  }
}
