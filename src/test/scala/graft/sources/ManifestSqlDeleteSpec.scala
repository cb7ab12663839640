package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest

/** SQL `DELETE FROM` a graft-manifest catalog table routes onto the
  * metadata-pruned erase primitives ([[ManifestTableProvider]]'s
  * `SupportsDelete`): `col = v` / `IN` to the bloom+range-pruned key
  * erase, conjunctions of integral comparisons on one column to the
  * range erase (the retention shape), no condition to a schema-keeping
  * truncate — and every out-of-shape condition is rejected at planning
  * with the table untouched, never a silent wrong-slice delete. */
class ManifestSqlDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gm-del").toString
    (1L to 100L).map(i => (i, s"s$i", i * 10L)).toDF("k", "s", "v")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    dir
  }

  private def withTable(dir: String, name: String)(body: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-manifest` OPTIONS (path '$dir')")
    try body finally spark.sql(s"DROP TABLE $name")
  }

  test("DELETE WHERE k = v erases the row; untouched files keep their names") {
    val dir = fixture()
    val before = TableManifest.readHead(spark, dir).get
    withTable(dir, "gmd_eq") {
      spark.sql("DELETE FROM gmd_eq WHERE k = 42")
      val after = TableManifest.readHead(spark, dir).get
      assert(after._1 == before._1 + 1)
      assert(spark.sql("SELECT COUNT(*) FROM gmd_eq").head().getLong(0) == 99L)
      assert(spark.sql("SELECT COUNT(*) FROM gmd_eq WHERE k = 42")
        .head().getLong(0) == 0L)
      // range-pruned: only the one victim file (k in [26,50] slice) was
      // rewritten — the other three survive BY NAME
      val survivors = before._2.toSet intersect after._2.toSet
      assert(survivors.size == 3,
        s"expected 3 untouched files, got ${survivors.size}")
    }
  }

  test("DELETE WHERE k IN (...) and a string IN both erase") {
    val dir = fixture()
    withTable(dir, "gmd_in") {
      spark.sql("DELETE FROM gmd_in WHERE k IN (1, 2, 3)")
      assert(spark.sql("SELECT MIN(k) FROM gmd_in").head().getLong(0) == 4L)
      spark.sql("DELETE FROM gmd_in WHERE s IN ('s4', 's5')")
      assert(spark.sql("SELECT MIN(k) FROM gmd_in").head().getLong(0) == 6L)
      assert(spark.sql("SELECT COUNT(*) FROM gmd_in").head().getLong(0) == 95L)
    }
  }

  test("retention shape: a range conjunction folds to one range erase") {
    val dir = fixture()
    val before = TableManifest.readHead(spark, dir).get
    withTable(dir, "gmd_range") {
      spark.sql("DELETE FROM gmd_range WHERE k >= 10 AND k < 20")
      assert(spark.sql("SELECT COUNT(*) FROM gmd_range").head().getLong(0) == 90L)
      assert(spark.sql("SELECT COUNT(*) FROM gmd_range WHERE k BETWEEN 10 AND 19")
        .head().getLong(0) == 0L)
      // the [10,19] range lives entirely in the first of four range
      // partitions: the other three files survive by name
      val after = TableManifest.readHead(spark, dir).get
      assert((before._2.toSet intersect after._2.toSet).size == 3)
      // open-ended retention cutoff
      spark.sql("DELETE FROM gmd_range WHERE k > 90")
      assert(spark.sql("SELECT MAX(k) FROM gmd_range").head().getLong(0) == 90L)
    }
  }

  test("DELETE without WHERE truncates but keeps schema, readability, hwm") {
    val dir = fixture()
    val (v0, files0) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files0, v0, hwm = Some(3L))
    withTable(dir, "gmd_all") {
      spark.sql("DELETE FROM gmd_all")
      assert(spark.sql("SELECT COUNT(*) FROM gmd_all").head().getLong(0) == 0L)
      val head = TableManifest.readHead(spark, dir).get
      assert(head._2.isEmpty, "truncate left files listed")
      assert(head._3 == Some(3L), "truncate dropped the streaming hwm")
      // carried schema keeps the zero-file table readable
      assert(spark.read.format("graft-manifest").load(dir).columns.toSeq ==
        Seq("k", "s", "v"))
    }
  }

  test("out-of-shape conditions are rejected with the table untouched") {
    val dir = fixture()
    val before = TableManifest.readHead(spark, dir).get
    withTable(dir, "gmd_bad") {
      for (cond <- Seq("k % 2 = 0", "k = 1 OR s = 's9'", "k > 5 AND v < 100")) {
        intercept[Exception] { spark.sql(s"DELETE FROM gmd_bad WHERE $cond") }
      }
      assert(TableManifest.readHead(spark, dir).get == before,
        "a rejected DELETE changed the manifest")
      assert(spark.sql("SELECT COUNT(*) FROM gmd_bad").head().getLong(0) == 100L)
    }
  }

  test("contradictory bounds delete nothing and commit nothing") {
    val dir = fixture()
    val before = TableManifest.readHead(spark, dir).get
    withTable(dir, "gmd_empty") {
      spark.sql("DELETE FROM gmd_empty WHERE k > 50 AND k < 10")
      assert(spark.sql("SELECT COUNT(*) FROM gmd_empty").head().getLong(0) == 100L)
      assert(TableManifest.readHead(spark, dir).get == before,
        "an empty-range DELETE burned a manifest version")
    }
  }

  test("retention on TIMESTAMP and DATE columns: literal bounds map to stat units") {
    val dir = java.nio.file.Files.createTempDirectory("gm-ts-del").toString
    import org.apache.spark.sql.functions.{col, expr}
    // 4 range partitions over 40 days of hourly events. Written as INT64
    // micros: Spark's INT96 default carries NO usable footer stats, so an
    // INT96 table range-deletes correctly but unpruned (documented
    // conservative fallback) — the pruning assertion below needs a
    // stats-bearing physical encoding, which is what any stats-aware
    // writer at scale uses anyway.
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try spark.range(960)
      .select(col("id"),
        expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id)")
          .as("ts"),
        expr("date'2024-01-01' + CAST(id / 24 AS INT)").as("d"))
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(dir)
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    TableManifest.init(spark, dir)
    TableManifest.analyze(spark, dir, Seq("ts", "d"))
    val before = TableManifest.readHead(spark, dir).get
    spark.sql("DROP TABLE IF EXISTS gmd_ts")
    spark.sql(s"CREATE TABLE gmd_ts USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      // the canonical retention statement: expire everything before a cutoff
      spark.sql("DELETE FROM gmd_ts WHERE ts < TIMESTAMP '2024-01-11 00:00:00'")
      assert(spark.sql("SELECT COUNT(*) FROM gmd_ts").head().getLong(0) == 720L)
      assert(spark.sql("SELECT MIN(ts) FROM gmd_ts").head().getTimestamp(0)
        .toString.startsWith("2024-01-11"))
      // ts range [0,10d) lives in the first of four range partitions:
      // the other three survive by name (stats-pruned, micros units agree)
      val after = TableManifest.readHead(spark, dir).get
      assert((before._2.toSet intersect after._2.toSet).size == 3,
        "timestamp retention rewrote files the stats should have pruned")
      // DATE bound (epoch-days units)
      spark.sql("DELETE FROM gmd_ts WHERE d >= DATE '2024-02-05'")
      assert(spark.sql("SELECT MAX(d) FROM gmd_ts").head().getDate(0)
        .toString == "2024-02-04")
    } finally spark.sql("DROP TABLE gmd_ts")
  }

  test("time travel still sees rows deleted later") {
    val dir = fixture()
    val preV = TableManifest.read(spark, dir).get._1
    withTable(dir, "gmd_tt") {
      spark.sql("DELETE FROM gmd_tt WHERE k <= 50")
      assert(spark.sql("SELECT COUNT(*) FROM gmd_tt").head().getLong(0) == 50L)
      assert(spark.read.format("graft-manifest")
        .option("versionAsOf", preV).load(dir).count() == 100L)
    }
  }
}
