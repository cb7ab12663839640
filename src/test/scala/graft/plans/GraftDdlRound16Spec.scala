package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

/** Round 16 DDL surface beyond RENAME COLUMN: n-D `ZORDER BY`
  * (2-4 columns), the IF NOT EXISTS catalog-consistency fix, the
  * PARTITIONED-BY-in-a-string-literal delegate-back, and the one-commit
  * multi-column ALTER COLUMN TYPE. */
class GraftDdlRound16Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSessions.withExtensions
  private def withActive[A](f: => A): A =
    graft.TestSessions.withExtensionsActive(_ => f)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gm-ddl16-$tag").toString

  private def freshName(tag: String): String =
    s"gddl16_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("3-D and 4-D ZORDER BY re-cluster and preserve rows") {
    withActive {
      import spark.implicits._
      val dir = tmp("zorder3")
      TableManifest.publish(
        spark.range(4000).select(
          (org.apache.spark.sql.functions.col("id") % 17).as("x"),
          (org.apache.spark.sql.functions.col("id") % 23).as("y"),
          (org.apache.spark.sql.functions.col("id") % 31).as("z"),
          (org.apache.spark.sql.functions.col("id") % 13).as("w"),
          org.apache.spark.sql.functions.col("id").as("v"))
          .repartition(4), dir)
      val r3 = spark.sql(s"OPTIMIZE '$dir' ZORDER BY (x, y, z)").head()
      assert(r3.getLong(0) >= 1L)
      assert(TableManifest.readTable(spark, dir).count() == 4000L)
      // the re-clustered files carry stats for all three columns
      val stats = TableManifest.readStats(spark, dir)
      val names = TableManifest.read(spark, dir).get._2
      assert(names.forall(n => Seq("x", "y", "z").forall(c =>
        stats.get(n).exists(_.contains(c)))),
        "3-D zorder output must be born prunable on every interleave column")
      val r4 = spark.sql(s"OPTIMIZE '$dir' ZORDER BY (x, y, z, w)").head()
      assert(r4.getLong(0) >= 1L)
      assert(TableManifest.readTable(spark, dir).count() == 4000L)
    }
  }

  test("CREATE TABLE IF NOT EXISTS over a disagreeing live table is a no-op WITHOUT a catalog entry") {
    withActive {
      import spark.implicits._
      val dir = tmp("ine")
      // live FLAT table
      TableManifest.publish(Seq((1L, "a", 0L)).toDF("k", "s", "b"), dir)
      val tbl = freshName("ine")
      // declaration disagrees (asks for a partitioned layout)
      val v = spark.sql(s"CREATE TABLE IF NOT EXISTS $tbl " +
        s"(k BIGINT, s STRING, b BIGINT) USING `graft-manifest` " +
        s"PARTITIONED BY (b) OPTIONS (path '$dir')").head().getLong(0)
      assert(v >= 1L, "no-op returns the live head")
      assert(!spark.catalog.tableExists(tbl),
        "a mismatching declaration must NOT register a catalog entry " +
          "that contradicts what the table serves")
    }
  }

  test("a non-partitioned graft CTAS whose query contains 'PARTITIONED BY (' in a literal delegates cleanly") {
    withActive {
      val dir = tmp("literal")
      val tbl = freshName("lit")
      // the probe regex matches the literal; the clause parser must find
      // no top-level PARTITIONED BY and hand the statement back to stock
      // Spark, which creates the (flat) table normally
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir') " +
        "AS SELECT id AS k, ' PARTITIONED BY (oops)' AS s FROM range(5)")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 5L)
      assert(TableManifest.read(spark, dir).get._2.forall(!_.contains("/")),
        "the table is flat — the literal never became a layout")
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("an out-of-shape clause hiding a REAL top-level PARTITIONED BY stays loud") {
    withActive {
      val dir = tmp("hidden")
      val e = intercept[Exception](spark.sql(
        s"CREATE TABLE ${freshName("hid")} (k BIGINT, b BIGINT) " +
          s"USING `graft-manifest` TBLPROPERTIES ('a'='b') " +
          s"PARTITIONED BY (b) OPTIONS (path '$dir')"))
      assert(e.getMessage.contains("PARTITIONED BY"),
        s"must not silently delegate into a flat table: ${e.getMessage}")
    }
  }

  test("multi-column ALTER COLUMN TYPE lands in ONE commit") {
    withActive {
      import spark.implicits._
      val dir = tmp("widen2")
      TableManifest.publish(
        Seq((1, 2.0f, "a")).toDF("k", "f", "s").coalesce(1), dir)
      val tbl = freshName("widen")
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir')")
      val v0 = TableManifest.read(spark, dir).get._1
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN k TYPE BIGINT, " +
        "f TYPE DOUBLE")
      val v1 = TableManifest.read(spark, dir).get._1
      assert(v1 == v0 + 1,
        s"two retypes must commit atomically in one version: $v0 -> $v1")
      val sch = TableManifest.readSchema(spark, dir).get
      assert(sch("k").dataType == org.apache.spark.sql.types.LongType)
      assert(sch("f").dataType == org.apache.spark.sql.types.DoubleType)
      spark.sql(s"DROP TABLE $tbl")
    }
  }
}
