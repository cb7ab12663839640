package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

/** Round 15 SQL DDL surface: `CREATE TABLE … PARTITIONED BY` (declared
  * empty table + partitioned CTAS — the last lifecycle step that was
  * library-only), `ALTER TABLE … ALTER COLUMN … TYPE` widening, and the
  * generalized `OPTIMIZE … ZORDER BY` column-list rejection matrix. */
class GraftDdlRound15Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSessions.withExtensions
  private def withActive[A](f: => A): A =
    graft.TestSessions.withExtensionsActive(_ => f)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gm-ddl15-$tag").toString

  private def freshName(tag: String): String =
    s"gddl_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("CREATE TABLE … PARTITIONED BY declares an empty partitioned table; the FIRST insert lands nested") {
    withActive {
      val dir = tmp("declare")
      val tbl = freshName("decl")
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, s STRING, bucket BIGINT) " +
        s"USING `graft-manifest` PARTITIONED BY (bucket) " +
        s"OPTIONS (path '$dir')")
      // v1 exists, empty, with BOTH schemas declared
      assert(TableManifest.read(spark, dir).contains((1L, Seq.empty)))
      assert(TableManifest.readPartitionSchema(spark, dir)
        .exists(_.fieldNames.toSeq == Seq("bucket")))
      // the empty table is SELECTable and serves all three columns
      assert(spark.sql(s"SELECT k, s, bucket FROM $tbl").count() == 0L)
      // the very first INSERT lays out k=v/-nested (no flat v1 to mimic)
      spark.sql(s"INSERT INTO $tbl VALUES (1, 'a', 0), (2, 'b', 1), (3, 'c', 0)")
      val names = TableManifest.read(spark, dir).get._2
      assert(names.nonEmpty && names.forall(_.matches("bucket=\\d+/.*")),
        s"first insert must land under partition dirs: $names")
      assert(spark.sql(s"SELECT bucket, count(*) AS n FROM $tbl " +
        "GROUP BY bucket ORDER BY bucket").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 2L), (1L, 1L)))
      // partitioned features apply from version 1
      assert(spark.sql(s"SHOW PARTITIONS $tbl").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("bucket=0", "bucket=1"))
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("partitioned CTAS routes through publishPartitioned") {
    withActive {
      val dir = tmp("ctas")
      val tbl = freshName("ctas")
      spark.range(10).createOrReplaceTempView("g15_ctas_src")
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"PARTITIONED BY (b) OPTIONS (path '$dir') " +
        "AS SELECT id AS k, CONCAT('r', id) AS s, id % 3 AS b " +
        "FROM g15_ctas_src")
      val names = TableManifest.read(spark, dir).get._2
      assert(names.nonEmpty && names.forall(_.startsWith("b=")),
        s"CTAS must land partitioned: $names")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 10L)
      // time travel + DESCRIBE DETAIL see a partitioned table
      val det = spark.sql(s"DESCRIBE DETAIL $tbl").head()
      assert(det.getBoolean(det.fieldIndex("partitioned")))
      spark.sql(s"DROP TABLE $tbl")
      spark.catalog.dropTempView("g15_ctas_src")
    }
  }

  test("CREATE PARTITIONED rejection matrix: unknown/dup/all-partition columns, layout mismatch, IF NOT EXISTS") {
    withActive {
      val dir = tmp("rej")
      def bad(sql: String, needle: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage.contains(needle),
          s"expected '$needle' in: ${e.getMessage}")
      }
      bad(s"CREATE TABLE ${freshName("r1")} (k BIGINT) USING `graft-manifest` " +
        s"PARTITIONED BY (nope) OPTIONS (path '$dir')",
        "partition column `nope` is not in the column list")
      bad(s"CREATE TABLE ${freshName("r2")} (k BIGINT, b BIGINT) " +
        s"USING `graft-manifest` PARTITIONED BY (b, B) OPTIONS (path '$dir')",
        "duplicate partition column")
      bad(s"CREATE TABLE ${freshName("r3")} (b BIGINT) USING `graft-manifest` " +
        s"PARTITIONED BY (b) OPTIONS (path '$dir')",
        "at least one data column")
      bad(s"CREATE TABLE ${freshName("r4")} (k BIGINT, v DOUBLE) " +
        s"USING `graft-manifest` PARTITIONED BY (v) OPTIONS (path '$dir')",
        "round-trip")
      bad(s"CREATE TABLE ${freshName("r5")} (k BIGINT, b BIGINT) " +
        s"USING `graft-manifest` PARTITIONED BY (days(b)) OPTIONS (path '$dir')",
        "plain top-level identifiers only")
      // a tracked FLAT table at the path: declaring a partitioned one
      // over it is loud; IF NOT EXISTS downgrades to a no-op
      import spark.implicits._
      TableManifest.publish(Seq((1L, "a")).toDF("k", "s").coalesce(1), dir)
      bad(s"CREATE TABLE ${freshName("r6")} (k BIGINT, s STRING, b BIGINT) " +
        s"USING `graft-manifest` PARTITIONED BY (b) OPTIONS (path '$dir')",
        "does not match PARTITIONED BY")
      val v = spark.sql(s"CREATE TABLE IF NOT EXISTS ${freshName("r7")} " +
        s"(k BIGINT, s STRING, b BIGINT) USING `graft-manifest` " +
        s"PARTITIONED BY (b) OPTIONS (path '$dir')").head().getLong(0)
      assert(v == TableManifest.read(spark, dir).get._1,
        "IF NOT EXISTS over a mismatched layout is a no-op, not a commit")
    }
  }

  test("ALTER COLUMN TYPE widens int->bigint metadata-only; old files up-cast at read; stats stay sound") {
    withActive {
      import spark.implicits._
      val dir = tmp("widen")
      val tbl = freshName("widen")
      // write NARROW (int) physical files
      Seq((1, "a"), (2, "b"), (3, "c"), (7, "d")).toDF("k", "s")
        .repartitionByRange(2, org.apache.spark.sql.functions.col("k"))
        .write.mode("overwrite").parquet(dir)
      TableManifest.init(spark, dir)
      TableManifest.analyze(spark, dir, Seq("k"))
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      val before = TableManifest.read(spark, dir).get._2.toSet
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN k TYPE BIGINT")
      // metadata-only: same files, wider declared + served type
      assert(TableManifest.read(spark, dir).get._2.toSet == before,
        "widen must rewrite no data file")
      assert(TableManifest.readSchema(spark, dir).get("k").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(spark.table(tbl).schema("k").dataType ==
        org.apache.spark.sql.types.LongType, "catalog schema synced")
      // the narrow physical files READ under the wide schema
      assert(spark.sql(s"SELECT sum(k) FROM $tbl").head().getLong(0) == 13L)
      // an INSERT may now carry genuinely-long values
      spark.sql(s"INSERT INTO $tbl VALUES (${Int.MaxValue.toLong + 7L}, 'w')")
      assert(spark.sql(s"SELECT max(k) FROM $tbl").head().getLong(0) ==
        Int.MaxValue.toLong + 7L)
      // committed stats stayed sound (same units): pruning still exact
      assert(TableManifest.prunedFiles(spark, dir, "k", 7L, 7L)
        .count(before) == 1, "integral widen must keep committed stats")
      // the statement itself read back through a fresh scan
      assert(TableManifest.readTable(spark, dir).count() == 5L)
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("ALTER COLUMN TYPE rejection matrix: narrowing, cross-kind, partition column, other alterations") {
    withActive {
      import spark.implicits._
      val dir = tmp("widen-rej")
      val tbl = freshName("wrej")
      Seq((1L, 1.5f, "a")).toDF("k", "f", "s").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      TableManifest.init(spark, dir)
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      def bad(sql: String, needle: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage.contains(needle),
          s"expected '$needle' in: ${e.getMessage}")
      }
      bad(s"ALTER TABLE $tbl ALTER COLUMN k TYPE INT",
        "not a supported widening")
      bad(s"ALTER TABLE $tbl ALTER COLUMN s TYPE BIGINT",
        "not a supported widening")
      bad(s"ALTER TABLE $tbl ALTER COLUMN k COMMENT 'x'",
        "graft-manifest ALTER TABLE ALTER COLUMN")
      // float -> double IS supported
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN f TYPE DOUBLE")
      assert(spark.sql(s"SELECT f FROM $tbl").head().getDouble(0) == 1.5d)
      // partition columns refuse (their values live in directory names)
      val pdir = tmp("widen-part")
      val ptbl = freshName("wpart")
      TableManifest.publishPartitioned(
        Seq((1L, "a", 0), (2L, "b", 1)).toDF("k", "s", "bucket"),
        pdir, Seq("bucket"))
      spark.sql(s"CREATE TABLE $ptbl USING `graft-manifest` OPTIONS (path '$pdir')")
      bad(s"ALTER TABLE $ptbl ALTER COLUMN bucket TYPE BIGINT",
        "partition column")
      spark.sql(s"DROP TABLE $tbl")
      spark.sql(s"DROP TABLE $ptbl")
    }
  }

  test("OPTIMIZE … ZORDER BY names its arity/shape errors instead of a generic parse failure") {
    withActive {
      import spark.implicits._
      val dir = tmp("zorder")
      TableManifest.publish(
        Seq((1L, 2L, "a")).toDF("x", "y", "s").coalesce(1), dir)
      def bad(sql: String, needle: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage.contains(needle),
          s"expected '$needle' in: ${e.getMessage}")
      }
      bad(s"OPTIMIZE '$dir' ZORDER BY (x)", "two to four data columns")
      bad(s"OPTIMIZE '$dir' ZORDER BY (x, y, x, y, x)",
        "two to four data columns")
      bad(s"OPTIMIZE '$dir' ZORDER BY (x + 1, y)",
        "unsupported column reference")
      // back-quoted plain identifiers are unwrapped and work
      val r = spark.sql(s"OPTIMIZE '$dir' ZORDER BY (`x`, `y`)").head()
      assert(r.getLong(0) >= 1L)
    }
  }

  test("CTAS keeps CREATE semantics: an existing target never silently snapshot-replaces") {
    withActive {
      import graft.ops.TableManifest
      import spark.implicits._
      val dir = tmp("ctas-guard")
      TableManifest.publishPartitioned(
        Seq((1L, 0L)).toDF("k", "b"), dir, Seq("b"))
      val v1 = TableManifest.read(spark, dir).get._1
      // plain CTAS over the populated dir: loud, nothing committed
      val e = intercept[Exception](spark.sql(
        s"CREATE TABLE ${freshName("cg1")} USING `graft-manifest` " +
          s"PARTITIONED BY (b) OPTIONS (path '$dir') " +
          "AS SELECT 9 AS k, 1 AS b"))
      assert(e.getMessage.contains("never overwrites"), e.getMessage)
      assert(TableManifest.read(spark, dir).get._1 == v1, "no commit")
      // IF NOT EXISTS: idempotent no-op, even path-addressed (the
      // deployment-script re-run shape) — contents untouched
      val v = spark.sql(
        s"CREATE TABLE IF NOT EXISTS ${freshName("cg2")} " +
          s"USING `graft-manifest` PARTITIONED BY (b) " +
          s"OPTIONS (path '$dir') AS SELECT 9 AS k, 1 AS b")
        .head().getLong(0)
      assert(v == v1 && TableManifest.readTable(spark, dir).count() == 1L)
    }
  }

  test("the CREATE probe never hijacks non-graft statements mentioning graft-manifest in a value") {
    withActive {
      val dir = tmp("probe")
      // "graft-manifest" appears only inside the path STRING; the USING
      // clause names parquet — stock Spark must own this statement
      val tbl = freshName("probe")
      spark.sql(s"CREATE TABLE $tbl (a INT, b INT) USING parquet " +
        s"PARTITIONED BY (b) LOCATION '$dir/graft-manifest-mirror'")
      spark.sql(s"INSERT INTO $tbl VALUES (1, 2)")
      assert(spark.table(tbl).count() == 1L)
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("CREATE with a column list over a tracked dir validates declared types against the served schema") {
    withActive {
      import graft.ops.TableManifest
      import spark.implicits._
      val dir = tmp("type-agree")
      TableManifest.publishPartitioned(
        Seq((1L, "a", 0L)).toDF("k", "s", "b"), dir, Seq("b"))
      val e = intercept[Exception](spark.sql(
        s"CREATE TABLE ${freshName("ta1")} (k STRING, s STRING, b BIGINT) " +
          s"USING `graft-manifest` PARTITIONED BY (b) OPTIONS (path '$dir')"))
      assert(e.getMessage.contains("disagrees with its schema"),
        e.getMessage)
      // agreeing declaration registers fine
      spark.sql(s"CREATE TABLE ${freshName("ta2")} " +
        s"(k BIGINT, s STRING, b BIGINT) USING `graft-manifest` " +
        s"PARTITIONED BY (b) OPTIONS (path '$dir')")
    }
  }

  test("multi-column ALTER COLUMN TYPE is all-or-nothing: a bad later spec commits nothing") {
    withActive {
      import graft.ops.TableManifest
      import spark.implicits._
      val dir = tmp("multi-widen")
      val tbl = freshName("mw")
      Seq((1, 2L, "x")).toDF("a", "b", "s").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      TableManifest.init(spark, dir)
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      val v0 = TableManifest.read(spark, dir).get._1
      // a INT -> BIGINT is fine, b BIGINT -> INT is narrowing: the whole
      // statement must fail BEFORE the first commit
      val e = intercept[Exception](spark.sql(
        s"ALTER TABLE $tbl ALTER COLUMN a TYPE BIGINT, b TYPE INT"))
      assert(e.getMessage.contains("not a supported widening"), e.getMessage)
      assert(TableManifest.read(spark, dir).get._1 == v0,
        "no partial widen may commit")
      assert(TableManifest.readSchema(spark, dir).get("a").dataType ==
        org.apache.spark.sql.types.IntegerType)
      spark.sql(s"DROP TABLE $tbl")
    }
  }
}
