package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

/** The SQL row-level DML + time-travel surface over graft-manifest tables
  * ([[GraftSqlParser]] + [[GraftDmlRewrite]]): `UPDATE`, `MERGE INTO`
  * (whole-row upsert), `VERSION AS OF` / `TIMESTAMP AS OF`, and
  * name-addressed maintenance — with out-of-shape statements rejected at
  * planning and non-graft targets left to Spark's stock behavior. */
class GraftDmlSqlSpec extends AnyFunSuite {

  // the SHARED extensions-enabled session (graft.TestSessions — the
  // isolation pattern lives there once; duplicating the builder here
  // built a second extensions session per test JVM for nothing)
  private lazy val spark: SparkSession = graft.TestSessions.withExtensions

  private def withActive[A](f: => A): A =
    graft.TestSessions.withExtensionsActive(_ => f)

  /** Tracked 2-file table (keys 1..3 | 4..6), analyzed on k, registered
    * as a catalog table. Returns (dir, tableName). */
  private def newTable(tag: String): (String, String) = withActive {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"gm-dml-$tag").toString
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
        (4L, "d", 40L), (5L, "e", 50L), (6L, "f", 60L))
      .toDF("k", "s", "v")
      .repartitionByRange(2, org.apache.spark.sql.functions.col("k"))
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    val tbl = s"gdml_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
    (dir, tbl)
  }

  private def rows(dir: String): Seq[(Long, String, Long)] = withActive {
    import spark.implicits._
    TableManifest.readTable(spark, dir).as[(Long, String, Long)]
      .collect().toSeq.sortBy(_._1)
  }

  test("UPDATE by catalog name: file-granular copy-on-write, version row returned") {
    val (dir, tbl) = newTable("upd")
    val before = TableManifest.read(spark, dir).get._2.toSet
    val out = withActive { spark.sql(s"UPDATE $tbl SET v = v + 1 WHERE k <= 2").collect() }
    assert(out.map(_.getLong(0)).toSeq == Seq(3L), s"committed version: ${out.toSeq}")
    assert(rows(dir) == Seq((1L, "a", 11L), (2L, "b", 21L), (3L, "c", 30L),
      (4L, "d", 40L), (5L, "e", 50L), (6L, "f", 60L)))
    val after = TableManifest.read(spark, dir).get._2.toSet
    assert(before.intersect(after).size == 1,
      s"only the file holding k<=2 is rewritten: $before -> $after")
  }

  test("UPDATE assignments see the OLD row (swap) and cast back to the column type") {
    val (dir, tbl) = newTable("swap")
    withActive { spark.sql(s"UPDATE $tbl SET k = v, v = k WHERE k = 1") }
    assert(rows(dir).contains((10L, "a", 1L)), s"swapped: ${rows(dir)}")
    // int literal stores into the long column without changing the schema
    withActive { spark.sql(s"UPDATE $tbl SET v = 7 WHERE s = 'b'") }
    assert(rows(dir).contains((2L, "b", 7L)))
    assert(TableManifest.readSchema(spark, dir).get("v").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("UPDATE with no WHERE rewrites everything; alias-qualified refs resolve") {
    val (dir, tbl) = newTable("all")
    withActive { spark.sql(s"UPDATE $tbl SET v = 0") }
    assert(rows(dir).forall(_._3 == 0L))
    withActive { spark.sql(s"UPDATE $tbl AS x SET x.v = x.k * 2 WHERE x.k = 3") }
    assert(rows(dir).contains((3L, "c", 6L)))
  }

  test("UPDATE rejects unknown columns and nested targets at planning; non-graft falls through") {
    val (_, tbl) = newTable("rej")
    val e1 = intercept[Exception] {
      withActive { spark.sql(s"UPDATE $tbl SET nope = 1") }
    }
    assert(e1.getMessage.contains("unknown column"), e1.getMessage)
    val e2 = intercept[Exception] {
      withActive { spark.sql(s"UPDATE $tbl SET s.inner = 1") }
    }
    assert(e2.getMessage.contains("unsupported assignment target"), e2.getMessage)
    // a non-graft table keeps Spark's own (unsupported) behavior
    withActive {
      import spark.implicits._
      Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("gdml_plain_v")
      val e3 = intercept[Exception] {
        spark.sql("UPDATE gdml_plain_v SET a = 1")
      }
      assert(!Option(e3.getMessage).exists(_.contains("graft")), e3.getMessage)
    }
  }

  test("MERGE INTO upserts through mergeByKey: updates replace, inserts add") {
    val (dir, tbl) = newTable("merge")
    withActive {
      import spark.implicits._
      Seq((2L, "U2", 222L), (99L, "N99", 990L)).toDF("k", "s", "v")
        .createOrReplaceTempView("gdml_merge_src")
      val out = spark.sql(
        s"""MERGE INTO $tbl USING gdml_merge_src
           |ON $tbl.k = gdml_merge_src.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(3L))
    }
    assert(rows(dir) == Seq((1L, "a", 10L), (2L, "U2", 222L), (3L, "c", 30L),
      (4L, "d", 40L), (5L, "e", 50L), (6L, "f", 60L), (99L, "N99", 990L)))
  }

  test("MERGE rejects out-of-shape statements at planning, with the supported shape named") {
    val (_, tbl) = newTable("mrej")
    withActive {
      import spark.implicits._
      Seq((1L, "x", 1L)).toDF("k", "s", "v")
        .createOrReplaceTempView("gdml_mrej_src")
      def rejected(sql: String, why: String): Unit = {
        val e = intercept[Exception] { spark.sql(sql) }
        assert(e.getMessage.contains("graft-manifest MERGE supports exactly"),
          s"$why: ${e.getMessage}")
      }
      rejected(
        s"""MERGE INTO $tbl USING gdml_mrej_src ON $tbl.k = gdml_mrej_src.v
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
        "differently-named key columns")
      rejected(
        s"""MERGE INTO $tbl USING gdml_mrej_src ON $tbl.k = gdml_mrej_src.k
           |WHEN MATCHED THEN DELETE""".stripMargin,
        "matched-delete")
      rejected(
        s"""MERGE INTO $tbl USING gdml_mrej_src ON $tbl.k = gdml_mrej_src.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin,
        "not-matched-by-source")
      rejected(
        s"""MERGE INTO $tbl USING gdml_mrej_src ON $tbl.k = gdml_mrej_src.k
           |WHEN MATCHED AND gdml_mrej_src.v > 0 THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
        "conditional matched clause")
    }
  }

  test("VERSION AS OF / TIMESTAMP AS OF pin the committed snapshot from pure SQL") {
    val (dir, tbl) = newTable("tt") // v1: 6 rows
    val betweenMillis = System.currentTimeMillis()
    Thread.sleep(1100) // manifest mtime granularity can be 1s
    withActive {
      import spark.implicits._
      Seq((7L, "g", 70L)).toDF("k", "s", "v")
        .createOrReplaceTempView("gdml_tt_src")
      spark.sql(s"INSERT INTO $tbl SELECT k, s, v FROM gdml_tt_src") // v2
      assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head().getLong(0) == 7L)
      assert(spark.sql(s"SELECT count(*) AS n FROM $tbl VERSION AS OF 1")
        .head().getLong(0) == 6L, "v1 snapshot via SQL")
      assert(spark.sql(
        s"SELECT count(*) AS n FROM $tbl TIMESTAMP AS OF $betweenMillis")
        .head().getLong(0) == 6L, "epoch-millis literal pins v1")
      // a timestamp string in the session zone also works
      val iso = java.time.Instant.ofEpochMilli(betweenMillis).toString
      assert(spark.sql(
        s"SELECT count(*) AS n FROM $tbl TIMESTAMP AS OF '$iso'")
        .head().getLong(0) == 6L, "ISO timestamp string pins v1")
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM $tbl VERSION AS OF 99").collect()
      }
      assert(e.getMessage.contains("99"), e.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT * FROM $tbl TIMESTAMP AS OF current_timestamp()")
      }
      assert(e2.getMessage.contains("literal"), e2.getMessage)
    }
    assert(rows(dir).size == 7)
  }

  test("ALTER TABLE ADD COLUMNS widens the schema in one CAS commit; INSERT then carries it") {
    val (dir, tbl) = newTable("evo")
    withActive {
      import spark.implicits._
      val out = spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (note STRING)").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(3L), "metadata-only commit")
      // the carried schema widened; no data file was touched
      assert(TableManifest.readSchema(spark, dir).get.fieldNames.toSeq ==
        Seq("k", "s", "v", "note"))
      assert(TableManifest.read(spark, dir).get._2.size == 2,
        "no data rewrite for a metadata widen")
      // SELECT * through the catalog sees the new column, old rows NULL
      val head = spark.sql(s"SELECT note FROM $tbl WHERE k = 1").head()
      assert(head.isNullAt(0), "existing rows read NULL in the new column")
      // INSERT carrying the new column lands; old rows stay NULL
      Seq((7L, "g", 70L, "fresh")).toDF("k", "s", "v", "note")
        .createOrReplaceTempView("gdml_evo_src")
      spark.sql(s"INSERT INTO $tbl SELECT k, s, v, note FROM gdml_evo_src")
      val got = spark.sql(
        s"SELECT count(*) AS n, count(note) AS n_note FROM $tbl").head()
      assert(got.getLong(0) == 7L && got.getLong(1) == 1L, s"got: $got")
      // the two features COMPOSE: an UPDATE can SET (and filter on) a
      // declared column no data file physically carries yet
      spark.sql(s"UPDATE $tbl SET note = 'bk' WHERE note IS NULL")
      val got2 = spark.sql(
        s"SELECT count(note) AS n_note, count(DISTINCT note) AS d FROM $tbl")
        .head()
      assert(got2.getLong(0) == 7L && got2.getLong(1) == 2L, s"got2: $got2")
    }
  }

  test("ALTER TABLE ADD COLUMNS rejects NOT NULL, nested, positioned, and duplicate columns") {
    val (_, tbl) = newTable("evorej")
    withActive {
      def rejected(sql: String, fragment: String, why: String): Unit = {
        val e = intercept[Exception] { spark.sql(sql) }
        assert(e.getMessage.contains(fragment), s"$why: ${e.getMessage}")
      }
      rejected(s"ALTER TABLE $tbl ADD COLUMNS (x INT NOT NULL)",
        "NOT NULL", "not-null column")
      rejected(s"ALTER TABLE $tbl ADD COLUMNS (s.inner INT)",
        "nested", "nested path")
      rejected(s"ALTER TABLE $tbl ADD COLUMNS (x INT FIRST)",
        "position", "positioned column")
      rejected(s"ALTER TABLE $tbl ADD COLUMNS (V DOUBLE)",
        "already exist", "case-insensitive duplicate")
    }
  }

  test("CTAS creates a tracked manifest table; the whole SQL lifecycle runs on it") {
    val dir = java.nio.file.Files.createTempDirectory("gm-dml-ctas").toString
    val tbl = s"gdml_ctas_${java.util.UUID.randomUUID().toString.take(8)}"
    withActive {
      // CREATE TABLE … AS SELECT lands through the provider's batch write
      // (scratch → move-in → CAS commit) — v1 is the SELECT's rows
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir') AS " +
        "SELECT id AS k, CAST(id * 10 AS BIGINT) AS v FROM range(1, 7)")
      assert(TableManifest.read(spark, dir).isDefined, "CTAS committed a manifest")
      assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head().getLong(0) == 6L)
      // the created table is a first-class lifecycle citizen: DML,
      // maintenance, history, time travel all address it by name
      spark.sql(s"UPDATE $tbl SET v = 0 WHERE k = 1")
      spark.sql(s"DELETE FROM $tbl WHERE k = 6")
      assert(spark.sql(s"SELECT sum(v) AS s FROM $tbl").head().getLong(0) ==
        (2L to 5L).map(_ * 10).sum)
      assert(spark.sql(s"DESCRIBE HISTORY $tbl").count() >= 3L)
      assert(spark.sql(s"SELECT count(*) AS n FROM $tbl VERSION AS OF 1")
        .head().getLong(0) == 6L, "the CTAS snapshot stays time-travelable")
    }
  }

  test("UPDATE with an IN-subquery condition; MERGE from a time-travel source; path-addressed UPDATE") {
    val (dir, tbl) = newTable("edge")
    withActive {
      import spark.implicits._
      // IN-subquery WHERE: the condition Column resolves through normal
      // analysis on the victim scan, subquery included
      Seq(1L, 3L).toDF("kk").createOrReplaceTempView("gdml_edge_keys")
      spark.sql(
        s"UPDATE $tbl SET v = 0 WHERE k IN (SELECT kk FROM gdml_edge_keys)")
      assert(rows(dir).filter(_._3 == 0L).map(_._1) == Seq(1L, 3L),
        s"subquery-selected keys updated: ${rows(dir)}")
      // MERGE whose SOURCE is a time-travel read of another graft table:
      // the parser rewrites the source's VERSION AS OF before routing the
      // MERGE, so the snapshot feeding the upsert is the pinned v-old one
      val (srcDir, srcTbl) = newTable("edgesrc") // v1: v=10..60
      spark.sql(s"UPDATE $srcTbl SET v = -99") // head would poison the merge
      spark.sql(
        s"""MERGE INTO $tbl USING
           |  (SELECT * FROM $srcTbl VERSION AS OF 2) AS src
           |ON $tbl.k = src.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows(dir) == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
        (4L, "d", 40L), (5L, "e", 50L), (6L, "f", 60L)),
        s"merge read the PINNED source snapshot, not the poisoned head: ${rows(dir)}")
      assert(rows(srcDir).forall(_._3 == -99L), "source head untouched")
      // path-addressed UPDATE (back-ticked absolute path, no catalog)
      spark.sql(s"UPDATE `$dir` SET v = 7 WHERE k = 2")
      assert(rows(dir).contains((2L, "b", 7L)))
      // the fully-qualified 3-part form resolves too
      spark.sql(s"UPDATE spark_catalog.default.$tbl SET v = 8 WHERE k = 2")
      assert(rows(dir).contains((2L, "b", 8L)))
    }
  }

  test("UPDATE and MERGE convert an untracked dir in place first (the INSERT/DELETE posture)") {
    withActive {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("gm-dml-untracked").toString
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "v")
        .write.mode("overwrite").parquet(dir) // plain dir, no manifest
      val tbl = s"gdml_unt_${java.util.UUID.randomUUID().toString.take(8)}"
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      try {
        spark.sql(s"UPDATE $tbl SET v = v + 1 WHERE k = 1")
        assert(TableManifest.read(spark, dir).isDefined,
          "the UPDATE converted the dir in place")
        assert(rows(dir) == Seq((1L, "a", 11L), (2L, "b", 20L)))
        // a fresh untracked dir through MERGE converts too
        val dir2 = java.nio.file.Files.createTempDirectory("gm-dml-unt2").toString
        Seq((1L, "a", 10L)).toDF("k", "s", "v")
          .write.mode("overwrite").parquet(dir2)
        Seq((1L, "A", 100L), (2L, "n", 2L)).toDF("k", "s", "v")
          .createOrReplaceTempView("gdml_unt_src")
        spark.sql(
          s"""MERGE INTO `$dir2` USING gdml_unt_src ON `$dir2`.k = gdml_unt_src.k
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        assert(rows(dir2) == Seq((1L, "A", 100L), (2L, "n", 2L)))
      } finally spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("RESTORE TABLE rolls back to a prior version as one metadata commit") {
    val (dir, tbl) = newTable("restore") // v1 data, v2 analyze
    withActive {
      import spark.implicits._
      // v3: a bad update; v4: a bad delete — then roll both back
      spark.sql(s"UPDATE $tbl SET v = -1")
      spark.sql(s"DELETE FROM $tbl WHERE k >= 4")
      assert(rows(dir).size == 3 && rows(dir).forall(_._3 == -1L))
      val out = spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 2").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(5L), "restore is version 5")
      assert(rows(dir) == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
        (4L, "d", 40L), (5L, "e", 50L), (6L, "f", 60L)),
        s"contents rolled back: ${rows(dir)}")
      // history preserved: the bad versions stay time-travelable
      assert(spark.sql(s"SELECT count(*) AS n FROM $tbl VERSION AS OF 4")
        .head().getLong(0) == 3L, "the rolled-back state is still auditable")
      // restoring the head is a no-op (no version burned)
      assert(spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 5")
        .head().getLong(0) == 5L)
      // a vacuumed version is loud, never a broken head
      spark.sql(s"UPDATE $tbl SET v = 0 WHERE k = 1") // v6 rewrites a file
      spark.sql(s"VACUUM $tbl RETAIN 0 HOURS")
      val e = intercept[Exception] {
        spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 5")
      }
      assert(e.getMessage.contains("no longer restorable"), e.getMessage)
      // timestamp form resolves through versionAsOfTime
      val now = System.currentTimeMillis() + 60000
      assert(spark.sql(s"RESTORE TABLE $tbl TO TIMESTAMP AS OF $now")
        .head().getLong(0) == 6L, "timestamp at/after head: restore-head no-op")
    }
  }

  test("maintenance statements address catalog tables by NAME (and back-ticked paths)") {
    val (dir, tbl) = newTable("maint")
    withActive {
      // OPTIMIZE by name compacts the 2 fragments
      val opt = spark.sql(s"OPTIMIZE $tbl").head()
      assert(opt.getLong(0) == 2L && opt.getLong(1) == 1L, s"OPTIMIZE: $opt")
      // DESCRIBE HISTORY by name serves the ledger, newest first
      val h = spark.sql(s"DESCRIBE HISTORY $tbl").collect()
      // init v1, analyze-stats v2, compaction v3 — newest first
      assert(h.length == 3 && h.head.getLong(0) == 3L, s"history: ${h.toSeq}")
      // bare VACUUM by name keeps the grace default (nothing reclaimed)...
      assert(spark.sql(s"VACUUM $tbl").count() == 0L)
      // ...RETAIN 0 HOURS by back-ticked PATH reclaims the 2 delisted files
      val deleted = spark.sql(s"VACUUM `$dir` RETAIN 0 HOURS").collect()
      assert(deleted.length == 2, s"deleted: ${deleted.toSeq}")
      assert(TableManifest.readTable(spark, dir).count() == 6L)
      // a non-graft name is loud
      val e = intercept[Exception] { spark.sql("DESCRIBE HISTORY gdml_no_such") }
      assert(e.getMessage.contains("not a graft-manifest table"), e.getMessage)
    }
  }
}
