package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Round-14 hardening drills for the manifest protocol:
  *
  *  - the restore/vacuum check-then-commit race (restore re-verifies
  *    AFTER its CAS and rolls back; vacuum re-reads the head at the last
  *    moment) — injected deterministically via
  *    [[TableManifest.restorePreCommitHook]];
  *  - [[TableManifest.init]]'s sweep descends ONLY hive-shaped `k=v`
  *    subdirectories, loud on foreign data-bearing ones (the vacuum
  *    predicate — a user backup dir must never become table rows);
  *  - the DECLARED partition schema: persisted at init /
  *    publishPartitioned, carried through every commit, serving the
  *    partition columns of an EMPTIED partitioned table and restating
  *    itself correctly across RESTORE in both directions. */
class ManifestRound14Spec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("restore rolls back when a vacuum wins the check-then-commit window") {
    val dir = tmpDir("gm-rst-race")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1
    TableManifest.publish(Seq((9L, "z")).toDF("id", "s"), dir) // v2: v1 delisted
    val headBefore = TableManifest.read(spark, dir).get
    // a zero-grace vacuum fires INSIDE restore's window — after the
    // restorability check approved v1's delisted files, before the CAS
    TableManifest.restorePreCommitHook =
      () => { TableManifest.vacuum(spark, dir, graceMillis = 0L); () }
    try {
      val e = intercept[Exception] { TableManifest.restore(spark, dir, 1L) }
      assert(e.getMessage.contains("rolled the head back"), e.getMessage)
    } finally TableManifest.restorePreCommitHook = () => ()
    // the head was rolled back to the pre-restore contents: readers never
    // stay on a head that scans FAILED_READ
    val rows = TableManifest.readTable(spark, dir)
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((9L, "z")), s"post-rollback contents: $rows")
    assert(TableManifest.read(spark, dir).get._2.toSet ==
      headBefore._2.toSet, "rolled-back head lists the old files")
    // without the injected race, the same restore is loud-but-clean
    // (the files are already gone, so the PRE-check fires)
    val e2 = intercept[Exception] { TableManifest.restore(spark, dir, 1L) }
    assert(e2.getMessage.contains("no longer restorable"), e2.getMessage)
  }

  test("vacuum's last-moment head re-read keeps files a racing restore re-listed") {
    val dir = tmpDir("gm-vac-race")
    Seq((1L, "a")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1
    TableManifest.publish(Seq((9L, "z")).toDF("id", "s"), dir) // v2
    // restore lands BETWEEN vacuum's candidate computation and its
    // deletes — modeled by restoring first and then running vacuum: the
    // re-listed v1 files must survive a zero-grace pass
    TableManifest.restore(spark, dir, 1L) // v3 = v1's contents
    val deleted = TableManifest.vacuum(spark, dir, graceMillis = 0L)
    assert(TableManifest.readTable(spark, dir)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")),
      s"restored head scans clean after vacuum (deleted: $deleted)")
  }

  test("init: only k=v subdirs are swept; a data-bearing foreign subdir is loud") {
    val dir = tmpDir("gm-init-guard")
    Seq((1L, 0L), (2L, 1L)).toDF("id", "side").coalesce(1)
      .write.partitionBy("side").mode("overwrite").parquet(dir)
    // an empty non-hive subdir is harmless
    assert(new java.io.File(dir, "scratchpad").mkdir())
    // a user backup holding parquet under a NON-hive name must fail init
    // loudly (silently skipping would serve different rows than the plain
    // read this conversion replaces; sweeping it would commit foreign
    // rows and mislabel the table's layout)
    Seq(99L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/backup")
    val e = intercept[Exception] { TableManifest.init(spark, dir) }
    assert(e.getMessage.contains("non-hive"), e.getMessage)
    // cleaned up, init sweeps the hive layout (empty subdir ignored)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir, "backup"))
    TableManifest.init(spark, dir)
    assert(TableManifest.readTable(spark, dir).count() == 2L)
  }

  test("INSERT into an UNTRACKED hive-partitioned plain dir converts it first, shadowing nothing") {
    val dir = tmpDir("gm-untracked-part")
    Seq((1L, 0L), (2L, 1L)).toDF("id", "side").coalesce(1)
      .write.partitionBy("side").mode("overwrite").parquet(dir)
    // NO init: the provider append must convert in place (sweeping the
    // nested files) and then lay its batch out for the swept layout —
    // before round 14 the pre-scan only saw ROOT files, so the first
    // commit listed just the appended files and silently shadowed every
    // pre-existing nested row
    Seq((3L, 1L)).toDF("id", "side")
      .write.format("graft-manifest").mode("append").save(dir)
    val got = spark.read.format("graft-manifest").load(dir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 1L)),
      s"conversion swept the nested rows and the append landed: $got")
    val (_, names) = TableManifest.read(spark, dir).get
    assert(names.forall(_.startsWith("side=")), s"single layout: $names")
  }

  test("dropColumns: metadata-only narrow; rewrites physically purge the dropped bytes") {
    val dir = tmpDir("gm-dropcol")
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "s", "v").repartition(3, col("id"))
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1
    val filesBefore = TableManifest.read(spark, dir).get._2.toSet
    TableManifest.dropColumns(spark, dir, Seq("s")) // v2: metadata-only
    assert(TableManifest.read(spark, dir).get._2.toSet == filesBefore,
      "no data file rewritten by the drop")
    // every read path serves the narrowed schema immediately
    assert(TableManifest.readTable(spark, dir).columns.toSeq == Seq("id", "v"))
    assert(spark.read.format("graft-manifest").load(dir)
      .columns.toSeq == Seq("id", "v"))
    // time travel serves the PRE-drop schema (history, not a leak)
    assert(TableManifest.readTableAt(spark, dir, 1L)
      .columns.toSet == Set("id", "s", "v"))
    // contract edges are loud
    assert(intercept[Exception] {
      TableManifest.dropColumns(spark, dir, Seq("nosuch"))
    }.getMessage.contains("unknown column"))
    assert(intercept[Exception] {
      TableManifest.dropColumns(spark, dir, Seq("id", "v"))
    }.getMessage.contains("every column"))
    // a copy-on-write rewrite PROJECTS to the declared schema: the
    // dropped column's bytes do not ride back into the carried schema
    TableManifest.updateWhere(spark, dir,
      Seq("v" -> (col("v") + 1L)), Some(col("id") === 1L))
    assert(TableManifest.readSchema(spark, dir).get.fieldNames.toSeq ==
      Seq("id", "v"), "update must not resurrect the dropped column")
    // ...and the rewritten victim FILE no longer carries it physically
    val rewritten = TableManifest.read(spark, dir).get._2
      .filterNot(filesBefore).head
    assert(!spark.read.parquet(s"$dir/$rewritten").columns.contains("s"),
      "the rewrite physically purged the dropped column")
    // compaction purges the remaining old footers the same way
    graft.ops.Compaction.compactInPlace(spark, dir,
      targetBytes = 1L << 20, minFileBytes = 1L << 20)
    assert(TableManifest.readSchema(spark, dir).get.fieldNames.toSeq ==
      Seq("id", "v"))
    val all = TableManifest.readTable(spark, dir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(all == Seq((1L, 11L), (2L, 20L), (3L, 30L)), s"rows: $all")
  }

  test("dropColumns on partitioned tables: partition columns refuse; zorder per leaf clusters") {
    val dir = tmpDir("gm-dropcol-part")
    TableManifest.publishPartitioned(
      (1L to 40L).map(i => (i, i * 100L, i % 2)).toDF("id", "v", "side")
        .repartition(4),
      dir, Seq("side"))
    val e = intercept[Exception] {
      TableManifest.dropColumns(spark, dir, Seq("side"))
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // partition-scoped Z-ORDER: one leaf re-clusters, the other is
    // byte-identical; rows and partition values survive
    val before = TableManifest.read(spark, dir).get._2
    assert(before.count(_.startsWith("side=0/")) == 4)
    TableManifest.optimizeZOrderPartition(spark, dir, "side=0",
      "id", "v", numFiles = 2)
    val after = TableManifest.read(spark, dir).get._2
    assert(after.count(_.startsWith("side=0/")) == 2, s"clustered: $after")
    assert(after.filter(_.startsWith("side=1/")).toSet ==
      before.filter(_.startsWith("side=1/")).toSet,
      "the other leaf is byte-identical")
    val got = spark.read.format("graft-manifest").load(dir)
      .selectExpr("id", "v", "side").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(got == (1L to 40L).map(i => (i, i * 100L, i % 2)).sorted)
    // interleaving a partition column is refused (constant in the leaf)
    assert(intercept[Exception] {
      TableManifest.optimizeZOrderPartition(spark, dir, "side=0",
        "side", "v", 1)
    }.getMessage.contains("partition column"))
  }

  test("partitioned UPDATE prunes candidates on the k=v segments: only the named partition's files rewrite") {
    val dir = tmpDir("gm-seg-prune")
    TableManifest.publishPartitioned(
      (1L to 12L).map(i => (i, i * 10L, i % 3)).toDF("id", "v", "bucket")
        .repartition(2),
      dir, Seq("bucket"))
    val before = TableManifest.read(spark, dir).get._2
    // the condition names ONLY the partition column; the prune range in
    // segment units confines the copy-on-write to bucket=1's files —
    // every other partition's files must survive UNDER THE SAME NAMES
    // (not rewritten-and-respliced), the file-level proof of the claim
    TableManifest.updateWhere(spark, dir,
      Seq("v" -> (col("v") + 1L)),
      Some(col("bucket") === 1L),
      pruneRanges = Seq(("bucket", 1L, 1L)))
    val after = TableManifest.read(spark, dir).get._2
    assert(after.filterNot(_.startsWith("bucket=1/")).toSet ==
      before.filterNot(_.startsWith("bucket=1/")).toSet,
      s"non-matching partitions byte-identical: $before -> $after")
    assert(after.filter(_.startsWith("bucket=1/")).toSet !=
      before.filter(_.startsWith("bucket=1/")).toSet,
      "the named partition was rewritten")
    val got = spark.read.format("graft-manifest").load(dir)
      .selectExpr("id", "v", "bucket").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(got == (1L to 12L).map(i =>
      (i, i * 10L + (if (i % 3 == 1) 1L else 0L), i % 3)).sorted, s"$got")
  }

  test("SQL DROP COLUMNS: catalog sync, IF EXISTS no-op, nested rejection; flat ZORDER BY") {
    val dir = tmpDir("gm-dropcol-sql")
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "v")
      .repartition(2, col("id")).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    graft.TestSessions.withExtensionsActive { s =>
      val tbl = s"g14sql_${java.util.UUID.randomUUID().toString.take(8)}"
      s.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      try {
        s.sql(s"ALTER TABLE $tbl DROP COLUMNS (s)")
        // catalog schema synced: SELECT * serves the narrowed shape, and
        // an INSERT carrying the dropped column fails ANALYSIS
        assert(s.sql(s"SELECT * FROM $tbl").columns.toSeq == Seq("id", "v"))
        intercept[Exception] {
          s.sql(s"INSERT INTO $tbl VALUES (3, 'x', 30)")
        }
        // unknown column loud; IF EXISTS filters to a version-preserving
        // no-op
        assert(intercept[Exception] {
          s.sql(s"ALTER TABLE $tbl DROP COLUMNS (nosuch)")
        }.getMessage.contains("unknown column"))
        val v0 = TableManifest.read(spark, dir).get._1
        assert(s.sql(s"ALTER TABLE $tbl DROP COLUMNS IF EXISTS (nosuch)")
          .head().getLong(0) == v0, "IF EXISTS all-unknown is a no-op")
        // nested paths rejected with the supported shape named
        assert(intercept[Exception] {
          s.sql(s"ALTER TABLE $tbl DROP COLUMNS (a.b)")
        }.getMessage.contains("top-level"))
        // whole-table ZORDER BY on the flat layout re-clusters: 2 -> 1
        // file at these sizes, rows intact, fresh stats committed
        val opt = s.sql(s"OPTIMIZE $tbl ZORDER BY (id, v)").head()
        assert(opt.getLong(0) == 2L && opt.getLong(1) == 1L, s"stats: $opt")
        assert(s.sql(s"SELECT CAST(SUM(v) AS BIGINT) FROM $tbl")
          .head().getLong(0) == 30L)
        val stats = TableManifest.readStats(spark, dir)
        val live = TableManifest.read(spark, dir).get._2
        assert(live.forall(f => stats.get(f).exists(m =>
          m.contains("id") && m.contains("v"))),
          s"z-ordered files born prunable: $stats")
      } finally s.sql(s"DROP TABLE $tbl")
    }
  }

  test("declared partition schema: an emptied partitioned table keeps its columns and layout") {
    val dir = tmpDir("gm-partschema")
    TableManifest.publishPartitioned(
      Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("id", "s", "side"),
      dir, Seq("side"))
    assert(TableManifest.readPartitionSchema(spark, dir)
      .map(_.fieldNames.toSeq).contains(Seq("side")))
    // drop EVERY partition: no file is left to infer the layout from
    TableManifest.dropPartitions(spark, dir,
      Seq("side" -> TableManifest.PartitionPredicate.NotNull))
    assert(TableManifest.read(spark, dir).get._2.isEmpty)
    // ...but the declared schema still serves the partition column, on
    // the provider AND the library read path
    assert(spark.read.format("graft-manifest").load(dir)
      .columns.toSet == Set("id", "s", "side"))
    assert(TableManifest.readTable(spark, dir)
      .columns.toSet == Set("id", "s", "side"))
    // and the WRITE paths still know the layout: an append lands nested
    Seq((3L, "c", 2L)).toDF("id", "s", "side")
      .write.format("graft-manifest").mode("append").save(dir)
    val (_, names) = TableManifest.read(spark, dir).get
    assert(names.nonEmpty && names.forall(_.startsWith("side=2/")),
      s"append into an emptied partitioned table stays nested: $names")
    // RESTORE across layouts restates the declaration in both directions
    val vPartitioned = TableManifest.read(spark, dir).get._1
    TableManifest.publish(Seq((7L, "f", 9L)).toDF("id", "s", "side"), dir)
    assert(TableManifest.readPartitionSchema(spark, dir).isEmpty,
      "a flat publish clears the declaration (restore restated it)")
    TableManifest.restore(spark, dir, vPartitioned)
    assert(TableManifest.readPartitionSchema(spark, dir)
      .map(_.fieldNames.toSeq).contains(Seq("side")),
      "restoring the partitioned version restores its declaration")
  }
}
