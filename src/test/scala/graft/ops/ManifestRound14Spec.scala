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
