package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest

/** `INSERT INTO` / `INSERT OVERWRITE` a graft-manifest catalog table go
  * THROUGH the manifest commit protocol — not around it: the rows land in
  * a hidden scratch dir via Spark's stock parquet DSv2 writer, and only
  * the job-level commit moves the finalized files in and CAS-commits the
  * next manifest version (`sql-<tag>-pN.parquet`, linearized against any
  * concurrent committer). The pre-round-12 read-only facade rejected the
  * insert outright; now it is a first-class write with table-format
  * semantics: append merges the declared schema, overwrite is a snapshot
  * replace that preserves the streaming high-water mark and time travel
  * to the pre-overwrite version. */
class ManifestInsertProbeSpec extends SparkSpec {

  import spark.implicits._

  private def tracked(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gm-insert").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    dir
  }

  test("INSERT INTO commits the next manifest version with the new rows") {
    val dir = tracked()
    val before = TableManifest.readHead(spark, dir).get
    spark.sql("DROP TABLE IF EXISTS gmi_probe")
    spark.sql(s"CREATE TABLE gmi_probe USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      spark.sql("INSERT INTO gmi_probe VALUES (2, 'b'), (3, 'c')")
      val after = TableManifest.readHead(spark, dir).get
      assert(after._1 == before._1 + 1, "insert must commit exactly one version")
      val fresh = after._2.toSet -- before._2.toSet
      assert(fresh.nonEmpty && fresh.forall(_.startsWith("sql-")),
        s"inserted files must be protocol-named, got $fresh")
      // visible to the library read, the provider read, and the catalog
      assert(TableManifest.readTable(spark, dir).count() == 3L)
      assert(spark.sql("SELECT * FROM gmi_probe ORDER BY id")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // and no file was written outside the protocol
      val untracked = new java.io.File(dir).listFiles
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".") && !after._2.contains(f.getName))
      assert(untracked == 0, s"$untracked files written around the manifest")
    } finally spark.sql("DROP TABLE gmi_probe")
  }

  test("INSERT OVERWRITE snapshot-replaces, preserves hwm and time travel") {
    val dir = tracked()
    // a streaming hwm on the head: the overwrite must not erase it
    // (it records APPLIED epochs; an overwrite does not un-apply them)
    val (v0, files0) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files0, v0, hwm = Some(7L))
    val preV = TableManifest.read(spark, dir).get._1
    spark.sql("DROP TABLE IF EXISTS gmi_ow")
    spark.sql(s"CREATE TABLE gmi_ow USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      spark.sql("INSERT OVERWRITE gmi_ow VALUES (10, 'x'), (11, 'y')")
      val head = TableManifest.readHead(spark, dir).get
      assert(head._3 == Some(7L), "overwrite dropped the streaming hwm")
      assert(spark.sql("SELECT * FROM gmi_ow ORDER BY id")
        .as[(Long, String)].collect().toSeq == Seq((10L, "x"), (11L, "y")))
      // the pre-overwrite snapshot is still time-travelable (files kept
      // on disk for vacuum, manifest history intact)
      assert(spark.read.format("graft-manifest")
        .option("versionAsOf", preV).load(dir).count() == 1L)
    } finally spark.sql("DROP TABLE gmi_ow")
  }

  test("DataFrameWriter append/overwrite parity with the SQL statements") {
    val dir = tracked()
    Seq((2L, "b")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    assert(TableManifest.readTable(spark, dir).count() == 2L)
    Seq((9L, "z")).toDF("id", "s")
      .write.format("graft-manifest").mode("overwrite").save(dir)
    assert(TableManifest.readTable(spark, dir)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("INSERT INTO an untracked dir with data converts it in place") {
    val dir = java.nio.file.Files.createTempDirectory("gm-conv").toString
    Seq((1L, "pre")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    // no manifest yet: a commit listing only the new rows would shadow
    // the pre-existing ones for every manifest reader
    Seq((2L, "post")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    assert(TableManifest.read(spark, dir).isDefined, "dir was not converted")
    assert(TableManifest.readTable(spark, dir)
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "pre"), (2L, "post")))
    // no double-listing: every manifest file name appears once
    val files = TableManifest.readHead(spark, dir).get._2
    assert(files.distinct.size == files.size, s"double-listed: $files")
  }

  test("writes through a versionAsOf (time travel) read are rejected") {
    val dir = tracked()
    val e = intercept[Exception] {
      Seq((2L, "b")).toDF("id", "s").write.format("graft-manifest")
        .mode("append").option("versionAsOf", 1).save(dir)
    }
    assert(e.getMessage.contains("versionAsOf"),
      s"expected the time-travel write rejection, got: ${e.getMessage}")
    assert(TableManifest.readTable(spark, dir).count() == 1L)
  }

  test("a failing insert aborts without publishing or leaking files") {
    val dir = tracked()
    val before = TableManifest.readHead(spark, dir).get
    val poisoned = spark.range(4).repartition(4)
      .map { i =>
        if (i >= 0) throw new RuntimeException("poisoned row")
        (i, "x")
      }.toDF("id", "s")
    intercept[Exception] {
      poisoned.write.format("graft-manifest").mode("append").save(dir)
    }
    assert(TableManifest.readHead(spark, dir).get == before,
      "failed insert changed the manifest")
    val stray = new java.io.File(dir).listFiles
      .count(f => f.isFile && f.getName.startsWith("sql-"))
    assert(stray == 0, s"failed insert leaked $stray sql-* files")
    assert(TableManifest.readTable(spark, dir).count() == 1L)
  }

  test("concurrent INSERTs both land (CAS linearization, no lost update)") {
    val dir = tracked()
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val futures = (0 until 2).map { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await(10, TimeUnit.SECONDS)
          spark.sql(
            s"INSERT INTO gmi_race VALUES (${100 + i}, 'r$i')")
          ()
        }
      })
    }
    spark.sql("DROP TABLE IF EXISTS gmi_race")
    spark.sql(s"CREATE TABLE gmi_race USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      gate.countDown()
      futures.foreach(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(TableManifest.readTable(spark, dir).count() == 3L,
        "a concurrent insert was lost")
    } finally spark.sql("DROP TABLE gmi_race")
  }

  test("INSERT OVERWRITE with an empty query truncates to a readable empty table") {
    val dir = tracked()
    spark.sql("DROP TABLE IF EXISTS gmi_trunc")
    spark.sql(s"CREATE TABLE gmi_trunc USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      spark.sql("INSERT OVERWRITE gmi_trunc SELECT * FROM gmi_trunc WHERE id < 0")
      val head = TableManifest.readHead(spark, dir).get
      // Spark's writer creates task files eagerly, so an empty query may
      // still finalize 0-row part files — the snapshot must list ONLY
      // protocol-named files from this overwrite (the old data delisted)
      assert(head._2.forall(_.startsWith("sql-")),
        s"truncate left pre-overwrite files listed: ${head._2}")
      assert(spark.read.format("graft-manifest").load(dir).count() == 0L)
      assert(spark.sql("SELECT COUNT(*) FROM gmi_trunc").head().getLong(0) == 0L)
    } finally spark.sql("DROP TABLE gmi_trunc")
  }
}
