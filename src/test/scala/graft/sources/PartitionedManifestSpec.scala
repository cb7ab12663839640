package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Hive-partitioned layouts through the manifest protocol: [[graft.ops
  * .TableManifest.init]] sweeps `k=v/` subdirectories into dir-relative
  * manifest names, and [[ManifestFileIndex]] infers the partition spec
  * from those names alone — so the provider serves the partition COLUMN
  * (no footer holds it) and prunes partitions with the same zero-FS-call
  * planning as a flat table. Appends re-lay the batch out under its
  * `k=v/` directories, and the copy-on-write rewrites (UPDATE / ERASE /
  * MERGE) read victims with basePath pinned and write them back UNDER
  * their partitions via partitionBy — rows can never lose their
  * name-carried values. */
class PartitionedManifestSpec extends SparkSpec {

  import spark.implicits._

  /** Partitioned fixture: 9 rows over bucket ∈ {0,1,2}, one file per
    * bucket dir. */
  private def newTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gm-part").toString
    (1L to 9L).map(i => (i, s"r$i", i % 3))
      .toDF("id", "s", "bucket")
      .repartition(1)
      .write.partitionBy("bucket").mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    dir
  }

  /** Leaf data files a plan actually scans (AQE-transparent). */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect() // force planning (and AQE finalization if any)
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case _ => p +: p.children.flatMap(leaves)
    }
    leaves(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b }
      .flatMap(_.inputRDD.partitions.map(_.asInstanceOf[org.apache.spark.sql
        .execution.datasources.v2.DataSourceRDDPartition]))
      .flatMap(_.inputPartitions)
      .collect { case fp: FilePartition => fp.files.toSeq }
      .flatten.map(_.urlEncodedPath)
  }

  test("init sweeps the hive layout; the provider serves the partition column from the names") {
    val dir = newTable()
    val (_, names) = TableManifest.read(spark, dir).get
    assert(names.size == 3 && names.forall(_.startsWith("bucket=")),
      s"dir-relative partitioned names: $names")
    val df = spark.read.format("graft-manifest").load(dir)
    assert(df.columns.toSet == Set("id", "s", "bucket"),
      s"partition column served: ${df.columns.toSeq}")
    val got = df.select("id", "bucket").as[(Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got == (1L to 9L).map(i => (i, i % 3)),
      s"partition values decoded from the names: $got")
    // the library read path serves the same shape
    assert(TableManifest.readTable(spark, dir).columns.toSet ==
      Set("id", "s", "bucket"))
  }

  test("partition pruning: a bucket filter scans exactly that bucket's file") {
    val dir = newTable()
    val all = scannedFiles(spark.read.format("graft-manifest").load(dir))
    assert(all.size == 3, s"unfiltered scan reads all three: $all")
    val pruned = scannedFiles(
      spark.read.format("graft-manifest").load(dir)
        .filter(org.apache.spark.sql.functions.col("bucket") === 1))
    assert(pruned.size == 1 && pruned.head.contains("bucket=1"),
      s"partition-pruned to the one matching file: $pruned")
  }

  test("streaming read of a partitioned table serves partition columns per delta") {
    val dir = newTable()
    val ckpt = java.nio.file.Files.createTempDirectory("gm-part-ck").toString
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= b.select("id", "bucket").as[(Long, Long)].collect()
        }
        ()
      }
      .start()
    q.awaitTermination()
    assert(seen.toSeq.sorted == (1L to 9L).map(i => (i, i % 3)),
      s"streamed rows carry their partition values: ${seen.toSeq.sorted}")
  }

  test("appends into a partitioned table land under their k=v directories") {
    val dir = newTable()
    // provider append (the SQL INSERT commit path): the batch is re-laid
    // out k=v/-nested before the move-in, so the rows keep their
    // partition values and the listing stays single-layout
    Seq((99L, "x", 0L), (100L, "y", 7L)).toDF("id", "s", "bucket")
      .write.format("graft-manifest").mode("append").save(dir)
    val (_, names1) = TableManifest.read(spark, dir).get
    assert(names1.forall(_.startsWith("bucket=")),
      s"appended files carry the partition chain: $names1")
    assert(names1.exists(n => n.startsWith("bucket=7/") &&
      n.substring(n.indexOf('/') + 1).startsWith("sql-")),
      s"a NEW partition directory is minted for a new value: $names1")
    val df = spark.read.format("graft-manifest").load(dir)
    assert(df.count() == 11L)
    assert(df.filter(org.apache.spark.sql.functions.col("bucket") === 7)
      .select("id").as[Long].collect().toSeq == Seq(100L),
      "appended rows read back with their name-carried partition value")
    // streaming append (hwm protocol path) re-lays out the same way,
    // with the b<batchId>- stamp kept on the nested BASENAME so replay
    // detection and vacuum's in-flight floor work unchanged
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((101L, "z", 1L)).toDF("id", "s", "bucket"), 1L, dir)
    val (_, names2) = TableManifest.read(spark, dir).get
    assert(names2.exists(n => n.startsWith("bucket=1/") &&
      n.substring(n.indexOf('/') + 1).startsWith("b1-")),
      s"batch-stamped nested basename: $names2")
    // replayed batch is a no-op (hwm covers it)
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((101L, "z", 1L)).toDF("id", "s", "bucket"), 1L, dir)
    assert(TableManifest.readTable(spark, dir).count() == 12L)
    // a batch MISSING the partition column: Spark's byName append fills
    // the nullable column with NULL, and the row lands in the hive
    // default partition — the SQL NULL-partition semantics (readable as
    // NULL; eq/range drops never match it, IS NOT NULL does)
    Seq((102L, "q")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    val nulls = spark.read.format("graft-manifest").load(dir)
      .filter(org.apache.spark.sql.functions.col("bucket").isNull)
      .select("id").as[Long].collect().toSeq
    assert(nulls == Seq(102L), s"NULL-partition row readable: $nulls")
    assert(TableManifest.read(spark, dir).get._2
      .exists(_.startsWith("bucket=__HIVE_DEFAULT_PARTITION__/")),
      "missing partition value lands in the hive default partition")
    // INSERT OVERWRITE (snapshot replace) stays partitioned too
    Seq((1L, "y", 1L)).toDF("id", "s", "bucket")
      .write.format("graft-manifest").mode("overwrite").save(dir)
    val (_, names3) = TableManifest.read(spark, dir).get
    assert(names3.nonEmpty && names3.forall(_.startsWith("bucket=1/")),
      s"overwrite kept the hive layout: $names3")
    val got = spark.read.format("graft-manifest").load(dir)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "y", 1L)), s"overwrite replaced the snapshot: $got")
  }

  test("DELETE: partition-column drops stay metadata-only; data-column deletes copy-on-write per leaf") {
    val dir = newTable()
    val before = TableManifest.read(spark, dir).get
    val tbl = s"gpart_del_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE bucket = 1")
      val (v1, names1) = TableManifest.read(spark, dir).get
      assert(v1 == before._1 + 1, "one metadata commit")
      assert(names1.toSet == before._2.filterNot(_.startsWith("bucket=1")).toSet,
        s"exactly the bucket=1 file delisted: $names1")
      assert(spark.read.format("graft-manifest").load(dir)
        .filter(org.apache.spark.sql.functions.col("bucket") === 1).count() == 0L)
      assert(TableManifest.readTable(spark, dir).count() == 6L,
        "other buckets' rows untouched")
      // the dropped partition stays time-travelable
      assert(TableManifest.readTableAt(spark, dir, before._1).count() == 9L)
      // a condition on a DATA column is a partition-aware copy-on-write:
      // the victim file rewrites back UNDER its k=v directory, every
      // surviving row keeps its name-carried partition value
      spark.sql(s"DELETE FROM $tbl WHERE id = 2") // bucket=2's file
      assert(TableManifest.readTable(spark, dir).count() == 5L)
      val (_, namesAfter) = TableManifest.read(spark, dir).get
      assert(namesAfter.forall(_.startsWith("bucket=")),
        s"rewritten file back under its partition: $namesAfter")
      assert(spark.read.format("graft-manifest").load(dir)
        .filter(org.apache.spark.sql.functions.col("bucket") === 2)
        .select("id").as[Long].collect().toSeq.sorted == Seq(5L, 8L),
        "partition values survive the rewrite")
      // mixed partition+data conjunctions stay rejected at planning
      val e = intercept[Exception] {
        spark.sql(s"DELETE FROM $tbl WHERE bucket = 0 AND id = 3")
      }
      assert(e.getMessage != null)
      assert(TableManifest.readTable(spark, dir).count() == 5L,
        "the rejected delete touched nothing")
      // IN-set drop
      spark.sql(s"DELETE FROM $tbl WHERE bucket IN (0, 2)")
      assert(TableManifest.readTable(spark, dir).count() == 0L)
      // ...and the emptied table still DECLARES its layout: partition
      // columns stay served (the persisted partition schema)
      assert(spark.read.format("graft-manifest").load(dir)
        .columns.toSet == Set("id", "s", "bucket"),
        "an emptied partitioned table keeps serving its partition columns")
      // vacuum reclaims the delisted nested files and prunes the emptied
      // partition dirs (time travel to the pre-drop versions is gone —
      // the documented trade)
      val deleted = TableManifest.vacuum(spark, dir)
      assert(deleted.count(_.contains("/")) >= 3, s"deleted: $deleted")
      val husks = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      assert(husks.isEmpty, s"emptied partition dirs pruned: ${husks.toSeq}")
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("publishPartitioned creates and re-snapshots a partitioned tracked table") {
    import org.apache.spark.sql.functions.{col => c}
    val dir = java.nio.file.Files.createTempDirectory("gm-part-pub").toString
    val v1 = TableManifest.publishPartitioned(
      (1L to 6L).map(i => (i, i % 2)).toDF("id", "side"), dir, Seq("side"))
    assert(v1 == 1L)
    val (_, names1) = TableManifest.read(spark, dir).get
    assert(names1.forall(_.startsWith("side=")), s"partitioned names: $names1")
    // data schema carried WITHOUT the partition column; reads append it
    assert(TableManifest.readSchema(spark, dir).get.fieldNames.toSeq == Seq("id"))
    val df = spark.read.format("graft-manifest").load(dir)
    assert(df.columns.toSet == Set("id", "side"))
    assert(df.filter(c("side") === 1).select("id").as[Long]
      .collect().toSeq.sorted == Seq(1L, 3L, 5L))
    // re-publish replaces the snapshot; the old one stays time-travelable
    val v2 = TableManifest.publishPartitioned(
      Seq((9L, 0L)).toDF("id", "side"), dir, Seq("side"))
    assert(v2 == 2L)
    assert(TableManifest.readTable(spark, dir).select("id").as[Long]
      .collect().toSeq == Seq(9L))
    assert(TableManifest.readTableAt(spark, dir, 1L).count() == 6L)
    // drop + vacuum complete the lifecycle on a published layout too
    TableManifest.dropPartitions(spark, dir,
      Seq("side" -> TableManifest.PartitionPredicate.In(Seq(0L))))
    assert(TableManifest.readTable(spark, dir).count() == 0L)
    val deleted = TableManifest.vacuum(spark, dir)
    assert(deleted.count(_.contains("/")) >= 4, s"deleted: $deleted")
  }

  test("OPTIMIZE PARTITION compacts one partition's fragments in place, others byte-identical") {
    import org.apache.spark.sql.functions.{col => c}
    val dir = java.nio.file.Files.createTempDirectory("gm-part-opt").toString
    // 4 fragments per bucket (repartition(4) spreads each key range)
    TableManifest.publishPartitioned(
      (1L to 40L).map(i => (i, i % 2)).toDF("id", "side").repartition(4),
      dir, Seq("side"))
    val before = TableManifest.read(spark, dir).get._2
    assert(before.count(_.startsWith("side=0/")) == 4, s"fixture: $before")
    graft.TestSessions.withExtensionsActive { s =>
      val tbl = s"gpart_opt_${java.util.UUID.randomUUID().toString.take(8)}"
      s.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      try {
        // the partition-scoped form compacts exactly side=0
        // (spec spelled with spaces, normalized to the directory form)
        val opt = s.sql(s"OPTIMIZE $tbl PARTITION (side = 0)").head()
        assert(opt.getLong(0) == 4L && opt.getLong(1) == 1L, s"stats: $opt")
        val mid = TableManifest.read(spark, dir).get._2
        assert(mid.count(_.startsWith("side=0/")) == 1, s"compacted: $mid")
        assert(mid.filter(_.startsWith("side=1/")).toSet ==
          before.filter(_.startsWith("side=1/")).toSet,
          "the other partition is byte-identical (same names)")
        // whole-table OPTIMIZE iterates the leaves (one CAS splice per
        // leaf): side=1's 4 fragments compact, the already-compact
        // side=0 leaf is a no-op
        val whole = s.sql(s"OPTIMIZE $tbl").head()
        assert(whole.getLong(0) == 5L && whole.getLong(1) == 2L,
          s"whole-table stats (side=0 no-op + side=1 4->1): $whole")
        // a partition that does not exist is LOUD, never a silent no-op
        val e2 = intercept[Exception] {
          s.sql(s"OPTIMIZE $tbl PARTITION (side=9)")
        }
        assert(e2.getMessage.contains("no files under partition"),
          e2.getMessage)
      } finally s.sql(s"DROP TABLE $tbl")
    }
    val after = TableManifest.read(spark, dir).get._2
    assert(after.count(_.startsWith("side=0/")) == 1 &&
      after.count(_.startsWith("side=1/")) == 1, s"compacted: $after")
    // contents and partition values survive the rewrite
    val got = spark.read.format("graft-manifest").load(dir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == (1L to 40L).map(i => (i, i % 2)).sorted, s"rows: ${got.size}")
  }

  test("SHOW PARTITIONS serves the live partitions from the head manifest") {
    val dir = newTable()
    graft.TestSessions.withExtensionsActive { s =>
      val tbl = s"gpart_show_${java.util.UUID.randomUUID().toString.take(8)}"
      s.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      try {
        assert(s.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0))
          .toSeq == Seq("bucket=0", "bucket=1", "bucket=2"))
        // the PARTITION (…) filter narrows the listing (hive-escaped,
        // case-insensitive keys — Spark's own semantics)
        assert(s.sql(s"SHOW PARTITIONS $tbl PARTITION (bucket=2)")
          .collect().map(_.getString(0)).toSeq == Seq("bucket=2"))
        assert(s.sql(s"SHOW PARTITIONS $tbl PARTITION (BUCKET='9')")
          .collect().isEmpty, "no match filters to empty, never errors")
        s.sql(s"DELETE FROM $tbl WHERE bucket = 1")
        assert(s.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0))
          .toSeq == Seq("bucket=0", "bucket=2"),
          "a dropped partition vanishes from the listing")
        // a flat table lists no partitions; non-graft tables keep Spark's
        // own behavior (its parser error names the real problem)
        val e = intercept[Exception] { s.sql("SHOW PARTITIONS gpart_nosuch") }
        assert(!e.getMessage.contains("graft"), e.getMessage)
      } finally s.sql(s"DROP TABLE $tbl")
    }
  }

  test("range drops: date retention works in epoch-day units; unparseable segments reject ranges") {
    import org.apache.spark.sql.functions.{col => c, to_date}
    // date-partitioned fixture: 3 days, one file each
    val dir = java.nio.file.Files.createTempDirectory("gm-part-date").toString
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "ds").select(c("id"), to_date(c("ds")).as("d"))
      .repartition(1).write.partitionBy("d").mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val tbl = s"gpart_rng_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      val v0 = TableManifest.read(spark, dir).get._1
      spark.sql(s"DELETE FROM $tbl WHERE d < DATE '2024-01-03'")
      assert(TableManifest.read(spark, dir).get._1 == v0 + 1,
        "one metadata commit expired both old days")
      assert(TableManifest.readTable(spark, dir)
        .select("id").as[Long].collect().toSeq == Seq(3L))
      // a single-day EQUALITY drop works too (epoch-day compare, not text)
      spark.sql(s"DELETE FROM $tbl WHERE d = DATE '2024-01-03'")
      assert(TableManifest.readTable(spark, dir).count() == 0L)
    } finally spark.sql(s"DROP TABLE $tbl")

    // STRING-partitioned table: eq drops fine, but a numeric range over
    // unparseable segments must be rejected at planning (under-deleting
    // silently is the failure mode the parseability check exists for)
    val dir2 = java.nio.file.Files.createTempDirectory("gm-part-str").toString
    Seq((1L, "eu"), (2L, "us")).toDF("id", "region")
      .repartition(1).write.partitionBy("region").mode("overwrite").parquet(dir2)
    TableManifest.init(spark, dir2)
    val tbl2 = s"gpart_str_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE $tbl2 USING `graft-manifest` OPTIONS (path '$dir2')")
    try {
      intercept[Exception] {
        spark.sql(s"DELETE FROM $tbl2 WHERE region < 'f'")
      }
      assert(TableManifest.readTable(spark, dir2).count() == 2L,
        "rejected range touched nothing")
      spark.sql(s"DELETE FROM $tbl2 WHERE region = 'eu'")
      assert(TableManifest.readTable(spark, dir2)
        .select("id").as[Long].collect().toSeq == Seq(2L))
    } finally spark.sql(s"DROP TABLE $tbl2")
  }

  test("compactPartition refuses a non-leaf spec on multi-level layouts") {
    val dir = java.nio.file.Files.createTempDirectory("gm-part-deep").toString
    TableManifest.publishPartitioned(
      (1L to 8L).map(i => (i, i % 2, i % 2)).toDF("id", "a", "b"),
      dir, Seq("a", "b"))
    // compacting the a=1 PREFIX would read b-level files without their
    // name-carried b values and rewrite them one level up — refused
    val e = intercept[Exception] {
      graft.ops.Compaction.compactPartition(spark, dir, "a=1",
        targetBytes = 1L << 20, minFileBytes = 1L << 20)
    }
    assert(e.getMessage.contains("not a leaf partition"), e.getMessage)
    // the full leaf spec works
    val stats = graft.ops.Compaction.compactPartition(spark, dir, "a=1/b=1",
      targetBytes = 1L << 20, minFileBytes = 1L << 20)
    assert(stats.bytesRewritten >= 0L)
    assert(TableManifest.readTable(spark, dir).count() == 8L)
  }

  test("Maintenance.run compacts per leaf partition; vacuum never touches user subdirs") {
    val dir = java.nio.file.Files.createTempDirectory("gm-part-maint").toString
    TableManifest.publishPartitioned(
      (1L to 40L).map(i => (i, i % 2)).toDF("id", "side").repartition(4),
      dir, Seq("side"))
    // a user subdir the protocol never wrote, holding non-hive data
    val userDir = new java.io.File(dir, "backup")
    assert(userDir.mkdir())
    Seq(99L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/backup/snapshot")
    val report = graft.ops.Maintenance.run(spark, dir,
      targetBytes = 1L << 20, minFileBytes = 1L << 20, graceMillis = 0L)
    assert(report.compaction.filesBefore == 8 &&
      report.compaction.filesAfter == 2, s"per-leaf compaction: $report")
    assert(TableManifest.readTable(spark, dir).count() == 40L)
    // the user subdir survived the partition-aware vacuum untouched
    assert(spark.read.parquet(s"$dir/backup/snapshot").count() == 1L,
      "vacuum must never reclaim non-hive user subdirectories")
  }

  test("copy-on-write rewrites are partition-aware: rows keep their name-carried values") {
    import org.apache.spark.sql.functions.{col => c, lit}
    val dir = newTable() // ids 1..9, bucket = id % 3, one file per bucket
    // UPDATE on a data column: victims rewrite back under their k=v dirs
    TableManifest.updateWhere(spark, dir,
      Seq("s" -> org.apache.spark.sql.functions.concat(lit("u"), c("id"))),
      Some(c("id") <= 3))
    val afterUpdate = spark.read.format("graft-manifest").load(dir)
      .select("id", "s", "bucket").as[(Long, String, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(afterUpdate == (1L to 9L).map(i =>
      (i, if (i <= 3) s"u$i" else s"r$i", i % 3)),
      s"update preserved partition values: $afterUpdate")
    // a condition ON the partition column resolves (basePath read)...
    TableManifest.updateWhere(spark, dir,
      Seq("s" -> lit("b0")), Some(c("bucket") === 0))
    assert(spark.read.format("graft-manifest").load(dir)
      .filter(c("bucket") === 0).select("s").distinct()
      .as[String].collect().toSeq == Seq("b0"))
    // ...but SETting it is refused (rows would move between partitions)
    val e = intercept[Exception] {
      TableManifest.updateWhere(spark, dir, Seq("bucket" -> lit(5L)), None)
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // ERASE on a data column: survivors keep their partition
    TableManifest.eraseWhereEq(spark, dir, "id", Seq(4L))
    assert(spark.read.format("graft-manifest").load(dir)
      .filter(c("bucket") === 1).select("id").as[Long]
      .collect().toSeq.sorted == Seq(1L, 7L))
    // MERGE: matched rows replace in place, inserts land in their
    // partitions (incl. a brand-new one)
    val src = Seq((1L, "m1", 1L), (50L, "new", 9L))
      .toDF("id", "s", "bucket")
    TableManifest.mergeByKey(spark, dir, "id", src)
    val got = spark.read.format("graft-manifest").load(dir)
      .select("id", "s", "bucket").as[(Long, String, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got.contains((1L, "m1", 1L)) && got.contains((50L, "new", 9L)),
      s"merge updated and inserted into partitions: $got")
    assert(got.size == 9, s"9 - erased(4) + inserted(50): $got")
    val (_, names) = TableManifest.read(spark, dir).get
    assert(names.forall(_.startsWith("bucket=")), s"single layout: $names")
    assert(names.exists(_.startsWith("bucket=9/")), "new partition minted")
    // whole-table compactInPlace still refuses (OPTIMIZE iterates leaves)
    val e2 = intercept[Exception] {
      graft.ops.Compaction.compactInPlace(spark, dir,
        targetBytes = 1L << 20, minFileBytes = 1L << 20)
    }
    assert(e2.getMessage.contains("hive-partitioned"), e2.getMessage)
  }
}
