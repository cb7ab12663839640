package graft.streaming

import graft.SparkSpec
import graft.ops.{Compaction, TableManifest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once manifest append: batches land atomically as manifest
  * versions, checkpoint re-delivery never duplicates, and uncommitted
  * crash debris stays invisible to readers. */
class ManifestAppendSinkSpec extends SparkSpec {

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-mas").toString

  test("stream of micro-batches appends each batch exactly once, atomically versioned") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir()
    val mem = MemoryStream[Long]
    // AvailableNow would snapshot offsets before addData; poll instead
    val q = ManifestAppendSink.start(
      mem.toDF().toDF("v"), dir, tempDir() + "/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(4L, 5L)
      q.processAllAvailable()
      val vals = TableManifest.readTable(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(vals == Seq(1L, 2L, 3L, 4L, 5L), s"got $vals")
    } finally q.stop()
  }

  test("re-delivered batch id is skipped: appends are idempotent per batch") {
    import spark.implicits._
    val dir = tempDir()
    val b0 = Seq(10L, 11L).toDF("v")
    ManifestAppendSink.applyBatch(b0, 0L, dir)
    val headV = TableManifest.read(spark, dir).get._1
    // crash-after-commit: the checkpoint never advanced, batch 0 re-runs
    ManifestAppendSink.applyBatch(b0, 0L, dir)
    assert(TableManifest.read(spark, dir).get._1 == headV,
      "replay must not commit a new version")
    val vals = TableManifest.readTable(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(10L, 11L), s"replay duplicated rows: $vals")
    // the NEXT batch still lands
    ManifestAppendSink.applyBatch(Seq(12L).toDF("v"), 1L, dir)
    assert(TableManifest.readTable(spark, dir).count() == 3)
  }

  test("replay protection survives compaction renaming every batch file") {
    import spark.implicits._
    val dir = tempDir()
    val b0 = Seq(1L, 2L).toDF("v")
    val b1 = Seq(3L).toDF("v")
    ManifestAppendSink.applyBatch(b0, 0L, dir)
    ManifestAppendSink.applyBatch(b1, 1L, dir)
    // compaction rewrites the tiny batch files under compacted-* names —
    // no b<id>- names survive, so only the manifest hwm field protects us
    Compaction.compactInPlace(spark, dir, minFileBytes = 1L << 20)
    val files = TableManifest.read(spark, dir).get._2
    assert(!files.exists(_.startsWith("b")), s"precondition: renamed, got $files")
    assert(ManifestAppendSink.committedBatchHighWater(spark, dir) == 1L,
      "hwm must ride the manifest, not the file names")
    // the crash-replay of batch 1 after compaction must still be a no-op
    ManifestAppendSink.applyBatch(b1, 1L, dir)
    val vals = TableManifest.readTable(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(1L, 2L, 3L), s"replay after compaction duplicated: $vals")
  }

  test("append landing mid-maintenance is not lost: CAS retry preserves both") {
    import spark.implicits._
    val dir = tempDir()
    ManifestAppendSink.applyBatch(Seq(1L).toDF("v"), 0L, dir)
    // maintenance commits a new version AFTER the sink would have read the
    // head: simulate by publishing a replacement snapshot, then appending —
    // the append's CAS sees the fresh head and keeps the published files
    TableManifest.publish(Seq(10L, 11L).toDF("v"), dir)
    ManifestAppendSink.applyBatch(Seq(2L).toDF("v"), 1L, dir)
    val vals = TableManifest.readTable(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(2L, 10L, 11L), s"append must compose with publish: $vals")
    assert(ManifestAppendSink.committedBatchHighWater(spark, dir) == 1L)
  }

  test("vacuum reclaims crashed inflight scratch dirs") {
    import spark.implicits._
    val dir = tempDir()
    ManifestAppendSink.applyBatch(Seq(1L).toDF("v"), 0L, dir)
    Seq(9L).toDF("v").write.parquet(dir + "/.inflight-b1-crashed")
    val deleted = TableManifest.vacuum(spark, dir)
    assert(deleted.contains(".inflight-b1-crashed"),
      s"vacuum must reclaim crash scratch, deleted: $deleted")
    assert(TableManifest.readTable(spark, dir).count() == 1L)
  }

  test("vacuum never reclaims a moved-in batch whose commit has not landed " +
    "(id above hwm), and reclaims it once a replay commits") {
    import spark.implicits._
    val dir = tempDir()
    ManifestAppendSink.applyBatch(Seq(1L, 2L).toDF("v").coalesce(1), 0L, dir)
    // simulate the mid-append window: batch 7's file moved in under its
    // final name, manifest commit NOT yet landed
    val inflight = new java.io.File(dir, "b7-deadbeef-p0.parquet")
    // vacuum's decision uses only names/mtimes/manifests — placeholder
    // bytes suffice to stand in for the moved-in parquet file
    java.nio.file.Files.writeString(inflight.toPath, "placeholder-bytes")
    // even an aggressive grace-0 vacuum must keep it: id 7 > hwm 0
    val gone = TableManifest.vacuum(spark, dir, graceMillis = 0L)
    assert(!gone.contains(inflight.getName),
      s"in-flight append reclaimed: $gone")
    assert(inflight.isFile, "in-flight append file must survive vacuum")
    // once a commit covers batch 7 (the replay path), the orphaned twin
    // becomes ordinary dead debris and is reclaimed
    ManifestAppendSink.applyBatch(Seq(7L).toDF("v").coalesce(1), 7L, dir)
    val gone2 = TableManifest.vacuum(spark, dir, graceMillis = 0L)
    assert(gone2.contains(inflight.getName),
      s"covered orphan must be reclaimed: $gone2")
    assert(TableManifest.readTable(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 7L))
  }

  test("crash before commit leaves debris invisible to readers") {
    import spark.implicits._
    val dir = tempDir()
    ManifestAppendSink.applyBatch(Seq(1L).toDF("v"), 0L, dir)
    // simulate a crash mid-applyBatch: data files moved in, no commit
    Seq(99L).toDF("v").write.parquet(dir + "/.inflight-b1-crashed")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(dir + "/.inflight-b1-crashed"))
      .find(s => s.getPath.getName.startsWith("part-")).get.getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(p, "b1-crashed-p0.parquet"))
    val vals = TableManifest.readTable(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(1L), s"uncommitted batch-1 file must stay invisible: $vals")
    // the re-run of batch 1 (fresh uuid) commits exactly one copy
    ManifestAppendSink.applyBatch(Seq(99L).toDF("v"), 1L, dir)
    val after = TableManifest.readTable(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == Seq(1L, 99L), s"got $after")
  }
}
