package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class UpsertSinkSpec extends SparkSpec {

  private def readTarget(dir: String) =
    spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("change stream merges into the parquet target across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val target = s"$base/table"
    val mem = MemoryStream[(Long, Long, String)]

    // batch 1: three inserts, one key updated twice in the same batch —
    // last writer (ver 3) must win row-consistently
    mem.addData((1L, 1L, "a1"), (2L, 1L, "b1"), (1L, 3L, "a3"), (3L, 1L, "c1"))
    val q1 = UpsertSink.start(
      mem.toDF().toDF("id", "ver", "v"), target, Seq("id"), "ver",
      s"$base/ckpt", Trigger.AvailableNow())
    q1.awaitTermination()
    assert(readTarget(target) == Map(
      1L -> (3L, "a3"), 2L -> (1L, "b1"), 3L -> (1L, "c1")))

    // batch 2 (same checkpoint — resumes): update key 2, insert key 9
    mem.addData((2L, 5L, "b5"), (9L, 1L, "z1"))
    val q2 = UpsertSink.start(
      mem.toDF().toDF("id", "ver", "v"), target, Seq("id"), "ver",
      s"$base/ckpt", Trigger.AvailableNow())
    q2.awaitTermination()
    assert(readTarget(target) == Map(
      1L -> (3L, "a3"), 2L -> (5L, "b5"), 3L -> (1L, "c1"), 9L -> (1L, "z1")))
  }

  test("CDC end-to-end: graft-log change stream → parse → upsert, resuming across restarts") {
    import org.apache.spark.sql.functions._
    val log = java.nio.file.Files.createTempDirectory("graft-cdc-log").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val target =
      java.nio.file.Files.createTempDirectory("graft-cdc-out").toString + "/table"
    def runOnce(): Unit = {
      val updates = spark.readStream.format("graft-log").load(log)
        .select(from_json(col("value").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id LONG, ver LONG, v STRING")).as("j"))
        .select("j.id", "j.ver", "j.v")
      UpsertSink.start(updates, target, Seq("id"), "ver", ckpt,
        Trigger.AvailableNow()).awaitTermination()
    }
    graft.sources.FileLog.appendStrings(log, Seq(
      """{"id":1,"ver":1,"v":"a1"}""", """{"id":2,"ver":1,"v":"b1"}"""),
      tsMicros = 1L)
    runOnce()
    assert(readTarget(target) == Map(1L -> (1L, "a1"), 2L -> (1L, "b1")))
    // new segment after the first run: the restarted query must process
    // ONLY the new offsets (checkpoint resume) and merge them in
    graft.sources.FileLog.appendStrings(log, Seq(
      """{"id":1,"ver":2,"v":"a2"}""", """{"id":9,"ver":1,"v":"z1"}"""),
      tsMicros = 2L)
    runOnce()
    assert(readTarget(target) == Map(
      1L -> (2L, "a2"), 2L -> (1L, "b1"), 9L -> (1L, "z1")))
  }

  test("re-applying the same batch is idempotent (crash-replay safety)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert2").toString
    val target = s"$base/table"
    val batch = Seq((1L, 1L, "a"), (2L, 2L, "b")).toDF("id", "ver", "v")
    UpsertSink.applyBatch(batch, 0L, target, Seq("id"), "ver")
    val first = readTarget(target)
    UpsertSink.applyBatch(batch, 0L, target, Seq("id"), "ver") // replay
    assert(readTarget(target) == first)
    assert(first == Map(1L -> (1L, "a"), 2L -> (2L, "b")))
  }

  test("replay after a crash between delete and rename keeps prior rows") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft-upsert3").toString
    val target = s"$base/table"
    UpsertSink.applyBatch(
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "ver", "v"),
      0L, target, Seq("id"), "ver")
    // batch 1 merges, writes its scratch snapshot, deletes the target —
    // and dies before the rename. Simulate that exact on-disk state: the
    // merged snapshot sits ONLY in the scratch dir.
    val batch1 = Seq((2L, 2L, "b2"), (3L, 1L, "c")).toDF("id", "ver", "v")
    val fs = new Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged = graft.ops.Merge.upsert(
      spark.read.parquet(target),
      graft.ops.Merge.dedupLatest(batch1, Seq("id"), "ver"), Seq("id"))
    val scratch = new Path(s"$target.__batch1")
    merged.write.mode("overwrite").parquet(scratch.toString)
    // the real sequence marks the scratch complete before touching the
    // target — recovery keys on that marker, not on _SUCCESS (committers
    // can be configured markerless) nor on the target's existence
    fs.create(new Path(scratch, "_GRAFT_COMPLETE"), true).close()
    fs.delete(new Path(target), true)
    // checkpoint never committed batch 1 → the stream replays it
    UpsertSink.applyBatch(batch1, 1L, target, Seq("id"), "ver")
    // id=1 arrived only in batch 0; without the recovery rename the
    // replay overwrites the sole surviving snapshot with batch 1 alone
    // and id=1 is silently erased
    assert(readTarget(target) == Map(
      1L -> (1L, "a"), 2L -> (2L, "b2"), 3L -> (1L, "c")))
  }

  test("replay after a crash MIDWAY through the target delete recovers from the marked scratch") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft-upsert4").toString
    val target = s"$base/table"
    UpsertSink.applyBatch(
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "ver", "v"),
      0L, target, Seq("id"), "ver")
    val fs = new Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // batch 1 writes + marks its scratch, then dies midway through the
    // NON-ATOMIC recursive delete of the target: some data files are gone
    // but the dir still exists. An `fs.exists(target)` recovery guard
    // would skip the swap and merge against this truncated snapshot.
    val batch1 = Seq((2L, 2L, "b2"), (3L, 1L, "c")).toDF("id", "ver", "v")
    val merged = graft.ops.Merge.upsert(
      spark.read.parquet(target),
      graft.ops.Merge.dedupLatest(batch1, Seq("id"), "ver"), Seq("id"))
    val scratch = new Path(s"$target.__batch1")
    merged.write.mode("overwrite").parquet(scratch.toString)
    fs.create(new Path(scratch, "_GRAFT_COMPLETE"), true).close()
    val dataFiles = fs.listStatus(new Path(target))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach(f => fs.delete(f.getPath, false)) // partial delete
    UpsertSink.applyBatch(batch1, 1L, target, Seq("id"), "ver")
    assert(readTarget(target) == Map(
      1L -> (1L, "a"), 2L -> (2L, "b2"), 3L -> (1L, "c")))
  }

  test("an UNMARKED scratch (crash mid-write) is discarded; the intact target wins") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft-upsert5").toString
    val target = s"$base/table"
    UpsertSink.applyBatch(
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "ver", "v"),
      0L, target, Seq("id"), "ver")
    // batch 1 died mid-write: a garbage scratch with no completion marker
    // (its _SUCCESS may even be present on a committer that writes it
    // early — only OUR marker, written strictly after the write, decides).
    // The swap never started, so the target is intact and authoritative.
    val fs = new Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = new Path(s"$target.__batch1")
    Seq((99L, 9L, "junk")).toDF("id", "ver", "v")
      .write.mode("overwrite").parquet(scratch.toString)
    fs.delete(new Path(scratch, "_GRAFT_COMPLETE"), false)
    val batch1 = Seq((3L, 1L, "c")).toDF("id", "ver", "v")
    UpsertSink.applyBatch(batch1, 1L, target, Seq("id"), "ver")
    assert(readTarget(target) == Map(
      1L -> (1L, "a"), 2L -> (1L, "b"), 3L -> (1L, "c")))
  }
}
