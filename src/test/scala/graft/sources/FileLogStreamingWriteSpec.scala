package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** `writeStream.format("graft-log")` — the streaming producer half of the
  * DSv2 transport: per-epoch two-phase commit, exactly-once over epoch
  * replay via the tagged-rename commit record (the adopted segment's name
  * carries `-q<queryId>-e<epochId>`; a replayed commit finds its tag). */
class FileLogStreamingWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def readBack(dir: String): Seq[String] =
    spark.read.format("graft-log").load(dir)
      .select(col("value").cast("string")).as[String].collect().toSeq.sorted

  test("streaming write lands each micro-batch exactly once and resumes") {
    val dir = tmpDir("slog")
    val ckpt = tmpDir("slog-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    in.addData("a", "b", "c")
    def run(): Unit = {
      val q = in.toDF().select(col("value").cast("binary").as("value"))
        .writeStream.format("graft-log")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dir)
      q.awaitTermination(30000)
    }
    run()
    assert(readBack(dir) === Seq("a", "b", "c"))

    // restart on the same checkpoint with no new data: nothing re-appends
    run()
    assert(readBack(dir) === Seq("a", "b", "c"))

    // new data after restart appends only the delta
    in.addData("d")
    run()
    assert(readBack(dir) === Seq("a", "b", "c", "d"))
  }

  test("a replayed epoch commit is a no-op (temp deleted, no new segment)") {
    val dir = tmpDir("slog-replay")
    val schema = StructType(Seq(StructField("value", BinaryType)))
    val w = new FileLogStreamingWrite(dir, schema, queryId = "q-test")

    def tempWithRecords(values: String*): FileLogTaskCommit = {
      val writer = new FileLogDataWriter(dir, schema, partitionId = 0)
      values.foreach { v =>
        writer.write(org.apache.spark.sql.catalyst.InternalRow(
          v.getBytes("UTF-8")))
      }
      writer.commit().asInstanceOf[FileLogTaskCommit]
    }

    w.commit(0L, Array(tempWithRecords("x", "y")))
    assert(readBack(dir) === Seq("x", "y"))

    // the sink died after commit, the epoch re-executes: same epochId,
    // fresh temp files — must not double-append
    val replay = tempWithRecords("x", "y")
    w.commit(0L, Array(replay))
    assert(readBack(dir) === Seq("x", "y"))
    assert(!new java.io.File(replay.tmpPath).exists(), "replay temp must be deleted")

    // the next epoch still appends
    w.commit(1L, Array(tempWithRecords("z")))
    assert(readBack(dir) === Seq("x", "y", "z"))

    // no staged leftovers survive a successful commit sequence
    assert(new java.io.File(dir).listFiles()
      .forall(f => !f.getName.startsWith(".stage-")))
  }

  test("a log written by the marker-based build does not double-append on upgrade replay") {
    val dir = tmpDir("slog-legacy")
    val schema = StructType(Seq(StructField("value", BinaryType)))

    def temp(values: String*): FileLogTaskCommit = {
      val writer = new FileLogDataWriter(dir, schema, partitionId = 0)
      values.foreach(v => writer.write(
        org.apache.spark.sql.catalyst.InternalRow(v.getBytes("UTF-8"))))
      writer.commit().asInstanceOf[FileLogTaskCommit]
    }

    // old-build state: epoch 0 adopted as an UNTAGGED segment, high-water
    // recorded in the legacy marker file, crash before checkpoint advance
    val old = temp("x", "y")
    FileLog.adopt(dir, new java.io.File(old.tmpPath), 2)
    java.nio.file.Files.write(
      new java.io.File(dir, ".epoch-q-legacy").toPath, "0".getBytes("UTF-8"))

    // upgraded sink replays epoch 0: the legacy marker must cover it
    val w = new FileLogStreamingWrite(dir, schema, "q-legacy")
    w.commit(0L, Array(temp("x", "y")))
    assert(readBack(dir) === Seq("x", "y"), "upgrade replay double-appended")

    // epochs beyond the marker commit normally (tagged)
    w.commit(1L, Array(temp("z")))
    assert(readBack(dir) === Seq("x", "y", "z"))
  }
}
