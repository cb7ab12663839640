package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** `writeStream.format("graft-log")` — the streaming producer half of the
  * DSv2 transport: per-epoch two-phase commit, exactly-once over epoch
  * replay via the per-query high-water marker. */
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
  }
}
