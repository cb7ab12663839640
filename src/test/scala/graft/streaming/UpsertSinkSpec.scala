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
}
