package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.gen.EventGen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamRunnerSpec extends SparkSpec {

  test("checkpointed parquet sink: restart resumes, no reprocessing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createDirectories(Paths.get("target/tmp/stream")).toString
    val out = s"$base/out_${System.nanoTime()}"
    val ckpt = s"$out.ckpt"

    val mem = MemoryStream[String]
    val jsons = EventGen.asJson(EventGen.batch(spark, 100, seed = 3))
      .collect().map(_.getString(0))
    mem.addData(jsons.take(50).toSeq)

    val decoded = EventDecode.decode(mem.toDF())
    val q1 = StreamRunner.startParquetSink(decoded, out, ckpt, Trigger.AvailableNow())
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() == 50)

    // restart with more data: only the new batch lands (offsets committed)
    mem.addData(jsons.drop(50).toSeq)
    val q2 = StreamRunner.startParquetSink(decoded, out, ckpt, Trigger.AvailableNow())
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 100)
  }

  test("supervise restarts a failing query factory") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    var attempts = 0
    StreamRunner.supervise(maxRestarts = 2) { () =>
      attempts += 1
      val mem = MemoryStream[Int]
      mem.addData(1 to 10)
      val df =
        if (attempts < 2)
          mem.toDF().selectExpr("assert_true(value < 5) AS v") // fails batch
        else mem.toDF()
      df.writeStream.format("noop")
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(attempts == 2)
  }
}
