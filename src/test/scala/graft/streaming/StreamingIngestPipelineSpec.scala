package graft.streaming

import graft.SparkSpec
import graft.model.Schemas
import graft.sources.Ingest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming composition test, the stream-side twin of
  * `CurationPipelineSpec`: ONE stream of raw JSON lines (some corrupt)
  * flows through quarantine split → typed event-time decode → watermarked
  * tumbling-window aggregation, while the corrupt lines reach their own
  * sink verbatim. Pins that the ingestion, decode, and segmentation layers
  * compose on a STREAMING plan with no batch-only shim in between. */
class StreamingIngestPipelineSpec extends SparkSpec {

  private def ev(ts: String, name: String, user: String): String =
    s"""{"timestamp": "$ts", "event_name": "$name", "user_id": "$user"}"""

  test("raw lines → quarantine → decode → windowed counts, one streaming plan") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      ev("2026-01-01T00:01:00.000000", "item_view", "u1"),
      ev("2026-01-01T00:02:30.000000", "item_view", "u2"),
      """{definitely not json""",
      ev("2026-01-01T00:07:00.000000", "sign_in", "u1"),
      "null")

    val (good, bad) = Ingest.jsonSplit(mem.toDF().toDF("value"), Schemas.eventUnion)
    val counts = Segmentation.windowedCounts(
      EventDecode.withEventTime(good),
      watermark = "10 minutes", windowLen = "5 minutes")
    assert(counts.isStreaming, "the composed pipeline must stay streaming")

    val cq = counts.writeStream.format("memory").queryName("pipe_counts")
      .outputMode("complete").start()
    val bq = bad.writeStream.format("memory").queryName("pipe_bad")
      .outputMode("append").start()
    try {
      cq.processAllAvailable(); bq.processAllAvailable()
      val rows = spark.table("pipe_counts")
        .select(col("window.start").cast("string"), col("event_name"), col("count"))
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("2026-01-01 00:00:00", "item_view", 2L),
        ("2026-01-01 00:05:00", "sign_in", 1L)),
        s"windowed counts wrong: $rows")
      val badLines = spark.table("pipe_bad").as[String].collect().toSet
      assert(badLines == Set("""{definitely not json""", "null"),
        "corrupt lines must reach the quarantine sink verbatim")
    } finally { cq.stop(); bq.stop() }
  }
}
