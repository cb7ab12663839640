package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Windowed streaming k-anonymity: each finalized window's profile equals
  * the batch [[graft.ops.Audit.kAnonymity]] over the same slice, and each
  * window emits exactly once (append-mode finalization).
  */
class PrivacyMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2025-06-01 00:00:00").getTime
  private def ts(s: Long) = new Timestamp(base + s * 1000)

  test("per-window risk profile; safe window 0 ppm, unique-row window alarms") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, Seq[Long])]
    val cp = java.nio.file.Files.createTempDirectory("privacy-mon").toString
    val q = PrivacyMonitor.start(
      mem.toDF().toDF("age", "sex", "ts"), "ts", Seq("age", "sex"),
      windowDuration = "1 minute", threshold = 2L, checkpoint = cp,
      watermarkDelay = "0 seconds") { (profile, _) =>
      got.synchronized {
        got ++= profile.collect().map(r => (r.getTimestamp(0),
          (2 to 7).map(r.getLong(_)).toSeq))
      }
    }
    try {
      // window 1 (00:00–01:00): two classes of size 2 — nothing under k=2
      mem.addData(Seq((30L, "M", ts(5)), (30L, "M", ts(10)),
        (40L, "F", ts(20)), (40L, "F", ts(30))))
      q.processAllAvailable()
      // window 2 (01:00–02:00): one size-2 class + one UNIQUE row
      mem.addData(Seq((30L, "M", ts(65)), (30L, "M", ts(70)),
        (50L, "F", ts(80))))
      q.processAllAvailable()
      // later windows push the watermark past windows 1 and 2
      mem.addData(Seq((30L, "M", ts(125))))
      q.processAllAvailable()
      mem.addData(Seq((30L, "M", ts(185))))
      q.processAllAvailable()

      val byWindow = got.synchronized(got.toList)
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(byWindow.values.forall(_.size == 1),
        s"each window must profile exactly once: $got")
      // (n_rows, n_classes, min_k, n_unique_rows, n_risky_rows, risky_ppm)
      assert(byWindow(ts(0)) == List(Seq(4L, 2L, 2L, 0L, 0L, 0L)),
        s"safe window: ${byWindow(ts(0))}")
      assert(byWindow(ts(60)) == List(Seq(3L, 2L, 1L, 1L, 1L, 333333L)),
        s"unique-row window: ${byWindow(ts(60))}")

      // profile ≡ the batch audit over the same slice
      val batch = graft.ops.Audit.kAnonymity(
        Seq((30L, "M"), (30L, "M"), (50L, "F")).toDF("age", "sex"),
        Seq("age", "sex"), 2L).head()
      assert((2 to 7).map(i => byWindow(ts(60)).head(i - 2)) ==
        (0 until 6).map(batch.getLong(_)))
    } finally q.stop()
  }
}
