package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Windowed two-sample KS drift against a fixed reference: a window that
  * matches the reference alarms 0 ppm, a shifted window alarms high, and
  * each window emits exactly once (append-mode finalization). */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2025-06-01 00:00:00").getTime
  private def ts(s: Long) = new Timestamp(base + s * 1000)

  test("matching window drifts 0; shifted window alarms; one row per window") {
    implicit val sqlCtx = spark.sqlContext
    // reference: uniform over {10, 20} — 50/50
    val ref = Seq((10L, 5L), (20L, 5L)).toDF("v", "c")
    val mem = MemoryStream[(Long, Timestamp)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, Long, Long, Long)]
    val cp = java.nio.file.Files.createTempDirectory("drift-mon").toString
    val q = DriftMonitor.start(
      mem.toDF().toDF("value", "ts"), "ts", "value",
      windowDuration = "1 minute", ref = ref, checkpoint = cp,
      watermarkDelay = "0 seconds") { (ks, _) =>
      got.synchronized {
        got ++= ks.collect().map(r => (r.getTimestamp(0), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      }
    }
    try {
      // window 1 (00:00–01:00): same 50/50 shape as the reference
      mem.addData(Seq((10L, ts(5)), (20L, ts(10)), (10L, ts(20)),
        (20L, ts(30))))
      q.processAllAvailable()
      // window 2 (01:00–02:00): everything at 20 — maximal shift vs ref
      mem.addData(Seq((20L, ts(65)), (20L, ts(70)), (20L, ts(80))))
      q.processAllAvailable()
      // window 3 pushes the watermark past windows 1 and 2
      mem.addData(Seq((10L, ts(125))))
      q.processAllAvailable()
      mem.addData(Seq((10L, ts(185))))
      q.processAllAvailable()

      val byWindow = got.synchronized(got.toList)
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap
      assert(byWindow.values.forall(_.size == 1),
        s"each window must alarm exactly once: $got")
      val w1 = byWindow(ts(0))
      assert(w1 == List((4L, 10L, 0L)),
        s"reference-shaped window must drift 0 ppm: $w1")
      // window 2: F_win(10)=0 vs F_ref(10)=1/2 → D=1/2 → 500000 ppm
      val w2 = byWindow(ts(60))
      assert(w2 == List((3L, 10L, 500000L)),
        s"all-at-20 window must drift 500000 ppm: $w2")
    } finally q.stop()
  }
}
