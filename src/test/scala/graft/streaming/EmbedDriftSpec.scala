package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.Pca
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Windowed embedding-moments drift against a fixed reference: a window
  * drawn like the reference stays near (0, 1), a mean-shifted window
  * alarms on mean_l2, a variance-collapsed window drives trace_ratio
  * toward 0, and each window emits exactly once. */
class EmbedDriftSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2025-06-01 00:00:00").getTime
  private def ts(s: Long) = new Timestamp(base + s * 1000)

  test("matching window ~ (0,1); shifted mean and collapsed variance alarm; one row each") {
    implicit val sqlCtx = spark.sqlContext
    val dim = 4
    // reference: axis-aligned spread around the origin, variance 2/3 per
    // the two symmetric points ±1 on each axis
    val refVecs = (0 until dim).flatMap(i =>
      Seq(Seq.tabulate(dim)(j => if (j == i) 1.0 else 0.0),
        Seq.tabulate(dim)(j => if (j == i) -1.0 else 0.0)))
    val ref = Pca.moments(refVecs.toDF("v"), "v", dim)

    val mem = MemoryStream[(Seq[Double], Timestamp)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, Long, Double, Option[Double])]
    val cp = java.nio.file.Files.createTempDirectory("embed-drift").toString
    val q = EmbedDrift.start(
      mem.toDF().toDF("v", "ts"), "ts", "v", dim,
      windowDuration = "1 minute", ref = ref, checkpoint = cp,
      watermarkDelay = "0 seconds") { (cmp, _) =>
      got.synchronized {
        got ++= cmp.collect().map(r => (r.getTimestamp(0), r.getLong(2),
          r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      }
    }
    try {
      // window 1 (00:00-01:00): the reference points themselves
      mem.addData(refVecs.zipWithIndex.map { case (v, i) => (v, ts(i.toLong)) })
      q.processAllAvailable()
      // window 2 (01:00-02:00): same spread, centroid shifted by +5 on dim 0
      mem.addData(refVecs.zipWithIndex.map { case (v, i) =>
        (v.updated(0, v(0) + 5.0), ts(65L + i)) })
      q.processAllAvailable()
      // window 3 (02:00-03:00): collapsed — every vector identical
      mem.addData((0 until 4).map(i => (Seq.fill(dim)(0.5), ts(125L + i))))
      q.processAllAvailable()
      // two more windows push the watermark past all three
      mem.addData(Seq((Seq.fill(dim)(0.0), ts(185))))
      q.processAllAvailable()
      mem.addData(Seq((Seq.fill(dim)(0.0), ts(245))))
      q.processAllAvailable()

      val byWindow = got.synchronized(got.toList)
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap
      assert(byWindow.values.forall(_.size == 1),
        s"each window must emit exactly once: $got")
      val w1 = byWindow(ts(0)).head
      assert(w1._1 == 2L * dim && w1._2 == 0.0 && w1._3.contains(1.0),
        s"reference-shaped window must sit at (0, 1): $w1")
      val w2 = byWindow(ts(60)).head
      assert(w2._2 > 4.9 && w2._2 < 5.1,
        s"+5 centroid shift must alarm mean_l2 ~ 5: $w2")
      assert(w2._3.contains(1.0), s"shift preserves variance: $w2")
      val w3 = byWindow(ts(120)).head
      assert(w3._3.contains(0.0), s"collapsed window must ratio 0: $w3")
      assert(w3._2 > 0.9, s"collapsed-at-0.5 centroid is off-origin: $w3")
    } finally q.stop()
  }

  test("n = 1 window emits null trace_ratio instead of being dropped") {
    implicit val sqlCtx = spark.sqlContext
    val dim = 2
    val ref = Pca.moments(
      Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, -1.0))
        .toDF("v"), "v", dim)
    val mem = MemoryStream[(Seq[Double], Timestamp)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Boolean)]
    val cp = java.nio.file.Files.createTempDirectory("embed-drift1").toString
    val q = EmbedDrift.start(
      mem.toDF().toDF("v", "ts"), "ts", "v", dim,
      windowDuration = "1 minute", ref = ref, checkpoint = cp,
      watermarkDelay = "0 seconds") { (cmp, _) =>
      got.synchronized {
        got ++= cmp.collect().map(r => (r.getLong(2), r.isNullAt(4)))
      }
    }
    try {
      mem.addData(Seq((Seq(3.0, 4.0), ts(5))))
      q.processAllAvailable()
      mem.addData(Seq((Seq(0.0, 0.0), ts(65))))
      q.processAllAvailable()
      mem.addData(Seq((Seq(0.0, 0.0), ts(125))))
      q.processAllAvailable()
      val first = got.synchronized(got.toList).headOption
      assert(first.contains((1L, true)),
        s"singleton window: n = 1 with null ratio, got $first")
    } finally q.stop()
  }
}
