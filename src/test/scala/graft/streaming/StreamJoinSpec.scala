package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join: matches inside the window, no matches
  * outside it, and left-outer null emission once the watermark proves no
  * match can still arrive (which is also the state-eviction proof). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("inner: conversions join inside the window only; outer emits the rest") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(String, Timestamp)]
    val clks = MemoryStream[(String, Timestamp)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("ik", "its"), "its", "ik", "10 minutes",
      clks.toDF().toDF("ck", "cts"), "cts", "ck", "10 minutes",
      upper = "30 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("attrib").outputMode("append").start()
    try {
      // u1: click 10 min after the impression (inside the 30-min window)
      // u2: click 90 min after (outside) — must NOT match
      // u3: impression with no click at all
      imps.addData(Seq(
        ("u1", ts("2024-01-01 10:00:00")),
        ("u2", ts("2024-01-01 10:00:00")),
        ("u3", ts("2024-01-01 10:05:00"))))
      clks.addData(Seq(
        ("u1", ts("2024-01-01 10:10:00")),
        ("u2", ts("2024-01-01 11:30:00"))))
      q.processAllAvailable()
      // push both watermarks far past every window so unmatched
      // impressions are provably unmatchable and their state evicts
      imps.addData(Seq(("wm", ts("2024-01-01 23:00:00"))))
      clks.addData(Seq(("wm2", ts("2024-01-01 23:00:00"))))
      q.processAllAvailable()
      imps.addData(Seq(("wm3", ts("2024-01-02 12:00:00"))))
      clks.addData(Seq(("wm4", ts("2024-01-02 12:00:00"))))
      q.processAllAvailable()

      val rows = spark.table("attrib")
        .select("ik", "cts").as[(String, Option[Timestamp])]
        .collect().toMap
      assert(rows("u1").contains(ts("2024-01-01 10:10:00")),
        s"in-window click attributed: $rows")
      assert(rows.get("u2").exists(_.isEmpty),
        s"out-of-window click must not match: $rows")
      assert(rows.get("u3").exists(_.isEmpty),
        s"clickless impression emitted with nulls after expiry: $rows")
    } finally q.stop()
  }

  test("kill-and-restart reproduces the uninterrupted run's join decisions") {
    implicit val sqlCtx = spark.sqlContext
    // foreachBatch sink (the memory sink refuses checkpoint recovery);
    // map semantics absorb a replayed at-least-once sink batch
    def start(imps: MemoryStream[(String, Timestamp)],
        clks: MemoryStream[(String, Timestamp)], checkpoint: String,
        out: scala.collection.mutable.Map[String, Option[Timestamp]]) =
      StreamJoin.intervalJoin(
          imps.toDF().toDF("ik", "its"), "its", "ik", "10 minutes",
          clks.toDF().toDF("ck", "cts"), "cts", "ck", "10 minutes",
          upper = "30 minutes", joinType = "left_outer")
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select("ik", "cts").collect()
            .map(r => r.getString(0) -> Option(r.getTimestamp(1)))
          out.synchronized { out ++= rows }; ()
        }.start()

    val imps1 = Seq(("u1", ts("2024-01-01 10:00:00")),
      ("u2", ts("2024-01-01 10:00:00")), ("u3", ts("2024-01-01 10:05:00")))
    val clks1 = Seq(("u1", ts("2024-01-01 10:10:00")))
    val clks2 = Seq(("u2", ts("2024-01-01 11:30:00"))) // outside the window
    val wmA = Seq(("wmA", ts("2024-01-01 23:00:00")))
    val wmB = Seq(("wmB", ts("2024-01-02 12:00:00")))
    val expected = Map(
      "u1" -> Some(ts("2024-01-01 10:10:00")),
      "u2" -> None, "u3" -> None)
    def drive(imps: MemoryStream[(String, Timestamp)],
        clks: MemoryStream[(String, Timestamp)],
        q: => org.apache.spark.sql.streaming.StreamingQuery,
        killAfterBatch1: Boolean): Unit = {
      val q1 = q
      try { imps.addData(imps1); clks.addData(clks1); q1.processAllAvailable() }
      finally if (killAfterBatch1) q1.stop()
      val q2 = if (killAfterBatch1) q else q1
      try {
        clks.addData(clks2); q2.processAllAvailable()
        Seq(wmA, wmB).foreach { wm =>
          imps.addData(wm); clks.addData(wm); q2.processAllAvailable()
        }
      } finally q2.stop()
    }

    // control: no interruption
    val cImps = MemoryStream[(String, Timestamp)]
    val cClks = MemoryStream[(String, Timestamp)]
    val cCp = java.nio.file.Files.createTempDirectory("sj-ctrl").toString
    val cOut = scala.collection.mutable.Map.empty[String, Option[Timestamp]]
    drive(cImps, cClks, start(cImps, cClks, cCp, cOut), killAfterBatch1 = false)
    assert(cOut.filterKeys(_.startsWith("u")).toMap == expected, s"control: $cOut")

    // drill: kill after the first batch, restart from the checkpoint
    val dImps = MemoryStream[(String, Timestamp)]
    val dClks = MemoryStream[(String, Timestamp)]
    val dCp = java.nio.file.Files.createTempDirectory("sj-drill").toString
    val dOut = scala.collection.mutable.Map.empty[String, Option[Timestamp]]
    drive(dImps, dClks, start(dImps, dClks, dCp, dOut), killAfterBatch1 = true)
    assert(dOut.filterKeys(_.startsWith("u")).toMap == expected,
      s"restarted run diverged: $dOut != $expected")
  }

  test("column-name collisions and bad join types fail loudly") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(String, Timestamp)].toDF().toDF("k", "ts")
    val b = MemoryStream[(String, Timestamp)].toDF().toDF("k", "cts")
    intercept[IllegalArgumentException](
      StreamJoin.intervalJoin(a, "ts", "k", "1 minute",
        b, "cts", "k", "1 minute", "1 hour"))
    val c = MemoryStream[(String, Timestamp)].toDF().toDF("ck", "cts")
    intercept[IllegalArgumentException](
      StreamJoin.intervalJoin(a, "ts", "k", "1 minute",
        c, "cts", "ck", "1 minute", "1 hour", joinType = "full_outer"))
  }
}
