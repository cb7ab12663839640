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
