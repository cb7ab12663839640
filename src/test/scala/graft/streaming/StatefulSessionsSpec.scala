package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulSessionsSpec extends SparkSpec {

  private def ev(ts: String, name: String, user: String = "u1") =
    s"""{"timestamp":"$ts","event_name":"$name","user_id":"$user"}"""

  test("sign_out closes a session immediately; timeout closes the rest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val sessions = StatefulSessions.sessionize(
      EventDecode.decode(mem.toDF()), watermark = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("stateful_sessions").outputMode(OutputMode.Append()).start()
    try {
      // session 1: sign_in → view → sign_out (closes inline)
      mem.addData(Seq(
        ev("2024-01-01T10:00:00.000000", "sign_in"),
        ev("2024-01-01T10:05:00.000000", "item_view"),
        ev("2024-01-01T10:06:00.000000", "sign_out")))
      q.processAllAvailable()
      // session 2 for another user: no sign_out; advance watermark past gap
      mem.addData(Seq(ev("2024-01-01T11:00:00.000000", "sign_in", "u2")))
      q.processAllAvailable()
      mem.addData(Seq(ev("2024-01-01T13:00:00.000000", "sign_in", "u3")))
      q.processAllAvailable()
      mem.addData(Seq(ev("2024-01-01T15:00:00.000000", "sign_in", "u4")))
      q.processAllAvailable()

      val rows = spark.table("stateful_sessions").collect()
      val byUser = rows.groupBy(_.getString(0))
      assert(byUser.contains("u1"))
      val u1 = byUser("u1").head
      assert(u1.getString(5) == "sign_out")
      assert(u1.getLong(3) == 3L) // 3 events in the session
      assert(u1.getLong(4) == 1L) // 1 item_view
      // u2's sign_out-less session closed by event-time timeout
      assert(byUser.contains("u2"))
      assert(byUser("u2").head.getString(5) == "timeout")
    } finally q.stop()
  }

  test("in-batch inactivity gap splits sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(Seq(
      ev("2024-01-01T10:00:00.000000", "sign_in"),
      ev("2024-01-01T10:10:00.000000", "item_view"),
      ev("2024-01-01T12:00:00.000000", "sign_in"), // >30min later
      ev("2024-01-01T12:01:00.000000", "sign_out")))
    val sessions = StatefulSessions.sessionize(
      EventDecode.decode(mem.toDF()), watermark = "1 minute")
    val q = sessions.writeStream.format("memory")
      .queryName("gap_sessions").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("gap_sessions").collect()
      // first session closed by the gap, second by sign_out
      assert(rows.map(_.getString(5)).sorted.toSeq == Seq("gap", "sign_out"))
      assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(2L, 2L))
    } finally q.stop()
  }
}
