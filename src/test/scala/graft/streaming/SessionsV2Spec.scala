package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** `transformWithState` sessionizer vs the `flatMapGroupsWithState` one:
  * identical input → identical closed sessions. Runs on the RocksDB state
  * store provider (required by transformWithState). */
class SessionsV2Spec extends SparkSpec {

  private def ev(ts: String, name: String, user: String = "u1") =
    s"""{"timestamp":"$ts","event_name":"$name","user_id":"$user"}"""

  private val batches: Seq[Seq[String]] = Seq(
    Seq( // u1: full session closed by sign_out; u2 opens
      ev("2024-01-01T10:00:00.000000", "sign_in"),
      ev("2024-01-01T10:05:00.000000", "item_view"),
      ev("2024-01-01T10:06:00.000000", "sign_out"),
      ev("2024-01-01T10:07:00.000000", "sign_in", "u2")),
    Seq( // in-batch gap split for u3
      ev("2024-01-01T11:00:00.000000", "sign_in", "u3"),
      ev("2024-01-01T11:10:00.000000", "item_view", "u3"),
      ev("2024-01-01T13:00:00.000000", "sign_in", "u3")),
    // watermark advancers: push event time far enough to fire timers
    Seq(ev("2024-01-01T15:00:00.000000", "sign_in", "u9")),
    Seq(ev("2024-01-01T18:00:00.000000", "sign_in", "u9")))

  private def run(name: String, useV2: Boolean): Seq[(String, Long, Long, Long, Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val decoded = EventDecode.decode(mem.toDF())
    val sessions =
      if (useV2) SessionsV2.sessionize(decoded, watermark = "10 minutes")
      else StatefulSessions.sessionize(decoded, watermark = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5)))
        .sortBy(t => (t._1, t._2)).toSeq
    } finally q.stop()
  }

  test("transformWithState sessionizer reproduces flatMapGroupsWithState exactly") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val v2 = run("sessions_v2", useV2 = true)
      val v1 = run("sessions_v1", useV2 = false)
      assert(v2.nonEmpty)
      assert(v2 == v1, s"v2=$v2\nv1=$v1")
      // and the interesting closures all occurred
      val why = v2.map(_._6)
      assert(why.contains("sign_out") && why.contains("gap") && why.contains("timeout"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
