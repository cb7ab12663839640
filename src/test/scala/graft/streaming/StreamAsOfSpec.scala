package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming as-of enrichment ≡ batch [[graft.ops.AsOfJoin.latestPreceding]]
  * on the same data — including a version arriving AFTER the event it must
  * match (the buffering-until-watermark case) — and identical matches
  * across a kill-and-restart.
  */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2025-03-01 00:00:00").getTime
  private def ts(s: Long) = new Timestamp(base + s * 1000)

  private def withRocksDB[A](body: => A): A = {
    // no-data micro-batches stay ENABLED (the default): event-time timers
    // fire in the extra batch Spark schedules after a watermark advance —
    // without it, resolved-by-timer emission would wait for unrelated data
    val settings = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val prev = settings.keys.map(k => k -> spark.conf.getOption(k)).toMap
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(p)) => spark.conf.set(k, p)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // The drill feed: (key, ts, kind 0=dim/1=event, id), per micro-batch,
  // with a 10s watermark delay (wm = max ts − 10s at each batch END; no
  // row below arrives late w.r.t. the wm at its arrival):
  //   b1: key 7 dim v1@0s; events e1@5s, e2@2s       (wm after b1: −5s)
  //   b2: dim v2@4s — arrives AFTER e1/e2 but before the wm passes them;
  //       key 9: event e3@3s with no dim ever         (wm still −5s)
  //       (restarted run is killed here)
  //   b3: dim v3@5s — ties e1's ts exactly: right-before-left ⇒ v3 ≤ e1,
  //       largest-id-wins ⇒ e1 → v3, e2 → v1; pusher e4@100s
  //       (wm after b3: 90s → e1/e2/e3 resolve in the no-data batch)
  //   b4: e5@101s (→ v3), key 9 e6@200s (→ None)      (wm 190: e4/e5 flush)
  //   final pusher 999@500s flushes e6 and is excluded from the compare.
  //   key 11 is the dim-hot/event-cold drill: versions v50@1s, v51@2s with
  //   no event until e7@150s — by then the watermark has compacted the
  //   history to the single latest (v51), which e7 must still match.
  private val batches: Seq[Seq[(Long, Timestamp, Int, Long)]] = Seq(
    Seq((7L, ts(0), 0, 1L), (7L, ts(5), 1, 101L), (7L, ts(2), 1, 102L),
      (11L, ts(1), 0, 50L), (11L, ts(2), 0, 51L)),
    Seq((7L, ts(4), 0, 2L), (9L, ts(3), 1, 103L)),
    Seq((7L, ts(5), 0, 3L), (7L, ts(100), 1, 104L)),
    Seq((7L, ts(101), 1, 105L), (9L, ts(200), 1, 106L),
      (11L, ts(150), 1, 107L)))

  private def allRows = batches.flatten
  private def batchExpected: Map[Long, Option[Long]] = {
    // the batch oracle on the same data
    val events = allRows.filter(_._3 == 1)
      .map(r => (r._1, r._2, r._4)).toDF("key", "ts", "event_id")
    val dims = allRows.filter(_._3 == 0)
      .map(r => (r._1, r._2, r._4)).toDF("key", "ts", "id")
    graft.ops.AsOfJoin.latestPreceding(events, dims, "key", "ts", "id")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_id")).map(_.longValue))
      .toMap
  }

  private def start(mem: MemoryStream[(Long, Timestamp, Int, Long)],
      checkpoint: String,
      got: scala.collection.mutable.Map[Long, Option[Long]]) = {
    val unified = mem.toDF().toDF("key", "ts", "kind", "id")
    val out = StreamAsOf.enrichLatestPreceding(
      unified.filter($"kind" === 1).select("key", "ts", "id")
        .withColumnRenamed("id", "event_id"),
      unified.filter($"kind" === 0).select("key", "ts", "id"),
      watermarkDelay = "10 seconds")
    out.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamAsOf.Out], _: Long) =>
        val rows = b.collect().map(o => o.event_id -> o.asof_id)
        got.synchronized {
          rows.foreach { case (e, a) =>
            // append-once: a sink-batch replay may repeat a row, but two
            // DIFFERENT answers for one event is a correctness bug
            got.get(e).foreach(prev => assert(prev == a,
              s"event $e answered twice differently: $prev vs $a"))
            got(e) = a
          }
        }; ()
      }
      .start()
  }

  test("streamed lookups equal the batch as-of join, including a version " +
    "arriving after its event") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Timestamp, Int, Long)]
      val cp = java.nio.file.Files.createTempDirectory("sasof").toString
      val got = scala.collection.mutable.Map.empty[Long, Option[Long]]
      val q = start(mem, cp, got)
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        // final watermark pusher so the tail events flush
        mem.addData(Seq((7L, ts(500), 1, 999L))); q.processAllAvailable()
      } finally q.stop()
      val expected = batchExpected
      val answered = got.synchronized(got.toMap) - 999L
      assert(answered == expected,
        s"stream $answered\nbatch  $expected")
      // the hard case is load-bearing: v2@4s arrived a batch after e1@5s
      assert(expected(101L).contains(3L) && expected(102L).contains(1L) &&
        expected(103L).isEmpty)

      // composition with Merge.scd2 (the claim in StreamAsOf's scaladoc):
      // each answered event's version is exactly the SCD-2 row effective
      // at the event's timestamp (valid_from <= ts < valid_to)
      import org.apache.spark.sql.functions.{col, lit}
      val dimRows = allRows.filter(_._3 == 0)
        .map(r => (r._1, r._2, r._4)).toDF("key", "ts", "id")
      val scd = graft.ops.Merge.scd2(dimRows, Seq("key"), "ts")
      allRows.filter(_._3 == 1).foreach { case (k, t, _, eid) =>
        val eff = graft.ops.Merge.asOfSnapshot(scd, lit(t))
          .filter(col("key") === k).select("id")
          .collect().map(_.getLong(0)).headOption
        assert(answered.get(eid).forall(_ == eff),
          s"event $eid at $t: stream ${answered.get(eid)} vs scd2 $eff")
      }
    }
  }

  test("sub-millisecond timestamps keep microsecond precision: a version " +
    "900µs after an event must not match it") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      def tsU(s: Long, us: Long): Timestamp = {
        val t = new Timestamp(base + s * 1000)
        t.setNanos((us * 1000).toInt); t
      }
      val mem = MemoryStream[(Long, Timestamp, Int, Long)]
      val cp = java.nio.file.Files.createTempDirectory("sasof-us").toString
      val outRows = scala.collection.mutable.Map.empty[Long, (Timestamp, Option[Long])]
      val unified = mem.toDF().toDF("key", "ts", "kind", "id")
      val q = StreamAsOf.enrichLatestPreceding(
        unified.filter($"kind" === 1).select("key", "ts", "id")
          .withColumnRenamed("id", "event_id"),
        unified.filter($"kind" === 0).select("key", "ts", "id"),
        watermarkDelay = "10 seconds")
        .writeStream.option("checkpointLocation", cp)
        .outputMode(OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamAsOf.Out], _: Long) =>
          b.collect().foreach(o => outRows.synchronized {
            outRows(o.event_id) = (o.ts, o.asof_id)
          }); ()
        }.start()
      try {
        // v60@0s precedes e201@10.0005s; v61@10.0009s is 400µs AFTER the
        // event — a millisecond-truncating implementation would match it
        mem.addData(Seq((13L, tsU(0, 0), 0, 60L), (13L, tsU(10, 500), 1, 201L),
          (13L, tsU(10, 900), 0, 61L)))
        q.processAllAvailable()
        mem.addData(Seq((13L, ts(100), 1, 202L))); q.processAllAvailable()
        mem.addData(Seq((13L, ts(500), 1, 999L))); q.processAllAvailable()
      } finally q.stop()
      val got = outRows.synchronized(outRows.toMap)
      assert(got(201L) == ((tsU(10, 500), Some(60L))),
        s"e201 must keep its microsecond ts and match v60, got ${got.get(201L)}")
      assert(got(202L)._2 == Some(61L), s"e202 sees v61: ${got.get(202L)}")
      // ≡ the batch as-of on the same micro-precision data
      val events = Seq((13L, tsU(10, 500), 201L), (13L, ts(100), 202L))
        .toDF("key", "ts", "event_id")
      val dims = Seq((13L, tsU(0, 0), 60L), (13L, tsU(10, 900), 61L))
        .toDF("key", "ts", "id")
      val batch = graft.ops.AsOfJoin.latestPreceding(events, dims, "key", "ts", "id")
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("asof_id")).map(_.longValue)).toMap
      assert(batch == Map(201L -> Some(60L), 202L -> Some(61L)))
    }
  }

  test("kill-and-restart reproduces identical matches") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Timestamp, Int, Long)]
      val cp = java.nio.file.Files.createTempDirectory("sasof-r").toString
      val got = scala.collection.mutable.Map.empty[Long, Option[Long]]
      val q1 = start(mem, cp, got)
      try {
        batches.take(2).foreach { b => mem.addData(b); q1.processAllAvailable() }
      } finally q1.stop() // killed after batch 2
      val q2 = start(mem, cp, got)
      try {
        batches.drop(2).foreach { b => mem.addData(b); q2.processAllAvailable() }
        mem.addData(Seq((7L, ts(500), 1, 999L))); q2.processAllAvailable()
      } finally q2.stop()
      assert(got.synchronized(got.toMap) - 999L == batchExpected,
        "restarted run must answer every event exactly as the batch oracle")
    }
  }

  test("null-ts rows on both sides stay batch-equal: a null-ts version never " +
    "matches, a null-ts event emits unmatched") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val nullTs: Timestamp = null
      // q168 pins these rules cross-engine for the BATCH op; this is the
      // streaming twin. v99 has no timestamp — it must not become anyone's
      // "preceding" match (and must not crash the watermark/state path);
      // e201/e202 have no timestamp — they must come back with asof_id
      // None, not vanish, not match the key's earliest version.
      val nullBatches: Seq[Seq[(Long, Timestamp, Int, Long)]] = Seq(
        Seq((7L, ts(0), 0, 1L), (7L, nullTs, 0, 99L), (7L, ts(5), 1, 101L)),
        Seq((7L, nullTs, 1, 201L), (9L, nullTs, 1, 202L),
          (9L, ts(3), 0, 4L)),
        Seq((7L, ts(100), 1, 104L), (9L, ts(101), 1, 105L)))
      val mem = MemoryStream[(Long, Timestamp, Int, Long)]
      val cp = java.nio.file.Files.createTempDirectory("sasof-null").toString
      val got = scala.collection.mutable.Map.empty[Long, Option[Long]]
      val q = start(mem, cp, got)
      try {
        nullBatches.foreach { b => mem.addData(b); q.processAllAvailable() }
        mem.addData(Seq((7L, ts(500), 1, 999L))); q.processAllAvailable()
      } finally q.stop()
      // batch oracle over the same rows (null rows included)
      val rows = nullBatches.flatten
      val events = rows.filter(_._3 == 1)
        .map(r => (r._1, r._2, r._4)).toDF("key", "ts", "event_id")
      val dims = rows.filter(_._3 == 0)
        .map(r => (r._1, r._2, r._4)).toDF("key", "ts", "id")
      val expected = graft.ops.AsOfJoin
        .latestPreceding(events, dims, "key", "ts", "id")
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("asof_id")).map(_.longValue))
        .toMap
      val answered = got.synchronized(got.toMap) - 999L
      assert(answered == expected, s"stream $answered\nbatch  $expected")
      // the load-bearing cells, stated explicitly
      assert(expected(101L).contains(1L), "e101 matches v1, never null-ts v99")
      assert(expected(201L).isEmpty && expected(202L).isEmpty,
        "null-ts events emit with no match")
      assert(expected(104L).contains(1L) && expected(105L).contains(4L))
    }
  }
}
