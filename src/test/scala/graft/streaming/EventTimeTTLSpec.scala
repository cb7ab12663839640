package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Event-time TTL for the streaming dedup pair: eviction is a watermark
  * decision, so a killed-and-restarted query reproduces IDENTICAL drop
  * decisions — the round-7/8 carryover that processing-time TTL cannot
  * satisfy (a replay runs at a later wall-clock and may evict differently).
  */
class EventTimeTTLSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2025-01-01 00:00:00").getTime
  private def ts(s: Long) = new Timestamp(base + s * 1000)

  private def withRocksDB[A](body: => A): A = {
    val settings = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")
    val prev = settings.keys.map(k => k -> spark.conf.getOption(k)).toMap
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(p)) => spark.conf.set(k, p)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // The drill sequence, shared by the restarted and control runs:
  //   batch1: alpha@0s, beta@1s            -> emit 1, 2
  //   (restarted run is killed here)
  //   batch2: beta@5s (dup), gamma@70s     -> drop 5, emit 6; wm -> 70s
  //   batch3: delta@80s                    -> emit 7; timers alpha@60s,
  //           beta@65s fire (wm 70s): both keys forgotten
  //   batch4: alpha@81s                    -> emit 9 (re-admitted)
  private val batches: Seq[Seq[(Long, String, Timestamp)]] = Seq(
    Seq((1L, "alpha", ts(0)), (2L, "beta", ts(1))),
    Seq((5L, "beta", ts(5)), (6L, "gamma", ts(70))),
    Seq((7L, "delta", ts(80))),
    Seq((9L, "alpha", ts(81))))
  private val expectedIds = Set(1L, 2L, 6L, 7L, 9L)

  // foreachBatch sink: the memory sink refuses checkpoint recovery, and the
  // whole point here is restarting from the checkpoint. Emitted ids land in
  // a shared set (set semantics also absorb a replayed sink batch — the
  // at-least-once edge foreachBatch documents).
  private def startDedup(mem: MemoryStream[(Long, String, Timestamp)],
      checkpoint: String,
      emitted: scala.collection.mutable.Set[Long]) = {
    val out = StreamDedup.dropDuplicatesWithEventTimeTTL(
      mem.toDF().toDF("doc_id", "text", "ts"),
      ttl = java.time.Duration.ofSeconds(60),
      watermarkDelay = "0 seconds")
    out.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamDedup.OutDoc], _: Long) =>
          val ids = b.collect().map(_.doc_id)
          emitted.synchronized { emitted ++= ids }; ()
      }
      .start()
  }

  test("dedup: kill-and-restart reproduces the uninterrupted run's decisions") {
    withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      // control: the same four batches with no interruption
      val ctrlMem = MemoryStream[(Long, String, Timestamp)]
      val ctrlCp = java.nio.file.Files.createTempDirectory("ettl-ctrl").toString
      val ctrlIds = scala.collection.mutable.Set.empty[Long]
      val ctrl = startDedup(ctrlMem, ctrlCp, ctrlIds)
      try {
        batches.foreach { b => ctrlMem.addData(b); ctrl.processAllAvailable() }
        assert(ctrlIds.toSet == expectedIds)
      } finally ctrl.stop()

      // drill: kill after batch 1, restart from the checkpoint, continue
      val mem = MemoryStream[(Long, String, Timestamp)]
      val cp = java.nio.file.Files.createTempDirectory("ettl-drill").toString
      val preKill = scala.collection.mutable.Set.empty[Long]
      val q1 = startDedup(mem, cp, preKill)
      try {
        mem.addData(batches.head)
        q1.processAllAvailable()
      } finally q1.stop()
      assert(preKill.toSet == Set(1L, 2L))

      val postKill = scala.collection.mutable.Set.empty[Long]
      val q2 = startDedup(mem, cp, postKill)
      try {
        batches.drop(1).foreach { b => mem.addData(b); q2.processAllAvailable() }
        // beta@5s still dropped (state survived the restart), alpha@81s
        // still re-admitted (watermark-driven eviction replayed identically)
        assert(preKill.toSet ++ postKill.toSet == expectedIds,
          s"restarted run diverged: $preKill ++ $postKill != $expectedIds")
        assert(!postKill.contains(5L), "restart must not forget first-seen keys")
      } finally q2.stop()
    }
  }

  test("late duplicate must not slide the eviction timer backward") {
    withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String, Timestamp)]
      val out = StreamDedup.dropDuplicatesWithEventTimeTTL(
        mem.toDF().toDF("doc_id", "text", "ts"),
        ttl = java.time.Duration.ofSeconds(60),
        watermarkDelay = "100 seconds") // generous lateness: late rows admitted
      val cp = java.nio.file.Files.createTempDirectory("ettl-late").toString
      val q = out.writeStream.format("memory").queryName("ettl_late")
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Append()).start()
      try {
        // alpha's newest event is 100s → eviction due at 160s
        mem.addData(Seq((1L, "alpha", ts(100))))
        q.processAllAvailable()
        // a LATE duplicate at 10s: dropped — and it must NOT pull the
        // timer back to 10+60=70s (the pre-fix behavior)
        mem.addData(Seq((2L, "alpha", ts(10))))
        q.processAllAvailable()
        // advance the watermark to 110s: past the buggy 70s timer, short
        // of the correct 160s one
        mem.addData(Seq((3L, "beta", ts(210))))
        q.processAllAvailable()
        mem.addData(Seq((4L, "gamma", ts(215))))
        q.processAllAvailable()
        // alpha is still within ttl of its NEWEST event: must stay dropped
        mem.addData(Seq((5L, "alpha", ts(211))))
        q.processAllAvailable()

        val ids = spark.table("ettl_late").collect()
          .map(_.getLong(0)).sorted.toSeq
        assert(ids == Seq(1L, 3L, 4L),
          s"late dup shrank the ttl window (alpha re-admitted): $ids")
      } finally q.stop()
    }
  }

  test("near-dup: watermark eviction forgets a silent band deterministically") {
    withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val textA = "the quick brown fox jumps over the lazy dog"
      val mem = MemoryStream[(Long, String, Timestamp)]
      val out = StreamNearDup.flagNearDupsEventTime(
        mem.toDF().toDF("doc_id", "text", "ts"),
        ttl = java.time.Duration.ofSeconds(60),
        watermarkDelay = "0 seconds")
      val cp = java.nio.file.Files.createTempDirectory("ettl-nd").toString
      val q = out.writeStream.format("memory").queryName("ettl_nd")
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(Seq((1L, textA, ts(0))))
        q.processAllAvailable()
        // within the event-time window: flagged against the original
        mem.addData(Seq((2L, textA, ts(10))))
        q.processAllAvailable()
        // unrelated doc pushes the watermark past 10s+60s
        mem.addData(Seq((3L, "one two three four five six", ts(120))))
        q.processAllAvailable()
        // this batch's timer phase clears textA's silent bands
        mem.addData(Seq((8L, "seven eight nine ten eleven twelve", ts(121))))
        q.processAllAvailable()
        // bucket forgotten: the same text is NOT flagged anymore
        mem.addData(Seq((4L, textA, ts(122))))
        q.processAllAvailable()

        val pairs = spark.table("ettl_nd").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pairs == Set((2L, 1L)),
          s"expected only the in-window flag, got $pairs")
      } finally q.stop()
    }
  }
}
