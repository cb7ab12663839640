package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** Streaming as-of enrichment — the online twin of
  * [[graft.ops.AsOfJoin.latestPreceding]]: every streamed EVENT is matched
  * to the latest DIMENSION VERSION of the same key whose timestamp is ≤
  * the event's (online feature lookup against a slowly-changing dimension;
  * composes with [[graft.ops.Merge.scd2]], whose version rows are exactly
  * the dim-update stream here).
  *
  * Correctness discipline: an event is NOT answered from whatever versions
  * happen to have arrived — it is buffered until the WATERMARK passes its
  * event time, i.e. until no version with an earlier timestamp can still
  * arrive. Only then is the lookup final, so the emitted match equals the
  * batch [[graft.ops.AsOfJoin.latestPreceding]] over the same data, and —
  * because the watermark is computed from the data and checkpointed — a
  * killed-and-restarted query reproduces identical matches
  * (StreamAsOfSpec drills both).
  *
  * Tie semantics mirror the batch op exactly: a version at the event's own
  * timestamp matches (right-before-left on equal ts); among versions
  * sharing a timestamp the LARGEST id wins.
  *
  * State per key, all watermark-bounded: the pending events still inside
  * the watermark delay, plus the version history COMPACTED on every
  * resolution — versions at-or-before the watermark collapse to the single
  * latest (the only one any future event can need), so long-lived keys
  * hold ~1 + (versions inside the trailing delay window), not the full
  * history. One event-time timer per key at the earliest pending event.
  *
  * Shape: one shuffle on the key (the groupByKey), RocksDB-backed
  * transformWithState; per-batch work is O(batch + fired keys), never a
  * rescan of the dimension. */
object StreamAsOf {

  /** Unified input: kind 0 = dimension version (id = version id),
    * kind 1 = event (id = event id). */
  final case class In(key: Long, ts: Timestamp, kind: Int, id: Long)
  final case class Out(event_id: Long, key: Long, ts: Timestamp,
      asof_id: Option[Long])

  class LatestPrecedingProcessor
      extends StatefulProcessor[Long, In, Out] {

    @transient private var versions: ListState[(Long, Long)] = _ // (ts, id)
    @transient private var pending: ListState[(Long, Long)] = _ // (ts, eid)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      versions = getHandle.getListState[(Long, Long)](
        "dim_versions", enc, TTLConfig.NONE)
      pending = getHandle.getListState[(Long, Long)](
        "pending_events", enc, TTLConfig.NONE)
    }

    /** Latest (ts, id) ≤ `ets`: max by (ts, id) — the batch op's
      * right-before-left + largest-id-wins tie order. */
    private def lookup(vs: Seq[(Long, Long)], ets: Long): Option[Long] = {
      val at = vs.filter(_._1 <= ets)
      if (at.isEmpty) None else Some(at.max._2)
    }

    /** Emit every pending event the watermark has passed; compact the
      * version history; keep the timer at the earliest still-pending
      * event. */
    private def resolve(key: Long, wm: Long): Iterator[Out] = {
      val pend = pending.get().toSeq
      val (ripe, wait) = pend.partition(_._1 <= wm)
      if (ripe.isEmpty) return Iterator.empty
      val vs = versions.get().toSeq
      val out = ripe.sorted.iterator.map { case (ets, eid) =>
        Out(eid, key, new Timestamp(ets), lookup(vs, ets))
      }
      if (wait.isEmpty) pending.clear() else pending.put(wait.toArray)
      // versions ≤ wm collapse to the single latest: the only one a
      // future event (necessarily > wm) can still match
      val (old, live) = vs.partition(_._1 <= wm)
      val compacted = (if (old.isEmpty) live else old.max +: live).distinct
      if (compacted.size < vs.size) versions.put(compacted.toArray)
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      if (wait.nonEmpty) getHandle.registerTimer(wait.map(_._1).min)
      out
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val batch = rows.toArray
      val dims = batch.filter(_.kind == 0)
      if (dims.nonEmpty)
        versions.appendList(dims.map(d => (d.ts.getTime, d.id)))
      val events = batch.filter(_.kind == 1)
      if (events.nonEmpty) {
        pending.appendList(events.map(e => (e.ts.getTime, e.id)))
        EventTimeTimers.slideBackward(getHandle,
          events.map(_.ts.getTime).min)
      }
      // resolve against the PREVIOUS batch's certified watermark too: a
      // batch can both deliver rows and have ripe pending from before
      resolve(key, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] =
      resolve(key, timerValues.getCurrentWatermarkInMs())
  }

  /** Start the enrichment over an EVENT stream `(key, ts, event_id)` and a
    * DIMENSION-UPDATE stream `(key, ts, id)` (both streaming; column names
    * per the parameters). Returns the enriched append stream — one row per
    * event with its final `asof_id` (None when no version precedes),
    * emitted once the watermark passes the event. Requires the RocksDB
    * state store provider. */
  def enrichLatestPreceding(
      events: DataFrame,
      dims: DataFrame,
      key: String = "key",
      tsCol: String = "ts",
      eventIdCol: String = "event_id",
      dimIdCol: String = "id",
      watermarkDelay: String = "10 seconds"): Dataset[Out] = {
    import events.sparkSession.implicits._
    val e = events.select(col(key).as("key"),
      col(tsCol).cast("timestamp").as("ts"), lit(1).as("kind"),
      col(eventIdCol).as("id"))
    val d = dims.filter(col(dimIdCol).isNotNull)
      .select(col(key).as("key"),
        col(tsCol).cast("timestamp").as("ts"), lit(0).as("kind"),
        col(dimIdCol).as("id"))
    e.unionByName(d)
      .withWatermark("ts", watermarkDelay)
      .as[In]
      .groupByKey(_.key)
      .transformWithState(
        new LatestPrecedingProcessor,
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
