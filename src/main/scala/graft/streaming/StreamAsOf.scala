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

  /** State and comparisons run in MICROSECONDS — `Timestamp.getTime` is
    * millis and truncating would both emit truncated timestamps and break
    * batch-equality for sub-millisecond data (a version at …000900µs must
    * NOT match an event at …000500µs). Timers and the watermark are a
    * millisecond API, so timer registration rounds UP (a timer must never
    * fire before its event is certifiably resolvable) and the resolvable
    * floor is `wmMs * 1000` (the watermark certifies nothing older than
    * wmMs arrives; anything ≤ that instant in micros is final). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def ceilDivMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)

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

    /** Versions at-or-before the FLOOR collapse to the single latest —
      * the only one any still-answerable event can need. The floor is the
      * watermark, lowered to the oldest pending event when one is waiting
      * (its lookup still needs the exact history at its own ts). Runs on
      * every input batch too, so a dim-hot / event-cold key stays bounded
      * instead of accreting history until an event happens by. */
    private def compact(wmUs: Long, pendingMin: Option[Long]): Unit = {
      val floor = pendingMin.fold(wmUs)(p => math.min(wmUs, p - 1))
      val vs = versions.get().toSeq
      val (old, live) = vs.partition(_._1 <= floor)
      val compacted = (if (old.isEmpty) live else old.max +: live).distinct
      if (compacted.size < vs.size) versions.put(compacted.toArray)
    }

    /** Emit every pending event the watermark has passed (all state in
      * micros; `wmUs = wmMs * 1000`); compact the version history; keep
      * the timer at the earliest still-pending event (ms, rounded UP). */
    private def resolve(key: Long, wmUs: Long): Iterator[Out] = {
      val pend = pending.get().toSeq
      val (ripe, wait) = pend.partition(_._1 <= wmUs)
      if (ripe.isEmpty) { compact(wmUs, pend.map(_._1).minOption); return Iterator.empty }
      val vs = versions.get().toSeq
      val out = ripe.sorted.iterator.map { case (ets, eid) =>
        Out(eid, key, toTimestamp(ets), lookup(vs, ets))
      }
      if (wait.isEmpty) pending.clear() else pending.put(wait.toArray)
      compact(wmUs, wait.map(_._1).minOption)
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      if (wait.nonEmpty) getHandle.registerTimer(ceilDivMs(wait.map(_._1).min))
      out
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val batch = rows.toArray
      val dims = batch.filter(_.kind == 0)
      if (dims.nonEmpty)
        versions.appendList(dims.map(d => (micros(d.ts), d.id)))
      val events = batch.filter(_.kind == 1)
      if (events.nonEmpty) {
        pending.appendList(events.map(e => (micros(e.ts), e.id)))
        EventTimeTimers.slideBackward(getHandle,
          ceilDivMs(events.map(e => micros(e.ts)).min))
      }
      // resolve against the PREVIOUS batch's certified watermark too: a
      // batch can both deliver rows and have ripe pending from before
      resolve(key, timerValues.getCurrentWatermarkInMs() * 1000L)
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] =
      resolve(key, timerValues.getCurrentWatermarkInMs() * 1000L)
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
    // Null-timestamp discipline MIRRORS the batch op (q168's pinned
    // rules; the streaming path would otherwise NPE in micros() or drop
    // rows at the watermark operator, silently diverging from batch):
    //  - a null-ts DIM VERSION can never satisfy any ≤ comparison — drop
    //    it before the union, exactly as unionTagged does;
    //  - a null-ts EVENT has no match by definition but IS emitted (left
    //    rows survive with asof_id = null). It also has no event time for
    //    the watermark to certify, so it bypasses the stateful path and
    //    emits immediately on a stateless branch — same final answer the
    //    batch op gives, just not watermark-delayed.
    val e = events.filter(col(tsCol).isNotNull)
      .select(col(key).as("key"),
        col(tsCol).cast("timestamp").as("ts"), lit(1).as("kind"),
        col(eventIdCol).as("id"))
    val d = dims.filter(col(dimIdCol).isNotNull && col(tsCol).isNotNull)
      .select(col(key).as("key"),
        col(tsCol).cast("timestamp").as("ts"), lit(0).as("kind"),
        col(dimIdCol).as("id"))
    val resolved = e.unionByName(d)
      .withWatermark("ts", watermarkDelay)
      .as[In]
      .groupByKey(_.key)
      .transformWithState(
        new LatestPrecedingProcessor,
        TimeMode.EventTime(),
        OutputMode.Append())
    val nullTsEvents = events.filter(col(tsCol).isNull)
      .select(col(eventIdCol).cast("long").as("event_id"),
        col(key).cast("long").as("key"),
        lit(null).cast("timestamp").as("ts"),
        lit(null).cast("long").as("asof_id"))
      .as[Out]
    resolved.union(nullTsEvents)
  }
}
