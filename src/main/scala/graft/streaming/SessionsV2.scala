package graft.streaming

import graft.model.Event
import graft.streaming.StatefulSessions.{InEvent, SessionOut, SessionState}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** The [[StatefulSessions]] semantics re-expressed on Spark 4's
  * `transformWithState` arbitrary-state API (StatefulProcessor + typed
  * ValueState + event-time timers), the successor to
  * `flatMapGroupsWithState`:
  *
  *  - per-key state is a named, typed `ValueState[SessionState]` in the
  *    state store (RocksDB provider), not an opaque GroupState blob —
  *    multiple named states and per-state TTL become possible;
  *  - inactivity close is an explicit registered timer (watermark-driven),
  *    replacing `GroupStateTimeout.EventTimeTimeout`'s single implicit
  *    timeout; stale timers are deleted on re-registration.
  *
  * `SessionsV2Spec` feeds both implementations the same MemoryStream input
  * and asserts identical closed-session output — the new API must
  * reproduce the old semantics exactly.
  */
object SessionsV2 {

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, InEvent, SessionOut] {

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    private def closeOut(
        user: String, s: SessionState, why: String): SessionOut =
      SessionOut(user, s.startMs, s.lastMs, s.nEvents, s.nViews, why)

    override def handleInputRows(
        user: String,
        rows: Iterator[InEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.event_ts.getTime, e.event_name))
      var cur: Option[SessionState] =
        if (state.exists()) Some(state.get()) else None
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val ts = e.event_ts.getTime
        val isView = e.event_name == Event.ItemViewName
        cur = cur match {
          case Some(s) if ts - s.lastMs > gapMs =>
            closed += closeOut(user, s, "gap")
            Some(SessionState(ts, ts, 1, if (isView) 1 else 0))
          case Some(s) =>
            Some(s.copy(
              startMs = math.min(s.startMs, ts),
              lastMs = math.max(s.lastMs, ts),
              nEvents = s.nEvents + 1,
              nViews = s.nViews + (if (isView) 1 else 0)))
          case None =>
            Some(SessionState(ts, ts, 1, if (isView) 1 else 0))
        }
        if (e.event_name == Event.SignOutName) {
          cur.foreach(s => closed += closeOut(user, s, "sign_out"))
          cur = None
        }
      }
      // re-arm: exactly one live timer per key, at lastMs + gap
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      cur match {
        case Some(s) =>
          state.update(s)
          getHandle.registerTimer(s.lastMs + gapMs)
        case None => state.clear()
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(
        user: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      if (state.exists()) {
        val s = state.get()
        // only the timer armed for the CURRENT session end may close it
        if (expiredTimerInfo.getExpiryTimeInMs >= s.lastMs + gapMs) {
          state.clear()
          Iterator.single(closeOut(user, s, "timeout"))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** Same contract as [[StatefulSessions.sessionize]]; requires the
    * RocksDB state store provider (set by callers/specs via
    * `spark.sql.streaming.stateStore.providerClass`). */
  def sessionize(
      events: DataFrame,
      watermark: String = "10 minutes",
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_ts", watermark)
      .select("user_id", "event_name", "event_ts")
      .where("user_id IS NOT NULL")
      .as[InEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
