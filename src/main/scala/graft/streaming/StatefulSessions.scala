package graft.streaming

import java.sql.Timestamp

import graft.model.Event
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Custom-state sessionization: sign_in → activity → sign_out per user, with
  * an event-time timeout closing sign_out-less sessions (SURVEY.md §7.4 #3 —
  * the reference never implements its stated sessionization purpose).
  *
  * Unlike `session_window` (gap-only), this models the *semantic* session:
  * a sign_out closes the session immediately; otherwise the watermark
  * advancing past `gapMs` of inactivity closes it via timeout. State per key
  * is O(1) (running counters, not buffered events) and is dropped on close —
  * the 100 TB posture is bounded state keyed by active users only.
  */
object StatefulSessions {

  case class SessionState(
      startMs: Long,
      lastMs: Long,
      nEvents: Long,
      nViews: Long)

  case class SessionOut(
      user_id: String,
      start_ms: Long,
      end_ms: Long,
      n_events: Long,
      n_views: Long,
      closed_by: String)

  case class InEvent(user_id: String, event_name: String, event_ts: Timestamp)

  /** `events` must carry union-schema columns + a typed `event_ts`
    * (EventDecode output). The watermark is applied here — it must cover the
    * column that feeds the event-time timeout. */
  def sessionize(
      events: DataFrame,
      watermark: String = "10 minutes",
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val typed = events
      .withWatermark("event_ts", watermark)
      .select("user_id", "event_name", "event_ts")
      .where("user_id IS NOT NULL")
      .as[InEvent]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(
              user, s.startMs, s.lastMs, s.nEvents, s.nViews, "timeout"))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.event_ts.getTime, e.event_name))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val ts = e.event_ts.getTime
              val isView = e.event_name == Event.ItemViewName
              cur = cur match {
                case Some(s) if ts - s.lastMs > gapMs =>
                  // inactivity gap within the batch: close and start fresh
                  closed += SessionOut(
                    user, s.startMs, s.lastMs, s.nEvents, s.nViews, "gap")
                  Some(SessionState(ts, ts, 1, if (isView) 1 else 0))
                case Some(s) if s.startMs - ts > gapMs =>
                  // a late event more than a whole gap BEFORE the open
                  // session belongs to an earlier, already-elapsed session
                  // — folding it in would report one session spanning an
                  // internal silence longer than the gap; emit it as its
                  // own closed singleton and leave the open session alone
                  closed += SessionOut(
                    user, ts, ts, 1, if (isView) 1 else 0, "gap")
                  Some(s)
                case Some(s) =>
                  // late (within-watermark) events from an earlier batch
                  // may arrive with ts < lastMs — fold them in; a start
                  // moving BACKWARDS (to a late event within one gap of
                  // it) is correct session semantics, the same merge
                  // Spark's own session_window performs
                  Some(s.copy(
                    startMs = math.min(s.startMs, ts),
                    lastMs = math.max(s.lastMs, ts),
                    nEvents = s.nEvents + 1,
                    nViews = s.nViews + (if (isView) 1 else 0)))
                case None =>
                  Some(SessionState(ts, ts, 1, if (isView) 1 else 0))
              }
              if (e.event_name == Event.SignOutName) {
                cur.foreach { s =>
                  closed += SessionOut(
                    user, s.startMs, s.lastMs, s.nEvents, s.nViews, "sign_out")
                }
                cur = None
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.lastMs + gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
