package graft.streaming

import org.apache.spark.sql.streaming.StatefulProcessorHandle

/** Shared timer discipline for the event-time TTL processors: the eviction
  * timer only ever slides FORWARD. A late row (event time older than the
  * key's newest) must not pull the timer earlier — naively re-registering
  * `batchMax + ttl` after a late-only batch would evict the key less than
  * ttl after its newest event, re-admitting duplicates (or losing near-dup
  * recall) inside the promised window. */
private[streaming] object EventTimeTimers {

  /** Ensure exactly one live timer at `max(existing timers, candidate)`. */
  def slideForward(handle: StatefulProcessorHandle, candidate: Long): Unit = {
    val existing = handle.listTimers().toSeq
    val target = (candidate +: existing).max
    existing.filterNot(_ == target).foreach(handle.deleteTimer)
    if (!existing.contains(target)) handle.registerTimer(target)
  }

  /** Ensure exactly one live timer at `min(existing timers, candidate)` —
    * the resolve-EARLIEST discipline of buffering processors
    * ([[StreamAsOf]]): the timer must fire as soon as the watermark passes
    * the oldest buffered row, and a newly buffered older row must pull the
    * timer back. */
  def slideBackward(handle: StatefulProcessorHandle, candidate: Long): Unit = {
    val existing = handle.listTimers().toSeq
    val target = (candidate +: existing).min
    existing.filterNot(_ == target).foreach(handle.deleteTimer)
    if (!existing.contains(target)) handle.registerTimer(target)
  }
}
