package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Exact cross-batch streaming deduplication with bounded state — the
  * missing piece between batch [[graft.ops.Dedup.exact]] and continuous
  * ingestion: the curation pipeline dedups within each micro-batch, but a
  * duplicate arriving N batches after the original needs per-key state
  * that survives batches, and at 100 TB/∞ time that state must not grow
  * forever.
  *
  * Shape: keys are the 60-bit content hash of `text` (the same
  * engine-agnostic h60 the batch dedup family uses), so the STATE STORE
  * holds only an 8-byte key → first-seen id per document ever seen — the
  * long-lived cost. The per-batch exchange necessarily carries the full
  * rows (survivors are emitted with their text), i.e. shuffle volume
  * tracks the ingest rate while state volume tracks distinct keys. Per
  * key a
  * `transformWithState` ValueState holds the first-seen doc_id with a
  * native per-state TTL (RocksDB provider): a key silent for `ttl` is
  * evicted, which is the state bound — total state ≈ distinct keys seen in
  * the trailing TTL window. The honest trade-off is the same one Spark's
  * own `dropDuplicatesWithinWatermark` makes: a duplicate arriving more
  * than `ttl` after its original is re-admitted as new.
  *
  * First-seen semantics within a batch are deterministic: the lowest
  * doc_id in the batch wins (the keep-first policy of the batch family),
  * not arrival order.
  */
object StreamDedup {

  final case class InDoc(h: Long, doc_id: Long, text: String)
  final case class OutDoc(doc_id: Long, text: String)

  class FirstSeenProcessor(ttl: Duration)
      extends StatefulProcessor[Long, InDoc, OutDoc] {

    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long](
        "first_seen_doc", Encoders.scalaLong, new TTLConfig(ttl))

    override def handleInputRows(
        key: Long,
        rows: Iterator[InDoc],
        timerValues: TimerValues): Iterator[OutDoc] =
      if (seen.exists()) {
        rows.foreach(_ => ()) // drain: all duplicates of a known key
        Iterator.empty
      } else {
        val first = rows.minBy(_.doc_id)
        seen.update(first.doc_id)
        Iterator.single(OutDoc(first.doc_id, first.text))
      }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OutDoc] =
      Iterator.empty // TTL eviction is native to the state, no timers
  }

  /** Streaming `(doc_id, text)` → first occurrence of each distinct text,
    * exactly once per `ttl` window, duplicates dropped across micro-batches.
    * Requires the RocksDB state store provider (transformWithState).
    *
    * Trigger note: in ProcessingTime mode Spark schedules no-data
    * micro-batches after every batch (the operator always reports
    * "requires another batch" so processing-time timers could fire), which
    * with the default as-fast-as-possible trigger is a busy loop. TTL
    * expiry here is enforced at state READ time — an expired key simply
    * reads as absent — so those extra batches add nothing: run the query
    * with a real trigger interval, or set
    * `spark.sql.streaming.noDataMicroBatches.enabled=false`. */
  def dropDuplicatesWithTTL(
      docs: DataFrame,
      ttl: Duration = Duration.ofHours(24)): Dataset[OutDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(
        graft.ops.TextOps.h60(col("text")).as("h"),
        col("doc_id"), col("text"))
      .as[InDoc]
      .groupByKey(_.h)
      .transformWithState(
        new FirstSeenProcessor(ttl),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  final case class InDocT(h: Long, doc_id: Long, text: String,
      ts: java.sql.Timestamp)

  /** Event-time twin of [[FirstSeenProcessor]]. The processing-time TTL
    * above evicts on wall-clock silence, which makes checkpoint REPLAY
    * nondeterministic: a replayed batch runs at a later wall-clock, so a
    * key evicted in the original run may still be live in the replay (or
    * vice versa) and the same input can produce different drop decisions.
    * Here eviction is a WATERMARK decision — a timer slides to the key's
    * newest event time + ttl and fires when the watermark passes it. The
    * watermark is computed from the data and checkpointed per batch, so a
    * killed-and-restarted query reproduces the exact eviction (and
    * therefore drop/emit) sequence. */
  class FirstSeenEventTimeProcessor(ttl: Duration)
      extends StatefulProcessor[Long, InDocT, OutDoc] {

    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long](
        "first_seen_doc", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[InDocT],
        timerValues: TimerValues): Iterator[OutDoc] = {
      val batch = rows.toArray
      // slide this key's eviction timer FORWARD to newest-event + ttl (one
      // live timer per key; a late-only batch must not pull it back —
      // input rows are processed before expired timers, so a just-expired
      // key drops one final duplicate in the same batch, identically in
      // original and replayed runs)
      EventTimeTimers.slideForward(
        getHandle, batch.map(_.ts.getTime).max + ttl.toMillis)
      if (seen.exists()) {
        Iterator.empty // all duplicates of a known key
      } else {
        val first = batch.minBy(_.doc_id)
        seen.update(first.doc_id)
        Iterator.single(OutDoc(first.doc_id, first.text))
      }
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OutDoc] = {
      seen.clear() // the key was silent past ttl in EVENT time
      Iterator.empty
    }
  }

  /** [[dropDuplicatesWithTTL]] with deterministic event-time eviction: a
    * key unseen for `ttl` of EVENT time (as certified by the watermark) is
    * forgotten and its next occurrence re-admitted. `docs` must carry an
    * event-time column `tsCol`; `watermarkDelay` is the usual lateness
    * allowance. State stays bounded by the distinct keys of the trailing
    * ttl window of event time — and unlike the processing-time variant,
    * checkpoint replay reproduces identical drop decisions. */
  def dropDuplicatesWithEventTimeTTL(
      docs: DataFrame,
      tsCol: String = "ts",
      ttl: Duration = Duration.ofHours(24),
      watermarkDelay: String = "10 seconds"): Dataset[OutDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(
        graft.ops.TextOps.h60(col("text")).as("h"),
        col("doc_id"), col("text"), col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[InDocT]
      .groupByKey(_.h)
      .transformWithState(
        new FirstSeenEventTimeProcessor(ttl),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
