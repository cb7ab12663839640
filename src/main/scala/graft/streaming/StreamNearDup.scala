package graft.streaming

import java.time.Duration

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** Streaming NEAR-duplicate detection — the cross-batch face of the batch
  * MinHash+LSH pipeline (`Dedup.minhashNearDups`): continuous ingestion
  * has to flag an arriving document that near-duplicates one seen N
  * micro-batches ago, without ever holding all pairs.
  *
  * Shape: per document a k-row MinHash signature, banded LSH keys exactly
  * as in batch; the stream is keyed BY BAND, and per band a
  * `transformWithState` ListState holds the (doc_id, signature) of
  * documents whose window landed in that band — so comparisons happen
  * only WITHIN colliding buckets (the LSH contract: never all-pairs) and
  * the per-band state is TTL-evicted, bounding memory to the trailing
  * window exactly like [[StreamDedup]]. An arriving document is compared
  * against its bucket's survivors (and earlier arrivals of the same
  * batch, in doc_id order); a signature agreement ≥ the threshold emits a
  * `(doc_id, dup_of, est_ppm)` pair. A true near-dup pair can collide in
  * several bands and emit once per band — consumers take `distinct` on
  * (doc_id, dup_of); within one band each pair emits once.
  *
  * The honest trades, same as batch LSH + [[StreamDedup]]: probabilistic
  * recall (a near-dup pair missing every band collision is missed), and
  * a duplicate arriving later than TTL is not flagged. */
object StreamNearDup {

  final case class BandDoc(band: String, doc_id: Long, sig: Seq[Long])
  final case class Entry(doc_id: Long, sig: Seq[Long])
  final case class DupPair(doc_id: Long, dup_of: Long, est_ppm: Long)

  /** The in-bucket compare-and-append shared by both processors: each
    * batch document (already doc_id-sorted) compares against the bucket's
    * survivors plus earlier same-batch arrivals, emits pairs at/above the
    * threshold, and appends itself to the bucket. */
  private def compareAndAppend(
      seen: ListState[Entry],
      batch: Array[(Long, Seq[Long])],
      minEstPpm: Long,
      sigK: Int): Iterator[DupPair] = {
    def estPpm(a: Seq[Long], b: Seq[Long]): Long = {
      var eq = 0
      var i = 0
      while (i < sigK) { if (a(i) == b(i)) eq += 1; i += 1 }
      (2L * 1000000L * eq + sigK) / (2L * sigK) // round-half-up
    }
    val prior = scala.collection.mutable.ArrayBuffer.empty[Entry]
    seen.get().foreach(e => prior += e)
    val out = Seq.newBuilder[DupPair]
    batch.foreach { case (docId, sig) =>
      prior.foreach { e =>
        if (e.doc_id != docId) {
          val est = estPpm(sig, e.sig)
          if (est >= minEstPpm) out += DupPair(docId, e.doc_id, est)
        }
      }
      val entry = Entry(docId, sig)
      prior += entry
      seen.appendValue(entry)
    }
    out.result().iterator
  }

  class BandProcessor(ttl: Duration, minEstPpm: Long, sigK: Int)
      extends StatefulProcessor[String, BandDoc, DupPair] {

    @transient private var seen: ListState[Entry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Entry](
        "band_docs", Encoders.product[Entry], new TTLConfig(ttl))

    override def handleInputRows(
        key: String,
        rows: Iterator[BandDoc],
        timerValues: TimerValues): Iterator[DupPair] =
      compareAndAppend(seen,
        rows.toArray.sortBy(_.doc_id).map(d => (d.doc_id, d.sig)),
        minEstPpm, sigK) // doc_id sort: deterministic in-batch order

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DupPair] =
      Iterator.empty // TTL eviction is native to the state
  }

  /** Flag near-duplicate arrivals on a streaming `(doc_id, text)` frame.
    * `sigK` MinHash rows split into `bands` bands (`sigK % bands == 0`);
    * collisions are compared exactly and emitted when the estimated
    * similarity reaches `minEstPpm`. Requires the RocksDB state store
    * provider; same trigger note as [[StreamDedup]]. */
  def flagNearDups(
      docs: DataFrame,
      sigK: Int = 16,
      bands: Int = 4,
      ttl: Duration = Duration.ofHours(24),
      minEstPpm: Long = 600000L): Dataset[DupPair] = {
    require(sigK % bands == 0, s"sigK ($sigK) must divide into bands ($bands)")
    import docs.sparkSession.implicits._
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sig", TextOps.minhashSignature(
        TextOps.shingleHashes(TextOps.shingles3(col("toks"))), sigK))
      .withColumn("bk", TextOps.bandKeys(col("sig"), bands, sigK / bands))
      .select(col("doc_id"), col("sig"), posexplode(col("bk")).as(Seq("bi", "key")))
      .select(concat_ws("#", col("bi"), col("key")).as("band"),
        col("doc_id"), col("sig"))
      .as[BandDoc]
      .groupByKey(_.band)
      .transformWithState(
        new BandProcessor(ttl, minEstPpm, sigK),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  final case class BandDocT(band: String, doc_id: Long, sig: Seq[Long],
      ts: java.sql.Timestamp)

  /** Event-time twin of [[BandProcessor]] — same in-bucket comparison, but
    * eviction is a watermark-driven timer (band silent for `ttl` of EVENT
    * time → whole bucket cleared) instead of per-entry processing-time
    * TTL, so checkpoint replay reproduces identical flag decisions (see
    * [[StreamDedup.FirstSeenEventTimeProcessor]]). The per-BAND granularity
    * is deliberately coarser than the per-entry TTL: a band any of whose
    * documents keeps arriving stays whole — still bounded by the trailing
    * window, deterministic, and strictly more conservative about
    * forgetting (never evicts an entry the per-entry policy would keep). */
  class BandEventTimeProcessor(ttl: Duration, minEstPpm: Long, sigK: Int)
      extends StatefulProcessor[String, BandDocT, DupPair] {

    @transient private var seen: ListState[Entry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Entry](
        "band_docs", Encoders.product[Entry], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[BandDocT],
        timerValues: TimerValues): Iterator[DupPair] = {
      val batch = rows.toArray.sortBy(_.doc_id) // deterministic in-batch order
      // forward-only: a late-only batch must not pull the band's eviction
      // earlier than newest-event + ttl (see EventTimeTimers)
      EventTimeTimers.slideForward(
        getHandle, batch.map(_.ts.getTime).max + ttl.toMillis)
      compareAndAppend(seen, batch.map(d => (d.doc_id, d.sig)),
        minEstPpm, sigK)
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DupPair] = {
      seen.clear() // the band was silent past ttl in EVENT time
      Iterator.empty
    }
  }

  /** [[flagNearDups]] with deterministic event-time eviction: `docs` must
    * carry an event-time column `tsCol`; a band silent for `ttl` of event
    * time (watermark-certified) forgets its bucket, and checkpoint replay
    * reproduces identical flag decisions. */
  def flagNearDupsEventTime(
      docs: DataFrame,
      tsCol: String = "ts",
      sigK: Int = 16,
      bands: Int = 4,
      ttl: Duration = Duration.ofHours(24),
      minEstPpm: Long = 600000L,
      watermarkDelay: String = "10 seconds"): Dataset[DupPair] = {
    require(sigK % bands == 0, s"sigK ($sigK) must divide into bands ($bands)")
    import docs.sparkSession.implicits._
    docs
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermarkDelay)
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sig", TextOps.minhashSignature(
        TextOps.shingleHashes(TextOps.shingles3(col("toks"))), sigK))
      .withColumn("bk", TextOps.bandKeys(col("sig"), bands, sigK / bands))
      .select(col("doc_id"), col("sig"), col("__ts").as("ts"),
        posexplode(col("bk")).as(Seq("bi", "key")))
      .select(concat_ws("#", col("bi"), col("key")).as("band"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandDocT]
      .groupByKey(_.band)
      .transformWithState(
        new BandEventTimeProcessor(ttl, minEstPpm, sigK),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
