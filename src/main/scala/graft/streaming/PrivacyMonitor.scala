package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous k-anonymity alarm: each completed event-time window of a
  * stream is profiled over its quasi-identifier columns
  * ([[graft.ops.Audit.kAnonymity]]'s class math), emitting one
  * `(window_start, window_end, n_rows, n_classes, min_k, n_unique_rows,
  * n_risky_rows, risky_ppm)` row per finalized window — the release gate
  * run CONTINUOUSLY on an ingest feed, so a source that starts shipping
  * re-identifiable slices (a misconfigured upstream dropping its
  * generalization step) alarms within a window, not at the next batch
  * audit.
  *
  * Shape mirrors [[DriftMonitor]]: ONE watermarked windowed count
  * aggregate keyed by (window, QI tuple) — state bounded by open windows ×
  * distinct QI tuples, append mode emits each window's classes exactly
  * once — and the O(#classes) risk profile runs in `foreachBatch` over
  * just the classes the trigger finalized, as ONE multi-row frame per
  * batch (one profile row per finalized window, like [[EmbedDrift]]) so a
  * sink deduplicating on batchId alone — the common exactly-once idiom —
  * sees every window. Replay after a restart re-emits only
  * not-yet-committed windows; pair `out` with an idempotent sink keyed on
  * (batchId) or (window_start) for exactly-once alerting.
  */
object PrivacyMonitor {

  /** Start monitoring `events` (`tsCol` event time) over QI columns `qi`
    * with [[graft.ops.Audit.kAnonymity]]'s `threshold` semantics. Each
    * trigger with finalized windows calls `out` ONCE with a frame holding
    * one profile row per finalized window (ordered by window_start) and
    * the batch id. */
  def start(
      events: DataFrame,
      tsCol: String,
      qi: Seq[String],
      windowDuration: String,
      threshold: Long,
      checkpoint: String,
      watermarkDelay: String = "10 seconds")(
      out: (DataFrame, Long) => Unit): StreamingQuery = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(!qi.exists(Set("__k", "__ts", "w")),
      "QI columns __k/__ts/w collide with internal aliases — rename first")
    require(threshold >= 2, s"threshold must be >= 2: $threshold")
    events
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(window(col("__ts"), windowDuration).as("w") +: qi.map(col): _*)
      .agg(count(lit(1)).as("__k"))
      .writeStream
      .outputMode("append") // a window's classes arrive once, finalized
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val finalized = batch.select(col("w.start").as("ws"),
          col("w.end").as("we"), col("__k"))
        // one grouped aggregate → one profile row per finalized window,
        // emitted as a single frame (profiles are O(#windows) rows —
        // the localCheckpoint is a tiny-result cache for the sink)
        val profiles = graft.ops.Audit.kAnonymityOfClassesBy(
            finalized, Seq("ws", "we"), threshold)
          .select(col("ws").as("window_start"), col("we").as("window_end"),
            col("n_rows"), col("n_classes"), col("min_k"),
            col("n_unique_rows"), col("n_risky_rows"), col("risky_ppm"))
          .orderBy("window_start")
          .localCheckpoint()
        if (profiles.head(1).nonEmpty) out(profiles, batchId)
        ()
      }
      .start()
  }
}
