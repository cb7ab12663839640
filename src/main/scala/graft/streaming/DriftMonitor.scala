package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous distributional drift alarm: each completed event-time window
  * of a stream's integer metric is compared against a FIXED reference
  * distribution with the exact two-sample Kolmogorov–Smirnov statistic
  * ([[graft.ops.Stats.ksTwoSample]]), emitting one
  * `(window_start, window_end, n_window, n_ref, ks_ppm)` row per finalized
  * window — the alerting loop a 100 TB ingest pipeline runs next to its
  * ingestion: a broken emitter, price change, or bot burst shifts the
  * window's CDF long before any aggregate threshold trips.
  *
  * Shape: the stream side is ONE watermarked windowed count aggregate
  * (state bounded by open windows × distinct metric values; append mode
  * emits a window's counts exactly once, when the watermark passes its
  * end), so per-trigger work is the finalized windows' count rows — never
  * the raw events twice. The reference count table is tiny (distinct
  * metric values) and reused per window; the per-window KS runs in
  * `foreachBatch`, bounded by the handful of windows a trigger finalizes.
  *
  * Replay: the windowed aggregate is checkpointed and watermark-driven, so
  * a killed-and-restarted query re-emits exactly the not-yet-committed
  * windows — pair `out` with an idempotent sink keyed on window_start for
  * exactly-once alerting.
  */
object DriftMonitor {

  /** Start monitoring `events` (`tsCol` event time, `valueCol` integer
    * metric). `ref` is a `(v, c)` count table of the reference
    * distribution. Each finalized window calls `out` with the one-row KS
    * frame and the batch id. */
  def start(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      ref: DataFrame,
      checkpoint: String,
      watermarkDelay: String = "10 seconds")(
      out: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = events.sparkSession
    // the reference is O(distinct metric values) — hold it as DRIVER data,
    // not executor-local checkpoint blocks: localCheckpoint storage is
    // non-recomputable, so losing the holding executor days into the run
    // (spot nodes, dynamic allocation) would fail every later batch with
    // a missing-block error; a per-batch createDataFrame over the driver
    // rows is lineage-free and always reconstructible
    val refRows = ref.select(col("v").cast("long"), col("c").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq
    events
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(window(col("__ts"), windowDuration).as("w"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .writeStream
      .outputMode("append") // a window's counts arrive once, finalized
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val refCounts = spark.createDataFrame(refRows).toDF("v", "c")
        val finalized = batch.select(col("w.start").as("ws"),
          col("w.end").as("we"), col("v"), col("c")).localCheckpoint()
        // bounded driver loop: the windows one trigger finalizes
        val windows = finalized.select("ws", "we").distinct()
          .collect().sortBy(_.getTimestamp(0).getTime)
        windows.foreach { r =>
          val Seq(ws, we) = Seq(r.getTimestamp(0), r.getTimestamp(1))
          val win = finalized.filter(col("ws") === ws).select("v", "c")
          val ks = graft.ops.Stats.ksTwoSample(win, refCounts)
            .select(lit(ws).as("window_start"), lit(we).as("window_end"),
              col("n_a").as("n_window"), col("n_b").as("n_ref"),
              col("ks_ppm"))
          out(ks, batchId)
        }
        ()
      }
      .start()
  }
}
