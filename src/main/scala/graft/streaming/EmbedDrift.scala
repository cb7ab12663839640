package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Pca

/** Continuous EMBEDDING-distribution drift alarm — [[DriftMonitor]]'s
  * vector twin: each completed event-time window of an embedding stream is
  * reduced to its second moments ([[Pca.MomentsAgg]] riding the windowed
  * aggregate, O(d²) state per open window) and compared against a FIXED
  * reference [[Pca.Moments]], emitting one
  * `(window_start, window_end, n_window, mean_l2, trace_ratio)` row per
  * finalized window: `mean_l2` is the L2 distance between the window's
  * mean vector and the reference mean (a retrained/swapped embedding
  * model, an upstream normalization change, or a source mix shift moves
  * the centroid long before any scalar aggregate trips), `trace_ratio`
  * the window's total variance over the reference's (collapse toward the
  * centroid — a stuck encoder emitting near-constant vectors — drives it
  * toward 0; an exploding one drives it up).
  *
  * Shape: ONE watermarked windowed aggregate whose state is the moments
  * buffer, not the vectors — per open window d + d(d+1)/2 doubles
  * regardless of event volume; append mode emits each window exactly once
  * when the watermark passes its end, and the driver-side comparison is
  * O(d²) per finalized window. Replay: checkpointed and watermark-driven,
  * so a killed-and-restarted query re-emits exactly the not-yet-committed
  * windows — pair `out` with an idempotent sink keyed on window_start.
  *
  * Windows with n < 2 carry no variance: they emit with `trace_ratio`
  * null (mean_l2 is still defined for n = 1) rather than being dropped —
  * a near-empty window is itself a signal.
  */
object EmbedDrift {

  /** Start monitoring `vecs` (`tsCol` event time, `vecCol` an
    * array<float|double> column of dimension `dim`). `ref` is the
    * reference corpus' moments (one [[Pca.moments]] call). Each finalized
    * window calls `out` with the comparison frame and the batch id. */
  def start(
      vecs: DataFrame,
      tsCol: String,
      vecCol: String,
      dim: Int,
      windowDuration: String,
      ref: Pca.Moments,
      checkpoint: String,
      watermarkDelay: String = "10 seconds")(
      out: (DataFrame, Long) => Unit): StreamingQuery = {
    require(ref.n >= 2, s"reference needs n >= 2, got ${ref.n}")
    require(ref.sum.length == dim,
      s"reference moments were built for dim ${ref.sum.length}, stream is " +
        s"$dim — a mismatched triangle layout reads the wrong gram slots " +
        "and every ratio would be silently wrong")
    val spark = vecs.sparkSession
    val refMean = ref.sum.map(_ / ref.n).toArray
    val refTrace = {
      val c = Pca.covariance(ref, dim)
      (0 until dim).map(i => c(i)(i)).sum
    }
    require(refTrace > 0, "reference variance is zero — every ratio is undefined")
    val momentsUdaf =
      udaf(new Pca.MomentsAgg(dim), ExpressionEncoder[Seq[Double]]())

    val prepped = vecs
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermarkDelay)
    // vector prep rides Pca.cleanVecs — ONE null-handling contract shared
    // with the batch reference, so the two sides can never diverge
    Pca.cleanVecs(prepped, vecCol, "__v")
      .select("__ts", "__v")
      .groupBy(window(col("__ts"), windowDuration).as("w"))
      .agg(momentsUdaf(col("__v")).as("m"))
      .writeStream
      .outputMode("append") // a window's moments arrive once, finalized
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // bounded driver loop: the windows one trigger finalizes, each an
        // O(d²) struct — never the vectors
        val rows = batch.select(col("w.start").as("ws"), col("w.end").as("we"),
          col("m.n"), col("m.sum"), col("m.gram")).collect()
          .sortBy(_.getTimestamp(0).getTime)
        val compared = rows.map { r =>
          val n = r.getLong(2)
          val sum = r.getSeq[Double](3)
          val gram = r.getSeq[Double](4)
          val meanL2 = math.sqrt(
            (0 until dim).map { i =>
              val d = sum(i) / n - refMean(i); d * d
            }.sum)
          val traceRatio: java.lang.Double =
            if (n < 2) null
            else {
              // one tested triangle-indexing formula: the window's trace
              // comes from the same Pca.covariance the reference used
              val c = Pca.covariance(
                Pca.Moments(n, sum.toVector, gram.toVector), dim)
              (0 until dim).map(i => c(i)(i)).sum / refTrace
            }
          Row(r.getTimestamp(0), r.getTimestamp(1), n,
            math.rint(meanL2 * 1e6) / 1e6,
            if (traceRatio == null) null
            else math.rint(traceRatio * 1e6) / 1e6)
        }
        if (compared.nonEmpty) {
          import org.apache.spark.sql.types._
          val schema = StructType(Seq(
            StructField("window_start", TimestampType),
            StructField("window_end", TimestampType),
            StructField("n_window", LongType),
            StructField("mean_l2", DoubleType),
            StructField("trace_ratio", DoubleType)))
          // LocalRelation, not parallelize: a handful of already-collected
          // driver rows must not schedule a cluster job per trigger on the
          // alerting hot path
          out(spark.createDataFrame(
            java.util.Arrays.asList(compared: _*), schema), batchId)
        }
        ()
      }
      .start()
  }
}
