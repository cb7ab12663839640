package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Supervised streaming execution — the reference's crash-restart loop
  * (ST3, /root/reference/services/spark_streaming_processor.py:38-59) done
  * properly: every query runs with a checkpoint location so a restart
  * resumes from committed offsets instead of reprocessing, and the
  * supervisor loop restarts on failure with a bounded retry budget.
  * (The reference's loop guards a job with no sink — ST4 — so it could
  * never actually recover anything.)
  */
object StreamRunner {

  /** Start a parquet-sink query with exactly-once file commit semantics. */
  def startParquetSink(
      df: DataFrame,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Supervise a query factory: restart on failure up to `maxRestarts`
    * times, with exponential backoff between attempts (`baseBackoffMs`
    * doubling, capped at 60s) — back-to-back retries would burn the whole
    * restart budget in milliseconds during exactly the transient outage
    * (broker down, DFS hiccup) the supervisor exists to ride out. The
    * factory must bake in a checkpointLocation for resume. */
  def supervise(maxRestarts: Int, baseBackoffMs: Long = 1000L)(
      start: () => StreamingQuery): Unit = {
    var restarts = 0
    var done = false
    while (!done) {
      try {
        // start() inside the try: a failure while (re)creating the query —
        // exactly the transient condition a supervisor exists for — must
        // consume a restart attempt, not escape the loop
        start().awaitTermination()
        done = true // clean stop
      } catch {
        case e: Exception if restarts < maxRestarts =>
          restarts += 1
          val backoff = math.min(baseBackoffMs << (restarts - 1), 60000L)
          System.err.println(
            s"[stream] query failed (${e.getMessage}); restart " +
              s"$restarts/$maxRestarts in ${backoff}ms")
          Thread.sleep(backoff)
        case e: Exception => throw e
      }
    }
  }
}
