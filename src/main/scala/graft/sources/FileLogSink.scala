package graft.sources

import org.apache.spark.sql.DataFrame

/** Producer half of the file-backed transport: publishes a kafka-shaped
  * `(key binary, value binary)` DataFrame (e.g.
  * [[graft.io.ConfluentAvro.catalogFrames]] output) into a [[FileLog]]
  * directory as one atomic segment per call — the broker hop of the
  * reference's produce path (/root/reference/services/kafka_event_publisher.py:42-55),
  * minus the network.
  *
  * The rows stream to the driver (`toLocalIterator` — one partition in
  * memory at a time) because the log directory is a single-writer local
  * stand-in for a broker; against real Kafka the executor-side framed
  * partitions would be produced directly from the executors and this hop
  * disappears. Use from `foreachBatch` for a streaming producer: each
  * micro-batch becomes one segment, so downstream `graft-log` consumers see
  * micro-batch-atomic appends.
  */
object FileLogSink {

  /** Append every (key, value) row as one segment; returns the record
    * count (0 appends nothing). Rows stream straight from the partition
    * iterator into the segment file — nothing beyond the in-flight
    * partition is ever resident on the driver. */
  def publish(frames: DataFrame, dir: String, tsMicros: Long = 0L): Long = {
    var n = 0L
    val it = new Iterator[FileLog.Record] {
      private val rows = frames.select("key", "value").toLocalIterator()
      override def hasNext: Boolean = rows.hasNext
      override def next(): FileLog.Record = {
        val r = rows.next()
        n += 1
        FileLog.Record(
          r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"), tsMicros)
      }
    }
    FileLog.append(dir, it)
    n
  }
}
