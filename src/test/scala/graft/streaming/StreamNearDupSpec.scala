package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Cross-batch streaming near-dup: an arriving document that
  * near-duplicates one from an earlier micro-batch is flagged via banded
  * LSH state; unrelated text is not; in-batch pairs flag too. */
class StreamNearDupSpec extends SparkSpec {

  private def withRocksDB[A](body: => A): A = {
    val settings = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")
    val prev = settings.keys.map(k => k -> spark.conf.getOption(k)).toMap
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(p)) => spark.conf.set(k, p)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val base =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val nearDup = // one token changed out of 14
    "the quick brown fox jumps over the lazy cat near the quiet river bank today"
  private val unrelated =
    "distributed columnar execution engines aggregate immutable parquet partitions with pushdown"

  test("near-dup arriving batches later is flagged; unrelated text is not") {
    withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val out = StreamNearDup.flagNearDups(
        mem.toDF().toDF("doc_id", "text"), sigK = 16, bands = 8,
        ttl = java.time.Duration.ofHours(1), minEstPpm = 500000L)
      val q = out.writeStream.format("memory").queryName("neardup")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(Seq(1L -> base, 2L -> unrelated))
        q.processAllAvailable()
        mem.addData(Seq(3L -> "padding tokens only here nothing shared at all"))
        q.processAllAvailable()
        // two batches later: a near-duplicate of doc 1 arrives
        mem.addData(Seq(4L -> nearDup))
        q.processAllAvailable()

        val pairs = spark.table("neardup").collect()
          .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
        assert(pairs.contains(4L -> 1L),
          s"cross-batch near-dup must be flagged, got $pairs")
        assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
          s"unrelated doc must not pair: $pairs")
        val est = spark.table("neardup").collect()
          .filter(r => r.getLong(0) == 4L).map(_.getLong(2)).max
        assert(est >= 500000L && est <= 1000000L, s"est_ppm sane: $est")
      } finally q.stop()
    }
  }

  test("exact duplicate in the SAME batch pairs deterministically (new -> lower id)") {
    withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val out = StreamNearDup.flagNearDups(
        mem.toDF().toDF("doc_id", "text"),
        ttl = java.time.Duration.ofHours(1), minEstPpm = 900000L)
      val q = out.writeStream.format("memory").queryName("neardup_batch")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(Seq(7L -> base, 5L -> base))
        q.processAllAvailable()
        val pairs = spark.table("neardup_batch").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).distinct
        assert(pairs.toSeq.map(p => (p._1, p._2)).distinct == Seq(7L -> 5L),
          s"in-batch order is by doc_id, so 7 flags against 5: ${pairs.toSeq}")
        assert(pairs.head._3 == 1000000L, "identical text = full agreement")
      } finally q.stop()
    }
  }
}
