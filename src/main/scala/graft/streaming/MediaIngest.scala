package graft.streaming

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous mixed-media ingestion: the streaming composition of
  * [[Multimodal.routeBatch]] — a `binaryFile` file-stream source tails a
  * landing directory, each micro-batch routes every new payload to its
  * modality's real decoder in one pass, and decoded stats / quarantined
  * paths append to MANIFESTED parquet tables via
  * [[ManifestAppendSink.applyBatch]]: the per-table batch high-water makes
  * a checkpoint-replayed micro-batch a no-op, so outputs hold each landed
  * file exactly once even when the query dies between the sink append and
  * the checkpoint commit (a plain `mode("append")` would double-append on
  * that replay). A crash between the stats append and the quarantine
  * append converges too — on replay the stats table skips (its high-water
  * already covers the batch) and the quarantine table catches up.
  *
  * At scale this is the "media lake in, typed stats out" standing
  * pipeline: listing cost is per NEW file, decode cost is one pass over
  * new bytes, and bad payloads quarantine as rows instead of killing the
  * query. Read the outputs through [[graft.ops.TableManifest.readTable]]. */
object MediaIngest {

  /** binaryFile's fixed schema — streaming file sources require one. */
  val BinaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Start the ingestion stream over `dir`; one AvailableNow pass drains
    * the current backlog (call again to pick up later arrivals, or pass a
    * processing-time trigger for a standing query). */
  def start(
      spark: SparkSession,
      dir: String,
      statsOut: String,
      quarantineOut: String,
      checkpoint: String,
      glob: String = "*",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob)
      .schema(BinaryFileSchema)
      .load(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val (good, quarantined) = Multimodal.splitFiles(
          batch, m => Multimodal.routeBatch(m).toDF(), quarExtra = Seq("kind"))
        ManifestAppendSink.applyBatch(good, batchId, statsOut)
        ManifestAppendSink.applyBatch(quarantined, batchId, quarantineOut)
        ()
      }
      .start()
}
