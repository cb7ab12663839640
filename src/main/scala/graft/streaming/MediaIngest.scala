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
  * paths append to parquet. The file source's checkpoint tracks processed
  * files, so every landed file is decoded exactly once across restarts —
  * the media mirror of the text quarantine-ingestion stream.
  *
  * At scale this is the "media lake in, typed stats out" standing
  * pipeline: listing cost is per NEW file, decode cost is one pass over
  * new bytes, and bad payloads quarantine as rows instead of killing the
  * query. */
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
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val media = batch.select(
          graft.ops.TextOps.h60(col("path")).as("doc_id"),
          col("content").as("payload"))
        val names = batch.select(
          graft.ops.TextOps.h60(col("path")).as("doc_id"),
          col("path"), col("length").as("n_bytes"))
        val stats = Multimodal.routeBatch(media).toDF()
          .localCheckpoint(false)
        stats.filter(col("ok")).join(names.drop("n_bytes"), "doc_id")
          .write.mode("append").parquet(statsOut)
        stats.filter(!col("ok")).select("doc_id", "kind")
          .join(names, "doc_id").select("path", "kind", "n_bytes")
          .write.mode("append").parquet(quarantineOut)
        ()
      }
      .start()
}
