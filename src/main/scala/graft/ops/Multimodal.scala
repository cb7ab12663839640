package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed batch-wise on executors.
  *
  * The container ships no image/audio codecs, so the *decode kernel* is a
  * clearly-marked deterministic stub ([[FakeDecoded]] derived from payload
  * bytes) — but everything Spark-side is real: the schema shape
  * (payload + struct metadata), partition-batched processing through
  * `mapPartitions` on a typed Dataset (the Scala analog of `mapInPandas` —
  * one iterator per partition, amortized per-batch setup), and the
  * column-pruned metadata-only path that never deserializes payloads.
  */
object Multimodal {

  case class MediaRow(
      doc_id: Long,
      payload: Array[Byte],
      format: String,
      n_bytes: Long)

  case class FakeDecoded(
      doc_id: Long,
      n_bytes: Long,
      // stub "pixel" stats — a real kernel would decode payload here (???)
      first_byte: Int,
      n_pixels: Long,
      mean_byte: Double)

  /** Wrap a text table as a media table: payload = UTF-8 bytes standing in
    * for image bytes (real pipelines read binaryFile sources:
    * `spark.read.format("binaryFile")`). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/utf8").as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** STUB decode: batch-iterates payloads per partition exactly like a real
    * decode kernel would (setup once per partition, stream the iterator);
    * the per-item math is a deterministic fake of "decode then measure". */
  def decodeBatch(media: DataFrame): Dataset[FakeDecoded] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "payload", "format", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup would open the codec here (??? in real life)
        rows.map { r =>
          val bytes = r.payload
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
          FakeDecoded(
            doc_id = r.doc_id,
            n_bytes = r.n_bytes,
            first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
            n_pixels = r.n_bytes / 3, // fake RGB pixel count
            mean_byte = mean)
        }
      }
  }

  /** Metadata-only projection — must prune the payload column at the scan
    * (verified in MultimodalSpec via the physical plan). */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select("doc_id", "format", "n_bytes")
}
