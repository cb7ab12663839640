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

  /** Frame sampling over a "video" payload: the payload is a sequence of
    * fixed-size `frameBytes` frames; emit every `everyNth` frame as its own
    * row with a content digest. Pure binary slicing per row (one generator,
    * no shuffle) — the frame-extraction plumbing is real; only the
    * interpretation of the bytes as video frames is the stand-in (a codec
    * would replace the fixed-stride slicing with container parsing). */
  def frameSample(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    require(frameBytes >= 1 && everyNth >= 1, "frameBytes/everyNth must be >= 1")
    media
      // empty payloads have zero frames; without this guard the sequence
      // upper bound (ceil(0/fb) - 1 = -1) would generate a DESCENDING
      // [0, -1] array and emit phantom frames
      .filter(col("n_bytes") > 0)
      .withColumn("frame_idx",
        explode(expr(
          s"sequence(0, CAST((n_bytes + ${frameBytes - 1}) DIV $frameBytes AS INT) - 1)")))
      .filter(col("frame_idx") % everyNth === 0)
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        md5(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_md5"),
        expr(s"octet_length(substring(payload, frame_idx * $frameBytes + 1, $frameBytes))")
          .cast("long").as("frame_bytes"))
  }

  /** STUB resize: keep every `factor`-th payload byte (a real kernel would
    * decode + interpolate — ??? without codecs); the executor-side batched
    * shape and the metadata rewrite are the real parts. */
  def resizeBatch(media: DataFrame, factor: Int): Dataset[(Long, Array[Byte], Long)] = {
    require(factor >= 1, "factor must be >= 1")
    import media.sparkSession.implicits._
    media.select("doc_id", "payload", "format", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val small = r.payload.indices.collect {
            case i if i % factor == 0 => r.payload(i)
          }.toArray
          (r.doc_id, small, small.length.toLong)
        }
      }
  }
}
