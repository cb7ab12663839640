package graft.ops

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-sample coverage for the audio half of [[Multimodal]]: fixtures are
  * genuine WAVs encoded in-test with the same in-JDK codec the executors
  * use, so decode stats are verified against amplitude math over the exact
  * samples that went in. */
class MultimodalAudioSpec extends SparkSpec {

  /** 16-bit little-endian PCM mono WAV of the given samples. */
  private def wav16(samples: Array[Short], rate: Float): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2,
      rate, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One period per `period` samples, amplitude `amp`. */
  private def sine(n: Int, period: Int, amp: Double): Array[Short] =
    Array.tabulate(n)(i =>
      math.round(amp * 32767.0 * math.sin(2 * math.Pi * i / period)).toShort)

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "payload")
      .withColumn("format", lit("audio/wav"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
  }

  test("decodeAudioBatch reads real WAV samples: rate, frames, duration, exact RMS/peak") {
    val samples = sine(8000, 100, 0.5)
    val media = mediaDf(Seq(1L -> wav16(samples, 8000f)))
    val s = Multimodal.decodeAudioBatch(media).collect().head
    assert(s.ok && s.sample_rate == 8000 && s.channels == 1)
    assert(s.n_frames == 8000 && s.duration_ms == 1000)
    // expected stats from the very samples that were encoded
    val vals = samples.map(_ / 32768.0)
    val rms = math.sqrt(vals.map(v => v * v).sum / vals.length)
    assert(math.abs(s.rms - rms) < 1e-12, s"rms ${s.rms} vs $rms")
    assert(math.abs(s.peak - vals.map(math.abs).max) < 1e-12)
    // a half-amplitude sine's RMS lands near amp/sqrt(2)
    assert(math.abs(s.rms - 0.5 / math.sqrt(2)) < 1e-3)
  }

  test("8-bit WAV converts through AudioSystem and measures like its 16-bit rendition") {
    // 8-bit unsigned PCM square wave at +/- half scale
    val rate = 4000f
    val fmt8 = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, rate, 8, 1, 1,
      rate, false)
    val raw = Array.tabulate(4000)(i => if ((i / 50) % 2 == 0) 192 else 64)
      .map(_.toByte)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt8, raw.length),
      AudioFileFormat.Type.WAVE, out)
    val s = Multimodal.decodeAudioBatch(mediaDf(Seq(7L -> out.toByteArray)))
      .collect().head
    assert(s.ok && s.sample_rate == 4000 && s.n_frames == 4000)
    // +/- 64/128 of full scale in 8-bit => RMS == peak == 0.5 exactly
    assert(math.abs(s.rms - 0.5) < 1e-2, s"rms ${s.rms}")
    assert(math.abs(s.peak - 0.5) < 1e-2, s"peak ${s.peak}")
  }

  test("corrupt payloads are data rows, not task failures; batch keeps good rows") {
    val media = mediaDf(Seq(
      1L -> wav16(sine(100, 10, 0.9), 1000f),
      2L -> "this is not a wav".getBytes("UTF-8"),
      3L -> Array.emptyByteArray))
    val byId = Multimodal.decodeAudioBatch(media).collect()
      .map(s => s.doc_id -> s).toMap
    assert(byId(1L).ok && byId(1L).n_frames == 100)
    assert(!byId(2L).ok && byId(2L).sample_rate == -1)
    assert(!byId(3L).ok)
  }
}
