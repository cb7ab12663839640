package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass mixed-media routing ([[Multimodal.routeBatch]] /
  * [[Multimodal.routeDirWithQuarantine]]): magic-byte detection routes
  * each payload to its modality's real decoder; unknown or undecodable
  * payloads land in quarantine as data, never as task failures. */
class MultimodalRouterSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(n: Int, rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * i / 16) * 8000).toShort)
    val bytes = new Array[Byte](n * 2)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(samples)
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // minimal RIFF-AVI header with no frames: detected as video by magic,
  // parsed as an empty clip by the hand-rolled RIFF walk
  private def emptyAvi: Array[Byte] = {
    val body = "AVI ".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val size = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(body.length).array()
    out.write(size); out.write(body)
    out.toByteArray
  }

  test("magicKind detects every modality and rejects junk") {
    assert(Multimodal.magicKind(pngBytes(2, 2, 0xFF0000)) === "image")
    assert(Multimodal.magicKind(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte))
      === "image")
    assert(Multimodal.magicKind(wavBytes(64, 8000f)) === "audio")
    assert(Multimodal.magicKind(emptyAvi) === "video")
    assert(Multimodal.magicKind("not media at all".getBytes) === "unknown")
    assert(Multimodal.magicKind(Array.empty[Byte]) === "unknown")
  }

  test("routeBatch decodes a mixed batch in one pass with real stats") {
    val media = Seq(
      (1L, pngBytes(4, 3, 0x4080C0)),
      (2L, wavBytes(8000, 8000f)),
      (3L, emptyAvi),
      (4L, "junk".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.routeBatch(media).collect()
      .map(r => r.doc_id -> r).toMap

    val img = out(1L)
    assert(img.kind === "image" && img.ok &&
      img.width === 4 && img.height === 3)
    assert(math.abs(img.metric - (0x40 + 0x80 + 0xC0) / 3.0) < 0.5)

    val aud = out(2L)
    assert(aud.kind === "audio" && aud.ok &&
      aud.sample_rate === 8000 && aud.channels === 1 && aud.frames === 8000L)
    assert(aud.metric > 0.0, "sine RMS must be positive")

    // a frameless AVI routes to video but counts as a failed decode
    // (decodeVideoOne: zero frames → ok = false, n_frames = -1)
    val vid = out(3L)
    assert(vid.kind === "video" && !vid.ok && vid.frames === -1L)

    assert(out(4L).kind === "unknown" && !out(4L).ok)
  }

  test("routeDirWithQuarantine: good stats joined to paths, junk quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("router").toFile
    try {
      java.nio.file.Files.write(
        new java.io.File(dir, "a.png").toPath, pngBytes(2, 2, 0xFFFFFF))
      java.nio.file.Files.write(
        new java.io.File(dir, "b.wav").toPath, wavBytes(256, 16000f))
      java.nio.file.Files.write(
        new java.io.File(dir, "c.bin").toPath, "garbage".getBytes)
      val (good, quarantined) =
        Multimodal.routeDirWithQuarantine(spark, dir.getAbsolutePath)
      val kinds = good.select("kind", "path").collect()
        .map(r => r.getString(0) -> r.getString(1).split('/').last).toMap
      assert(kinds === Map("image" -> "a.png", "audio" -> "b.wav"))
      val q = quarantined.collect()
        .map(r => (r.getString(0).split('/').last, r.getString(1))).toSet
      assert(q === Set(("c.bin", "unknown")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
