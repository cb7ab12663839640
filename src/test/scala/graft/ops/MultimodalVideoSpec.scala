package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MJPEG-AVI video decode against a fixture assembled byte-by-byte from the
  * RIFF spec (so the test does not depend on the parser it is testing):
  * solid-color JPEG frames with known luma, real `avih` header fields. */
class MultimodalVideoSpec extends SparkSpec {

  private def leU32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ leU32(data.length.toLong) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  private def list(typ: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("US-ASCII") ++ payload)

  private def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(gray, gray, gray))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal MJPEG AVI: RIFF(AVI ) { LIST(hdrl){avih}, LIST(movi){00dc*} }. */
  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Long): Array[Byte] = {
    val avih = new Array[Byte](56)
    def put(off: Int, v: Long): Unit = leU32(v).copyToArray(avih, off)
    put(0, usPerFrame); put(16, frames.size.toLong); put(32, w.toLong); put(36, h.toLong)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ leU32(body.length.toLong) ++ body
  }

  test("MJPEG-AVI: header facts, frame count, dims, and sampled luma are real") {
    import spark.implicits._
    val grays = Seq(0, 40, 80, 120, 160, 200)
    val avi = mjpegAvi(grays.map(jpegFrame(32, 24, _)), 32, 24, usPerFrame = 40000L)
    val media = Seq(
      (1L, avi),
      (2L, Array.fill[Byte](256)(0x5a)) // not RIFF at all
    ).toDF("doc_id", "payload")

    val stats = Multimodal.decodeVideoBatch(media, frameStride = 2)
      .collect().sortBy(_.doc_id)
    val v = stats(0)
    assert(v.ok && v.header_us_per_frame == 40000L && v.header_frames == 6L)
    assert(v.n_frames == 6L, s"all movi chunks counted: $v")
    assert(v.width == 32 && v.height == 24, s"dims from decoded pixels: $v")
    assert(v.sampled_frames == 3L, "stride 2 over 6 frames decodes frames 0, 2, 4")
    // solid-gray JPEGs decode near-exactly: mean of lumas 0, 80, 160 = 80
    assert(math.abs(v.mean_luma - 80.0) < 2.0, s"luma off: ${v.mean_luma}")
    assert(!stats(1).ok, "non-RIFF payload is a data row, not a task failure")
  }

  test("frames grouped in 'LIST rec ' sublists decode identically") {
    import spark.implicits._
    val frames = Seq(80, 160).map(jpegFrame(16, 16, _))
    // spec-valid interleaved shape: movi { LIST rec { 00dc } * }
    val avih = new Array[Byte](56)
    leU32(2L).copyToArray(avih, 16)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi",
      frames.flatMap(f => list("rec ", chunk("00dc", f))).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ leU32(body.length.toLong) ++ body
    val v = Multimodal.decodeVideoBatch(Seq((1L, avi)).toDF("doc_id", "payload"))
      .head()
    assert(v.ok && v.n_frames == 2L && v.sampled_frames == 2L,
      s"rec-wrapped frames must be found: $v")
    assert(math.abs(v.mean_luma - 120.0) < 2.0, s"luma off: ${v.mean_luma}")
  }

  test("interleaved second stream is excluded from frame count and luma") {
    import spark.implicits._
    // two declared streams: stream 0 is audio (auds), stream 1 is the video
    // (vids) — so '01dc' chunks are the real frames and '00wb' audio chunks
    // plus any stray '00dc' must not be counted or averaged in
    def strl(fccType: String): Array[Byte] = {
      val strh = new Array[Byte](56)
      fccType.getBytes("US-ASCII").copyToArray(strh, 0)
      list("strl", chunk("strh", strh))
    }
    val avih = new Array[Byte](56)
    leU32(2L).copyToArray(avih, 16)
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl("auds") ++ strl("vids"))
    val frames = Seq(60, 180).map(jpegFrame(16, 16, _))
    val movi = list("movi",
      chunk("00wb", Array.fill[Byte](64)(0x11)) ++ // audio data
        chunk("00dc", jpegFrame(16, 16, 255)) ++   // mislabeled/foreign
        frames.flatMap(f => chunk("01dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ leU32(body.length.toLong) ++ body
    val v = Multimodal.decodeVideoBatch(Seq((1L, avi)).toDF("doc_id", "payload"))
      .head()
    assert(v.ok && v.n_frames == 2L && v.sampled_frames == 2L,
      s"only the declared vids stream counts: $v")
    assert(math.abs(v.mean_luma - 120.0) < 2.0,
      s"luma must average stream 01 only: ${v.mean_luma}")
  }

  test("dimension-bomb JPEG frame is skipped by the header peek, not decoded") {
    import spark.implicits._
    // patch the SOF0 height/width of a real 16x16 JPEG to 65535x65535
    // (4.3 Gpx ≈ 17 GB raster): the peek must reject it without allocating
    val jpeg = jpegFrame(16, 16, 100)
    val sof = jpeg.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    assert(sof > 0, "baseline JPEG must carry an SOF0 marker")
    val bomb = jpeg.clone()
    // SOF0 layout: FF C0 len(2) precision(1) height(2) width(2)
    bomb(sof + 5) = 0xff.toByte; bomb(sof + 6) = 0xff.toByte
    bomb(sof + 7) = 0xff.toByte; bomb(sof + 8) = 0xff.toByte
    val avi = mjpegAvi(Seq(bomb, jpegFrame(16, 16, 60)), 16, 16, 1000L)
    val v = Multimodal.decodeVideoBatch(Seq((1L, avi)).toDF("doc_id", "payload"))
      .head()
    assert(v.ok && v.n_frames == 2L && v.sampled_frames == 1L,
      s"bomb frame skipped, healthy frame still measured: $v")
    assert(math.abs(v.mean_luma - 60.0) < 2.0)
    // the image path shares the peek: the bare bomb is a data row
    val img = Multimodal.decodeImageBatch(
      Seq((2L, bomb)).toDF("doc_id", "payload")).head()
    assert(!img.ok, "oversized declared raster must come back ok=false")
  }

  test("damaged movi keeps its parsed avih header evidence") {
    import spark.implicits._
    val avi = mjpegAvi(Seq(jpegFrame(16, 16, 100)), 16, 16, usPerFrame = 40000L)
    val moviAt = avi.indexOfSlice("movi".getBytes("US-ASCII"))
    val broken = avi.clone()
    "movx".getBytes("US-ASCII").copyToArray(broken, moviAt)
    val v = Multimodal.decodeVideoBatch(Seq((1L, broken)).toDF("doc_id", "payload"))
      .head()
    assert(!v.ok && v.n_frames == -1L, s"no frames found: $v")
    assert(v.header_us_per_frame == 40000L && v.header_frames == 1L,
      s"avih facts must survive a damaged movi: $v")
  }

  test("lying chunk sizes truncate the walk instead of allocating (bomb-safe)") {
    import spark.implicits._
    val avi = mjpegAvi(Seq(jpegFrame(16, 16, 100)), 16, 16, 1000L)
    // corrupt the movi LIST size field to a huge value: find "movi", break
    // its enclosing LIST size (4 bytes before "movi" minus 4 of LIST id)
    val moviAt = avi.indexOfSlice("movi".getBytes("US-ASCII"))
    val bomb = avi.clone()
    leU32(0x7fffffffL).copyToArray(bomb, moviAt - 4)
    val r = Multimodal.decodeVideoBatch(Seq((1L, bomb)).toDF("doc_id", "payload"))
      .head()
    assert(!r.ok, s"truncated/lying container must come back ok=false, got $r")
  }
}
