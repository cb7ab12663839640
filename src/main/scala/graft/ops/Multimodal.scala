package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed batch-wise on executors.
  *
  * IMAGES decode for real: the JDK ships PNG/JPEG/GIF/BMP codecs in
  * `javax.imageio`, so [[decodeImageBatch]] / [[resizeImageBatch]] read
  * actual pixels and re-encode actual PNGs on the executors — no display,
  * no native libs ([[java.awt.image.BufferedImage]] is headless-safe).
  * AUDIO decodes for real too: `javax.sound.sampled` ships WAV/AIFF/AU
  * container parsing and PCM/ULAW/ALAW codecs, so [[decodeAudioBatch]]
  * measures actual samples. VIDEO decodes for real in the MJPEG-in-AVI
  * case ([[decodeVideoBatch]]: hand-parsed RIFF container + per-frame JPEG
  * through `javax.imageio`); inter-frame codecs (H.264/VP9) have no in-JDK
  * decoder, so for those the fixed-stride [[frameSample]] slicing remains a
  * clearly-marked deterministic stand-in (container parsing would replace
  * the stride).
  * Everything Spark-side is real in all cases:
  * the schema shape (payload + struct metadata), partition-batched
  * processing through `mapPartitions` on a typed Dataset (the Scala analog
  * of `mapInPandas` — one iterator per partition, amortized per-batch
  * setup), and the column-pruned metadata-only path that never
  * deserializes payloads.
  */
object Multimodal {

  /** Wrap a text table as a media table: payload = UTF-8 bytes standing in
    * for image bytes (real pipelines read binaryFile sources:
    * `spark.read.format("binaryFile")`). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/utf8").as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Deterministic synthetic MIXED-media corpus keyed by doc_id: every
    * third row a REAL solid-color 3×2 PNG (encoded with `javax.imageio` on
    * the executors), every third a REAL 8 kHz mono 16-bit WAV (encoded with
    * `javax.sound.sampled`), the rest raw UTF-8 text bytes (which the
    * magic-byte router must classify `unknown`). Because the engine
    * encodes the payloads itself, the downstream [[routeBatch]] pass is a
    * GENUINE decode of genuine files, yet every decoded stat is closed
    * form: a solid (r,g,b) image decodes to means exactly (r,g,b); a
    * constant-amplitude `a` PCM stream has rms exactly `a/32768` (32768 is
    * a power of two, so the quotient — and the sqrt of its exact square —
    * are IEEE-exact in any engine). That is what lets q24 hash-match a SQL
    * oracle while exercising the real codec path end-to-end. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val payload = (id % 3) match {
            case 0 => syntheticPng(id)
            case 1 => syntheticWav(id)
            case _ => Option(text).getOrElse("").getBytes("UTF-8")
          }
          (id, payload)
        }
      }.toDF("doc_id", "payload")
  }

  /** Real 3×2 PNG, solid color (id·37, id·59, id·83) mod 256. */
  private def syntheticPng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id * 37) % 256).toInt << 16) |
      (((id * 59) % 256).toInt << 8) | ((id * 83) % 256).toInt
    (0 until 3).foreach(x => (0 until 2).foreach(y => img.setRGB(x, y, rgb)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** Real 8 kHz mono 16-bit little-endian WAV: 40 + id mod 8 frames of
    * constant amplitude (id mod 1000 + 1)·16. */
  private def syntheticWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (40 + id % 8).toInt
    val a = (((id % 1000) + 1) * 16).toInt
    val data = new Array[Byte](2 * n)
    (0 until n).foreach { i =>
      data(2 * i) = (a & 0xff).toByte
      data(2 * i + 1) = ((a >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
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

  /** Real per-image decode result (width/height/channels/means from actual
    * pixels). `ok = false` rows carry -1 dims: undecodable bytes are data,
    * not exceptions — a 100 TB crawl always contains corrupt files, and one
    * bad payload must not kill a 10k-row task. */
  case class ImageStats(
      doc_id: Long,
      ok: Boolean,
      width: Int,
      height: Int,
      channels: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** REAL image decode via in-JDK `javax.imageio` (PNG/JPEG/GIF/BMP):
    * batched per partition, pixel stats from the decoded raster. The
    * executor-side batched-kernel shape (typed Dataset → `mapPartitions`,
    * one iterator per partition so codec setup amortizes across the batch
    * — the Scala analog of `mapInPandas`) is the template every decode
    * kernel here follows; only the per-payload kernel differs. */
  /** Decode an image only after a header-only dimension peek: a few-KB
    * payload can DECLARE a 50000×50000 raster whose decode allocates ~10 GB
    * and dies with `OutOfMemoryError` — an `Error`, not an `Exception`, so
    * a catch around the decode cannot save the task. The peek
    * (`ImageReader.getWidth(0)`) reads header bytes only; payloads
    * declaring more than `maxPixels` (default 64 Mpx ≈ 256 MB raster) come
    * back null like any other corrupt payload. */
  private def safeRead(
      in: java.io.InputStream,
      maxPixels: Long = 64L << 20): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(in)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) null
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > maxPixels) null
            else r.read(0)
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => null }

  def decodeImageBatch(media: DataFrame): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => decodeImageOne(id, bytes) }
      }
  }

  private def decodeImageOne(id: Long, bytes: Array[Byte]): ImageStats = {
    // the null check must sit OUTSIDE safeRead's try: the
    // ByteArrayInputStream CONSTRUCTOR NPEs before the stream is read,
    // and a null payload is corrupt data, not a task failure
    if (bytes == null) return ImageStats(id, ok = false, -1, -1, -1, 0.0, 0.0, 0.0)
    val img = safeRead(new java.io.ByteArrayInputStream(bytes))
    if (img == null) ImageStats(id, ok = false, -1, -1, -1, 0.0, 0.0, 0.0)
    else {
      val w = img.getWidth
      val h = img.getHeight
      // row-strip bulk getRGB: per-pixel getRGB(x, y) pays bounds
      // checks + ColorModel conversion per call (~10× decode CPU),
      // while one full-image bulk call allocates w·h ints — a 1 GiB
      // spike on a decompression-bomb PNG. One reused row buffer
      // keeps the bulk-path speed at O(w) extra memory.
      val buf = new Array[Int](w)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, buf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = buf(x)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      ImageStats(id, ok = true, w, h,
        img.getColorModel.getNumComponents,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }
  }

  /** REAL image resize: decode, scale so max(width, height) == maxDim
    * (never upscale), bilinear `Graphics2D` redraw, re-encode as PNG.
    * Undecodable payloads pass through with `out_w = out_h = -1` and an
    * empty payload instead of failing the task. */
  def resizeImageBatch(media: DataFrame, maxDim: Int)
      : Dataset[(Long, Array[Byte], Int, Int)] = {
    require(maxDim >= 1, "maxDim must be >= 1")
    import media.sparkSession.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else safeRead(new java.io.ByteArrayInputStream(bytes))
          if (img == null) (id, Array.emptyByteArray, -1, -1)
          else {
            val scale = math.min(1.0,
              maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val ow = math.max(1, math.round(img.getWidth * scale).toInt)
            val oh = math.max(1, math.round(img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, ow, oh, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            (id, buf.toByteArray, ow, oh)
          }
        }
      }
  }

  /** Real per-clip audio decode result: container/stream facts plus
    * amplitude stats from the actual samples ([-1, 1] normalized). Like
    * [[ImageStats]], `ok = false` rows carry -1 facts — corrupt payloads
    * are data, not task failures. */
  case class AudioStats(
      doc_id: Long,
      ok: Boolean,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      rms: Double,
      peak: Double)

  /** REAL audio decode via in-JDK `javax.sound.sampled` (WAV/AIFF/AU
    * containers; PCM plus the JDK's ULAW/ALAW converters): batched per
    * partition, amplitude stats from the decoded 16-bit samples. Non-PCM
    * or non-16-bit streams are converted through `AudioSystem` before
    * measuring, so 8-bit and companded WAVs measure identically to their
    * 16-bit PCM renditions. */
  def decodeAudioBatch(media: DataFrame): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => decodeAudioOne(id, bytes) }
      }
  }

  private def decodeAudioOne(id: Long, bytes: Array[Byte]): AudioStats = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = raw.getFormat
      val pcm16 = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
        f.getChannels, 2 * f.getChannels, f.getSampleRate, false)
      val in =
        if (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && !f.isBigEndian) raw
        else AudioSystem.getAudioInputStream(pcm16, raw)
      val data = in.readAllBytes()
      val nSamples = data.length / 2
      var sumSq = 0.0
      var peak = 0.0
      var i = 0
      while (i < nSamples) {
        // little-endian signed 16-bit
        val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
        val v = s / 32768.0
        sumSq += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      val ch = in.getFormat.getChannels
      val frames = nSamples.toLong / math.max(ch, 1)
      val rate = in.getFormat.getSampleRate.toInt
      AudioStats(id, ok = true, rate, ch, frames,
        if (rate > 0) frames * 1000L / rate else -1,
        if (nSamples > 0) math.sqrt(sumSq / nSamples) else 0.0, peak)
    } catch {
      case _: Exception => AudioStats(id, ok = false, -1, -1, -1L, -1L, 0.0, 0.0)
    }
  }

  /** Real per-clip video decode result. `header_*` facts come from the AVI
    * main header (`avih`); `n_frames` is the count of video chunks actually
    * present in the `movi` list (the two can disagree in damaged files —
    * report both, let the pipeline decide); `width/height/mean_luma` come
    * from the decoded pixels of the sampled frames. `ok = false` rows carry
    * -1 facts — corrupt payloads are data, not task failures. */
  case class VideoStats(
      doc_id: Long,
      ok: Boolean,
      header_us_per_frame: Long,
      header_frames: Long,
      n_frames: Long,
      width: Int,
      height: Int,
      sampled_frames: Long,
      mean_luma: Double)

  /** REAL video decode for MJPEG-in-AVI: the AVI container is plain RIFF
    * chunk structure (parsed by hand — ~40 lines, no codec needed) and each
    * MJPEG frame chunk (`##dc`/`##db`) is a complete JPEG, which the JDK's
    * `javax.imageio` decodes. So the one modality that "lacks an in-JDK
    * codec" is real end-to-end for the MJPEG case; inter-frame codecs
    * (H.264/VP9) genuinely have no in-JDK decoder and stay with the
    * byte-level stand-ins ([[frameSample]]).
    *
    * `frameStride` decodes every Nth frame (1 = all): frame COUNTING walks
    * chunk headers only (no decode cost), so a 10k-frame clip with
    * `frameStride = 100` pays 100 JPEG decodes, not 10k. All chunk sizes
    * are clamped against the remaining buffer — a lying size field
    * (decompression-bomb shape) truncates the walk instead of allocating. */
  def decodeVideoBatch(media: DataFrame, frameStride: Int = 1): Dataset[VideoStats] = {
    require(frameStride >= 1, "frameStride must be >= 1")
    import media.sparkSession.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => decodeVideoOne(id, bytes, frameStride) }
      }
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off >= 0 && off + 4 <= b.length)
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    else ""

  /** Little-endian uint32 at `off`, or -1 when out of bounds. */
  private def u32(b: Array[Byte], off: Int): Long =
    if (off >= 0 && off + 4 <= b.length)
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    else -1L

  private def decodeVideoOne(id: Long, bytes: Array[Byte], stride: Int): VideoStats = {
    val bad = VideoStats(id, ok = false, -1L, -1L, -1L, -1, -1, 0L, 0.0)
    if (bytes == null || bytes.length < 12 ||
      fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return bad
    val riffSize = u32(bytes, 4)
    val limit = math.min(bytes.length.toLong, 8L + math.max(riffSize, 0L)).toInt
    var usPerFrame = -1L
    var headerFrames = -1L
    var nFrames = 0L
    var w = -1
    var h = -1
    var sampled = 0L
    var lumaSum = 0.0
    // stream number of the FIRST 'vids' stream declared in hdrl (an AVI
    // can interleave audio + several video streams; counting every ##dc
    // chunk would inflate n_frames and average lumas across streams).
    // Streams are numbered in strl declaration order; files with no strl
    // headers fall back to stream 00, the overwhelmingly common layout.
    var streamIdx = 0
    var videoStream = -1
    var pos = 12
    while (pos + 8 <= limit) {
      val cid = fourcc(bytes, pos)
      val sz = u32(bytes, pos + 4)
      if (sz < 0 || sz > limit - pos - 8) { pos = limit } // lying size: stop
      else {
        if (cid == "LIST" && sz >= 4) {
          val lend = pos + 8 + sz.toInt
          fourcc(bytes, pos + 8) match {
            case "hdrl" =>
              var sp = pos + 12
              while (sp + 8 <= lend) {
                val ssz = u32(bytes, sp + 4)
                if (ssz < 0 || ssz > lend - sp - 8) { sp = lend }
                else {
                  if (fourcc(bytes, sp) == "avih" && ssz >= 40) {
                    usPerFrame = u32(bytes, sp + 8)
                    headerFrames = u32(bytes, sp + 8 + 16)
                  } else if (fourcc(bytes, sp) == "LIST" && ssz >= 4 &&
                    fourcc(bytes, sp + 8) == "strl") {
                    // strl: [sp+12]=strh id, [sp+20]=strh data = fccType
                    if (videoStream < 0 && ssz >= 16 &&
                      fourcc(bytes, sp + 12) == "strh" &&
                      fourcc(bytes, sp + 20) == "vids") videoStream = streamIdx
                    streamIdx += 1
                  }
                  sp += 8 + ssz.toInt + (ssz.toInt & 1)
                }
              }
            case "movi" =>
              // frames sit directly in movi OR grouped inside 'LIST rec '
              // sublists (the AVI-spec interleaving shape) — recurse into
              // those, depth-capped so crafted nesting can't blow the stack
              val streamTag = f"${math.max(videoStream, 0)}%02d"
              def walkFrames(start: Int, end: Int, depth: Int): Unit = {
                var sp = start
                while (sp + 8 <= end) {
                  val sid = fourcc(bytes, sp)
                  val ssz = u32(bytes, sp + 4)
                  if (ssz < 0 || ssz > end - sp - 8) { sp = end }
                  else {
                    if (sid == "LIST" && ssz >= 4 &&
                      fourcc(bytes, sp + 8) == "rec " && depth < 8) {
                      walkFrames(sp + 12, sp + 8 + ssz.toInt, depth + 1)
                    } else if (sid.startsWith(streamTag) &&
                      (sid.endsWith("dc") || sid.endsWith("db"))) {
                      if (nFrames % stride == 0) {
                        val img = safeRead(
                          new java.io.ByteArrayInputStream(bytes, sp + 8, ssz.toInt))
                        if (img != null) {
                          if (w < 0) { w = img.getWidth; h = img.getHeight }
                          lumaSum += lumaMean(img)
                          sampled += 1
                        }
                      }
                      nFrames += 1
                    }
                    sp += 8 + ssz.toInt + (ssz.toInt & 1)
                  }
                }
              }
              walkFrames(pos + 12, lend, 0)
            case _ => ()
          }
        }
        pos += 8 + sz.toInt + (sz.toInt & 1)
      }
    }
    // zero frames is still a failed decode, but any header facts that DID
    // parse ride along so a damaged-movi clip keeps its avih evidence
    if (nFrames == 0)
      bad.copy(header_us_per_frame = usPerFrame, header_frames = headerFrames)
    else VideoStats(id, ok = true, usPerFrame, headerFrames, nFrames, w, h,
      sampled, if (sampled > 0) lumaSum / sampled else 0.0)
  }

  /** BT.601 luma mean over the raster, row-strip bulk reads (see the
    * comment in [[decodeImageBatch]] for why row strips). */
  private def lumaMean(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    val buf = new Array[Int](w)
    var s = 0.0
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, buf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = buf(x)
        s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s / (w.toLong * h)
  }

  /** Shared split core for every binaryFile-shaped ingestion path: key by
    * path hash, decode, join paths back onto the good half, quarantine
    * failures with `quarExtra` stat columns (e.g. the detected kind) plus
    * path and size. One definition — the per-modality dir helpers, the
    * mixed-lake router, and the streaming ingest all call this.
    *
    * Files are keyed by `h60(path)` so the typed decoders run unchanged
    * and the path rejoin is a slim equi-join (the `binaryFile` scan on the
    * name side prunes `content` away); the decoded stats are lazily
    * materialized once for their two consumers. */
  private[graft] def splitFiles(
      files: DataFrame,
      decode: DataFrame => DataFrame,
      quarExtra: Seq[String] = Seq.empty): (DataFrame, DataFrame) = {
    val media = files.select(
      TextOps.h60(col("path")).as("doc_id"),
      col("content").as("payload"))
    val names = files.select(
      TextOps.h60(col("path")).as("doc_id"),
      col("path"), col("length").as("n_bytes"))
    // one row per FILE of the media lake (corpus-sized), and called once
    // PER MICRO-BATCH by the standing MediaIngest stream — so it needs
    // GC-owned cleanup (a Dataset.persist entry per batch would pile up
    // in the CacheManager until executor disks fill) and, on cluster
    // runs, recoverable blocks (executor loss recomputes lost decode
    // partitions). Cached.cachedView provides both, recoverability gated
    // on the session's checkpoint-dir config like every other scratch.
    import graft.ops.Cached.CachedViewOps
    val stats = decode(media).cachedView
    val good = stats.filter(col("ok")).join(names.drop("n_bytes"), "doc_id")
    val quarantined = stats.filter(!col("ok"))
      .select("doc_id", quarExtra: _*)
      .join(names, "doc_id")
      .select("path", quarExtra :+ "n_bytes": _*)
    (good, quarantined)
  }

  private def loadBinary(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Quarantine split for a `binaryFile` media directory — the media twin
    * of [[graft.sources.Ingest.jsonSplit]]: a path glob only filters by
    * NAME, so a 100 TB media crawl still ships truncated downloads and
    * mislabeled payloads. Good rows keep their full decoded stats with the
    * originating path; rejects land in a `(path, n_bytes)` quarantine half
    * for audit/replay — evidence preserved, no task failures. `decode` is
    * any batch decoder (image/audio/video) lifted to DataFrame: it
    * receives `(doc_id, payload)` and must return rows with `doc_id` and
    * `ok`. */
  def dirWithQuarantine(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String,
      decode: DataFrame => DataFrame): (DataFrame, DataFrame) =
    splitFiles(loadBinary(spark, dir, glob), decode)

  /** [[dirWithQuarantine]] specialized to images. */
  def imageDirWithQuarantine(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String = "*"): (DataFrame, DataFrame) =
    dirWithQuarantine(spark, dir, glob, m => decodeImageBatch(m).toDF())

  // ------------------------------------------------------------- routing

  /** Magic-byte modality detection — plain JVM byte peeks, no decode:
    * PNG/JPEG/GIF/BMP → image, RIFF-WAVE / FORM-AIFF / FORM-AIFC /
    * AU (".snd") → audio (everything [[decodeAudioOne]]'s `AudioSystem`
    * path accepts), RIFF-AVI → video, anything else → unknown. */
  def magicKind(b: Array[Byte]): String = {
    // null payload = corrupt input DATA, routed like any unknown format —
    // bad bytes must never become a task failure
    if (b == null) return "unknown"
    def at(i: Int) = if (i < b.length) b(i) & 0xff else -1
    def ascii(off: Int, s: String) =
      s.indices.forall(i => at(off + i) == s.charAt(i).toInt)
    if (at(0) == 0x89 && ascii(1, "PNG")) "image"
    else if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) "image"
    else if (ascii(0, "GIF8")) "image"
    else if (ascii(0, "BM")) "image"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "audio"
    else if (ascii(0, "FORM") && (ascii(8, "AIFF") || ascii(8, "AIFC"))) "audio"
    else if (ascii(0, ".snd")) "audio"
    else if (ascii(0, "RIFF") && ascii(8, "AVI ")) "video"
    else "unknown"
  }

  /** Unified per-payload decode result: modality-specific fields hold −1 /
    * 0 where they don't apply (`sample_rate` for images, `width` for
    * audio); `metric` is the modality's one-number content signal (mean
    * RGB, RMS amplitude, mean luma). */
  case class RoutedStats(
      doc_id: Long,
      kind: String,
      ok: Boolean,
      width: Int,
      height: Int,
      sample_rate: Int,
      channels: Int,
      frames: Long,
      metric: Double)

  /** Route-and-decode a MIXED media batch in ONE pass: detect the modality
    * from magic bytes (no decode), then run that modality's real decoder
    * on the same already-read payload — so ingesting a mixed 100 TB media
    * lake reads every byte exactly once, instead of one glob-filtered scan
    * per modality. Unknown payloads come back `kind = "unknown", ok =
    * false` (bad input is data, not an exception). */
  def routeBatch(media: DataFrame, frameStride: Int = 1): Dataset[RoutedStats] = {
    require(frameStride >= 1, "frameStride must be >= 1")
    import media.sparkSession.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          magicKind(bytes) match {
            case "image" =>
              val s = decodeImageOne(id, bytes)
              RoutedStats(id, "image", s.ok, s.width, s.height, -1,
                s.channels, if (s.ok) 1L else -1L,
                (s.mean_r + s.mean_g + s.mean_b) / 3.0)
            case "audio" =>
              val a = decodeAudioOne(id, bytes)
              RoutedStats(id, "audio", a.ok, -1, -1, a.sample_rate,
                a.channels, a.n_frames, a.rms)
            case "video" =>
              val v = decodeVideoOne(id, bytes, stride = frameStride)
              RoutedStats(id, "video", v.ok, v.width, v.height, -1, -1,
                v.n_frames, v.mean_luma)
            case k =>
              RoutedStats(id, k, ok = false, -1, -1, -1, -1, -1L, 0.0)
          }
        }
      }
  }

  /** [[routeBatch]] over a directory: one `binaryFile` scan of a mixed
    * media dir → per-modality decoded stats joined back to paths, plus a
    * quarantine list (unknown magic OR failed decode) with path, claimed
    * kind, and size — the mixed-lake mirror of [[dirWithQuarantine]]. */
  def routeDirWithQuarantine(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String = "*",
      frameStride: Int = 1): (DataFrame, DataFrame) =
    splitFiles(loadBinary(spark, dir, glob),
      m => routeBatch(m, frameStride).toDF(), quarExtra = Seq("kind"))
}
