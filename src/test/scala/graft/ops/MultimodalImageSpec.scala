package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-pixel coverage for the image half of [[Multimodal]]: fixtures are
  * genuine PNGs encoded in-test with the same in-JDK codec the executors
  * use, so decode/resize are verified against known pixel values — no
  * stubbed bytes anywhere on this path. */
class MultimodalImageSpec extends SparkSpec {

  /** w×h RGB gradient: pixel (x, y) = (x*17 % 256, y*29 % 256, (x+y)*13 % 256). */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = x * 17 % 256
      val g = y * 29 % 256
      val b = (x + y) * 13 % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "payload")
      .withColumn("format", lit("image/png"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
  }

  test("binaryFile source → decodeImageBatch: the real media ingestion path") {
    // the production entry point for media corpora: files on storage read
    // through Spark's binaryFile source (path/length/content columns, one
    // row per file, no driver-side file IO), straight into the decoder
    val dir = java.nio.file.Files.createTempDirectory("graft-binfiles")
    Seq(3 -> gradientPng(8, 6), 7 -> gradientPng(16, 4)).foreach { case (i, png) =>
      java.nio.file.Files.write(dir.resolve(s"img_$i.png"), png)
    }
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir.toString)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1).cast("long").as("doc_id"),
        col("content").as("payload"))
    val stats = Multimodal.decodeImageBatch(media).collect()
      .map(s => s.doc_id -> s).toMap
    assert(stats.keySet == Set(3L, 7L), s"one row per file: ${stats.keySet}")
    assert(stats(3L).ok && stats(3L).width == 8 && stats(3L).height == 6)
    assert(stats(7L).ok && stats(7L).width == 16 && stats(7L).height == 4)
  }

  test("mixed good/corrupt image dir splits into decoded stats + quarantined paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binfiles-q")
    java.nio.file.Files.write(dir.resolve("ok_a.png"), gradientPng(8, 6))
    java.nio.file.Files.write(dir.resolve("ok_b.png"), gradientPng(16, 4))
    // passes the *.png glob but is not a PNG: the quarantine's reason to exist
    java.nio.file.Files.write(dir.resolve("broken.png"),
      Array.fill[Byte](64)(0x2f))
    // truncated download: valid PNG magic, body cut off
    // (zero-length files never reach the split: binaryFile lists no row
    // for them, so they are a listing concern, not a decode one)
    java.nio.file.Files.write(dir.resolve("truncated.png"),
      gradientPng(8, 6).take(20))

    val (good, quarantined) =
      Multimodal.imageDirWithQuarantine(spark, dir.toString, "*.png")
    val g = good.collect().map(r =>
      r.getAs[String]("path").split('/').last ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    assert(g == Map("ok_a.png" -> ((8, 6)), "ok_b.png" -> ((16, 4))),
      s"good half must carry real decoded stats: $g")
    val q = quarantined.collect().map(r =>
      r.getAs[String]("path").split('/').last -> r.getAs[Long]("n_bytes")).toMap
    assert(q == Map("broken.png" -> 64L, "truncated.png" -> 20L),
      s"rejects keep path + size evidence: $q")
  }

  test("decodeImageBatch reads real PNG pixels: dims, channels, exact channel means") {
    val w = 8; val h = 6
    val media = mediaDf(Seq(1L -> gradientPng(w, h), 2L -> gradientPng(16, 4)))
    val stats = Multimodal.decodeImageBatch(media).collect()
      .map(s => s.doc_id -> s).toMap

    val s1 = stats(1L)
    assert(s1.ok && s1.width == w && s1.height == h && s1.channels == 3)
    // PNG is lossless → means must match the generator arithmetic exactly
    val expR = (0 until w).map(x => x * 17 % 256).sum.toDouble / w
    val expG = (0 until h).map(y => y * 29 % 256).sum.toDouble / h
    val expB = (for (y <- 0 until h; x <- 0 until w) yield (x + y) * 13 % 256)
      .sum.toDouble / (w * h)
    assert(math.abs(s1.mean_r - expR) < 1e-9, s"mean_r ${s1.mean_r} != $expR")
    assert(math.abs(s1.mean_g - expG) < 1e-9, s"mean_g ${s1.mean_g} != $expG")
    assert(math.abs(s1.mean_b - expB) < 1e-9, s"mean_b ${s1.mean_b} != $expB")
    assert(stats(2L).ok && stats(2L).width == 16 && stats(2L).height == 4)
  }

  test("corrupt payloads surface as ok=false rows, not task failures") {
    val media = mediaDf(Seq(
      1L -> gradientPng(4, 4),
      2L -> Array[Byte](1, 2, 3, 4, 5),
      3L -> Array.emptyByteArray))
    val stats = Multimodal.decodeImageBatch(media).collect()
      .map(s => s.doc_id -> s).toMap
    assert(stats(1L).ok)
    assert(!stats(2L).ok && stats(2L).width == -1)
    assert(!stats(3L).ok)
  }

  test("resizeImageBatch scales to maxDim, emits decodable PNGs, never upscales") {
    val media = mediaDf(Seq(
      1L -> gradientPng(64, 32), // downscale: max dim 64 → 16 gives 16x8
      2L -> gradientPng(8, 8),   // already under maxDim → untouched dims
      3L -> Array[Byte](9, 9, 9))) // corrupt → (-1, -1) passthrough
    val out = Multimodal.resizeImageBatch(media, maxDim = 16).collect()
      .map(r => r._1 -> r).toMap

    assert(out(1L)._3 == 16 && out(1L)._4 == 8)
    val reread = ImageIO.read(new ByteArrayInputStream(out(1L)._2))
    assert(reread != null && reread.getWidth == 16 && reread.getHeight == 8,
      "resized payload must itself be a valid PNG")
    assert(out(2L)._3 == 8 && out(2L)._4 == 8, "must not upscale")
    assert(out(3L)._3 == -1 && out(3L)._2.isEmpty)

    // bilinear downscale of a smooth gradient preserves channel means
    // approximately — a sanity bound, not a pixel-exact claim
    val orig = Multimodal.decodeImageBatch(mediaDf(Seq(1L -> gradientPng(64, 32))))
      .collect().head
    val small = Multimodal.decodeImageBatch(
      mediaDf(Seq(1L -> out(1L)._2))).collect().head
    assert(math.abs(orig.mean_r - small.mean_r) < 16.0)
    assert(math.abs(orig.mean_g - small.mean_g) < 16.0)
  }
}
