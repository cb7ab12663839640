package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Continuous media ingestion ([[MediaIngest.start]]): new files decode
  * exactly once per landing, junk quarantines, restarts don't re-decode. */
class MediaIngestSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("tail a landing dir: per-batch routing, quarantine, no re-decode on restart") {
    val land = java.nio.file.Files.createTempDirectory("media-land")
    val stats = java.nio.file.Files.createTempDirectory("media-stats").toString + "/out"
    val quar = java.nio.file.Files.createTempDirectory("media-quar").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("media-ckpt").toString

    def drain(): Unit = {
      val q = MediaIngest.start(spark, land.toString, stats, quar, ckpt)
      q.awaitTermination(60000)
    }
    def statRows = spark.read.parquet(stats)
      .select(col("kind"), col("path")).collect()
      .map(r => (r.getString(0), r.getString(1).split('/').last)).toSet

    java.nio.file.Files.write(
      land.resolve("a.png"), pngBytes(3, 3, 0x808080))
    java.nio.file.Files.write(
      land.resolve("junk.bin"), "not media".getBytes)
    drain()
    assert(statRows === Set(("image", "a.png")))
    assert(spark.read.parquet(quar).select("path").collect()
      .map(_.getString(0).split('/').last).toSet === Set("junk.bin"))

    // second landing: only the new file decodes; the old one is not
    // re-appended (file-source checkpoint tracks processed files)
    java.nio.file.Files.write(
      land.resolve("b.png"), pngBytes(2, 2, 0x102030))
    drain()
    assert(statRows === Set(("image", "a.png"), ("image", "b.png")))
    assert(spark.read.parquet(stats).count() === 2L)

    // drain with nothing new: outputs unchanged
    drain()
    assert(spark.read.parquet(stats).count() === 2L)
    assert(spark.read.parquet(quar).count() === 1L)
  }
}
