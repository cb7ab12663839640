package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ops.TableManifest

/** The manifest's per-file `filestat` inventory and the planning index
  * fabricated from it ([[ManifestFileIndex]]): byte-exact lengths and
  * mtimes land in the manifest at every commit, so planning a provider
  * scan makes zero filesystem calls (measured: flat ~8ms at 128→2048
  * files vs ~0.6→8s for the delegate's O(files) path discovery —
  * `ManifestPlanningMicroBench`), and the gaps legacy manifests leave are
  * filled by ONE directory listing, never per-file stats. */
class ManifestFileIndexSpec extends SparkSpec {

  import spark.implicits._

  private def fsTruth(dir: String): Map[String, (Long, Long)] =
    new java.io.File(dir).listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("every committing surface inventories exact lengths and mtimes") {
    val dir = java.nio.file.Files.createTempDirectory("gm-fstat").toString
    // publish
    TableManifest.publish(
      (1L to 50L).toDF("id").repartition(2), dir)
    // sql insert
    Seq(51L, 52L).toDF("id")
      .write.format("graft-manifest").mode("append").save(dir)
    // streaming-shaped append
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq(53L).toDF("id"), batchId = 1L, dir)
    val inv = TableManifest.readFileStat(spark, dir)
    val truth = fsTruth(dir)
    val listed = TableManifest.readHead(spark, dir).get._2
    assert(listed.nonEmpty && listed.forall(inv.contains),
      s"files missing from the inventory: ${listed.filterNot(inv.contains)}")
    listed.foreach { n =>
      assert(inv(n) == truth(n), s"$n: inventory ${inv(n)} != fs ${truth(n)}")
    }
    // a rewrite (compaction) re-inventories the files it creates
    graft.ops.Compaction.compactInPlace(spark, dir)
    val inv2 = TableManifest.readFileStat(spark, dir)
    val listed2 = TableManifest.readHead(spark, dir).get._2
    val truth2 = fsTruth(dir)
    listed2.foreach { n =>
      assert(inv2(n) == truth2(n), s"post-compaction $n: ${inv2(n)} != ${truth2(n)}")
    }
  }

  test("provider scans plan from the inventory and read correctly") {
    val dir = java.nio.file.Files.createTempDirectory("gm-fidx").toString
    (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "s")
      .repartition(8).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val back = spark.read.format("graft-manifest").load(dir)
    assert(back.count() == 1000L)
    assert(back.filter($"k" <= 10).select("s").as[String].collect().sorted
      .toSeq == (1L to 10L).map(i => s"v$i").sorted)
    // plan-level size estimate comes from the carried lengths (broadcast
    // decisions keep working): nonzero and equal to the inventory sum
    val stats = back.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0, "zero sizeInBytes would break join sizing")
    // the estimate is driven by the carried lengths: it must cover the
    // inventory sum (FileScan may scale it by a compression factor but
    // never below the raw bytes for an all-column read)
    val invSum = TableManifest.readFileStat(spark, dir).values.map(_._1).sum
    assert(stats >= invSum, s"sizeInBytes $stats < inventory sum $invSum")
  }

  test("legacy manifests without an inventory scan via one listing") {
    val dir = java.nio.file.Files.createTempDirectory("gm-legacy").toString
    (1L to 20L).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(dir)
    val names = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(_.getName).sorted
    Files.createDirectories(Paths.get(dir, "_manifest"))
    val body = s"""{"version":1,"token":"t","files":[""" +
      names.map("\"" + _ + "\"").mkString(",") + "]}"
    Files.write(Paths.get(dir, "_manifest", f"v${1L}%020d.json"),
      body.getBytes(StandardCharsets.UTF_8))
    assert(TableManifest.readFileStat(spark, dir).isEmpty)
    assert(spark.read.format("graft-manifest").load(dir).count() == 20L)
    // analyzeSchema backfills the inventory along with the schema
    TableManifest.analyzeSchema(spark, dir)
    val inv = TableManifest.readFileStat(spark, dir)
    assert(names.forall(inv.contains), "bootstrap left inventory gaps")
    assert(inv == fsTruth(dir).filter(kv => names.contains(kv._1)))
  }

  test("an uninventoried ghost file fails loudly at planning") {
    val dir = java.nio.file.Files.createTempDirectory("gm-ghost").toString
    Seq(1L).toDF("id").repartition(1).write.mode("overwrite").parquet(dir)
    val names = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(_.getName)
    Files.createDirectories(Paths.get(dir, "_manifest"))
    val body = s"""{"version":1,"token":"t","files":[""" +
      (names :+ "ghost.parquet").map("\"" + _ + "\"").mkString(",") + "]}"
    Files.write(Paths.get(dir, "_manifest", f"v${1L}%020d.json"),
      body.getBytes(StandardCharsets.UTF_8))
    val e = intercept[Exception] {
      spark.read.format("graft-manifest").load(dir)
        .schema // force resolution
      spark.read.format("graft-manifest").load(dir).count()
    }
    assert(e.getMessage.contains("ghost.parquet"),
      s"expected the loud planning error, got: ${e.getMessage}")
  }
}
