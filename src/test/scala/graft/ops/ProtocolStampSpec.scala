package graft.ops

import graft.SparkSpec

/** READER PROTOCOL STAMP (round-18 verdict #2).
  *
  * A manifest body whose content an older build would silently misread
  * — deleted rows served because it never parsed the `dvs` section,
  * stale physical columns because it ignored the column mapping —
  * stamps `"features":[...]` with the reader capabilities it requires.
  * Readers refuse unknown required features with a NAMED error
  * ([[TableManifest.UnsupportedTableFeatureException]]) instead of a
  * wrong answer. Plain tables carry no section at all, so they stay
  * readable by every build: the stamp is paid only when the feature is.
  */
class ProtocolStampSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def withDv[A](f: => A): A = {
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    // threshold pinned OFF: these tests drive write-once sidecar
    // mechanics on tiny files; DvDensitySpec pins the 0.5 default
    spark.conf.set("spark.graft.dv.materializeThreshold", "1.1")
    try f finally {
      spark.conf.unset("spark.graft.dml.deletionVectors")
      spark.conf.unset("spark.graft.dv.materializeThreshold")
    }
  }

  private def table3(tag: String): String = {
    val dir = tmpDir(tag)
    (0L until 3L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    (3L until 6L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    dir
  }

  private def headBody(dir: String): String = {
    val m = new java.io.File(dir, "_manifest")
    val head = m.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.json")).max
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(m, head).toPath), "UTF-8")
  }

  private def featuresOf(body: String): Set[String] =
    """"features":\[([^\]]*)\]""".r.findFirstMatchIn(body).map { m =>
      "\"([^\"]*)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSet
    }.getOrElse(Set.empty)

  test("plain tables never pay the stamp; dv and colmap bodies stamp exactly what they carry") {
    val plain = table3("gm-stamp-plain")
    assert(featuresOf(headBody(plain)).isEmpty,
      "a feature-free table stays readable by every build")
    assert(!headBody(plain).contains("\"features\""),
      "no empty features section either")

    val dvd = table3("gm-stamp-dv")
    withDv { TableManifest.eraseWhereEq(spark, dvd, "k", Seq(1L)) }
    assert(featuresOf(headBody(dvd)) == Set("dvs"),
      s"dv'd body requires exactly the dvs capability: ${featuresOf(headBody(dvd))}")

    val ren = table3("gm-stamp-ren")
    TableManifest.renameColumn(spark, ren, "v", "val")
    assert(featuresOf(headBody(ren)) == Set("colmap"),
      s"renamed body requires exactly the colmap capability")

    // both at once: a dv DELETE on the renamed table checkpoints/overlays
    // with the union of what the body carries
    withDv { TableManifest.eraseWhereEq(spark, ren, "k", Seq(0L)) }
    val feats = featuresOf(headBody(ren))
    assert(feats.contains("dvs"), s"dv overlay stamped: $feats")
    assert(TableManifest.readTable(spark, ren).count() == 5L)
  }

  test("an unknown REQUIRED feature refuses loudly at open — head read, time travel, and history alike") {
    val dir = table3("gm-stamp-unknown")
    val headV = TableManifest.read(spark, dir).get._1
    // fabricate the next committed version stamping a capability this
    // build does not implement (what a FUTURE build's table looks like
    // to this one) — fresh file name, so no stale Hadoop .crc twin
    val body =
      s"""{"version":${headV + 1},"token":"fab","features":["frobnicate"],""" +
        s""""files":[]}"""
    val target = new java.io.File(new java.io.File(dir, "_manifest"),
      f"v${headV + 1}%020d.json")
    java.nio.file.Files.write(target.toPath, body.getBytes("UTF-8"))
    val err = intercept[TableManifest.UnsupportedTableFeatureException] {
      TableManifest.readTable(spark, dir).count()
    }
    assert(err.getMessage.contains("frobnicate"),
      s"the refusal names the missing capability: ${err.getMessage}")
    assert(err.getMessage.contains("upgrade"), err.getMessage)
    // time travel TO the stamped version refuses the same way; versions
    // BEFORE it stay readable (their bodies don't require the feature)
    intercept[TableManifest.UnsupportedTableFeatureException] {
      TableManifest.readTableAt(spark, dir, headV + 1).count()
    }
    assert(TableManifest.readTableAt(spark, dir, headV).count() == 6L,
      "pre-skew versions stay serveable")
  }

  test("a pre-stamp body (no features section) parses as requiring nothing") {
    val dir = table3("gm-stamp-legacy")
    // every body this very test wrote before any dv/rename IS the
    // pre-stamp shape; the reads above already prove it, pinned here
    assert(TableManifest.readTable(spark, dir).count() == 6L)
    assert(TableManifest.readDvs(spark, dir).isEmpty)
  }
}
