package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Round 16: the advisory `_manifest/_head` hint. The hint is purely an
  * RPC optimization — every degraded state must fall back to the full
  * listing and resolve the SAME head, never a stale or wrong one. */
class HeadHintSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String = {
    val dir = Files.createTempDirectory("gm-hint").toString
    Seq((1L, "a")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    dir
  }

  private def hintPath(dir: String) = Paths.get(dir, "_manifest", "_head")

  private def writeHintRaw(dir: String, body: String): Unit = {
    // fabricating through raw nio behind the checksummed local fs must
    // drop the stale CRC or reads see ChecksumException (by design the
    // hint read treats that as hint-absent)
    Files.deleteIfExists(Paths.get(dir, "_manifest", "._head.crc"))
    Files.write(hintPath(dir), body.getBytes(StandardCharsets.UTF_8))
  }

  test("commits write the hint; reads resolve the same head with and without it") {
    val dir = newTable()
    val (v, names, _) = TableManifest.readHead(spark, dir).get
    assert(Files.exists(hintPath(dir)), "init's commit writes the hint")
    assert(new String(Files.readAllBytes(hintPath(dir)),
      StandardCharsets.UTF_8).contains(s""""v":$v"""))
    Files.delete(hintPath(dir))
    Files.deleteIfExists(Paths.get(dir, "_manifest", "._head.crc"))
    val (v2, names2, _) = TableManifest.readHead(spark, dir).get
    assert(v2 == v && names2 == names, "listing fallback serves the same head")
  }

  test("a STALE hint probes forward to the true head") {
    val dir = newTable()
    (1 to 5).foreach { i =>
      var won = false
      while (!won) {
        val (v, names, hwm) = TableManifest.readHead(spark, dir).get
        won = TableManifest.commitIf(spark, dir,
          names :+ s"hint-$i.parquet", v, hwm).isDefined
      }
    }
    val head = TableManifest.readHead(spark, dir).get._1
    writeHintRaw(dir, """{"v":1}""") // stale by 5 commits
    val (v, names, _) = TableManifest.readHead(spark, dir).get
    assert(v == head, s"stale hint must probe forward: got v$v, head $head")
    assert((1 to 5).forall(i => names.contains(s"hint-$i.parquet")))
  }

  test("garbled, future, and vacuum-pruned hints fall back to the listing") {
    val dir = newTable()
    val head = TableManifest.readHead(spark, dir).get._1
    writeHintRaw(dir, "not json at all")
    assert(TableManifest.readHead(spark, dir).get._1 == head)
    // FUTURE hint (names a version that does not exist): the probe's
    // first stat misses -> full listing
    writeHintRaw(dir, s"""{"v":${head + 50}}""")
    assert(TableManifest.readHead(spark, dir).get._1 == head)
    // hint naming a version RETENTION later pruned
    (1 to 4).foreach { i =>
      var won = false
      while (!won) {
        val (v, names, hwm) = TableManifest.readHead(spark, dir).get
        won = TableManifest.commitIf(spark, dir,
          names :+ s"pr-$i.parquet", v, hwm).isDefined
      }
    }
    TableManifest.vacuum(spark, dir, graceMillis = 0L, retainManifests = 1)
    writeHintRaw(dir, """{"v":1}""")
    val after = TableManifest.readHead(spark, dir).get
    assert(after._1 == head + 4 &&
      (1 to 4).forall(i => after._2.contains(s"pr-$i.parquet")))
  }

  test("a wiped-and-recreated table is never served a stale hinted head") {
    val dir = newTable()
    (1 to 3).foreach { i =>
      var won = false
      while (!won) {
        val (v, names, hwm) = TableManifest.readHead(spark, dir).get
        won = TableManifest.commitIf(spark, dir,
          names :+ s"w-$i.parquet", v, hwm).isDefined
      }
    }
    // wipe the whole table dir (hint goes with it) and re-create
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
    Seq((9L, "z")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val (v, names, _) = TableManifest.readHead(spark, dir).get
    assert(v == 1L, s"fresh table mints v1, got v$v")
    assert(!names.exists(_.startsWith("w-")), "no stale head leaks through")
  }
}
