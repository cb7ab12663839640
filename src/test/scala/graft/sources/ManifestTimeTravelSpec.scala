package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest

/** `TIMESTAMP AS OF` time travel: `timestampAsOf` resolves to the newest
  * version whose BODY-recorded commit time (the `ctime` field stamped at
  * commit — exact millis, no filesystem-mtime granularity or object-store
  * semantics; monotonized by running max) is at or before the asked
  * wall-clock instant, then pins that version's snapshot exactly like
  * `versionAsOf`. Pre-ctime manifests fall back to the manifest file's
  * mtime. Asking for a time before the first surviving commit is LOUD —
  * never silently the oldest snapshot. */
class ManifestTimeTravelSpec extends SparkSpec {

  import spark.implicits._

  test("timestampAsOf picks the covering version; too-early is loud; writes rejected") {
    val dir = java.nio.file.Files.createTempDirectory("gm-tt").toString
    Seq((1L, "v1")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    Seq((2L, "v2")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    // pin deterministic commit times instead of sleeping: v1 at T-10s
    // via its BODY-recorded ctime, v2 at T-5s via the MTIME FALLBACK
    // (its ctime field stripped — the pre-ctime manifest shape), so one
    // test drills both resolution sources
    val now = System.currentTimeMillis()
    val mdir = new java.io.File(dir, "_manifest")
    val manifests = mdir.listFiles().filter(_.getName.endsWith(".json")).sorted
    assert(manifests.length == 2)
    def patchCtime(f: java.io.File, to: Option[Long]): Unit = {
      val body = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(body.contains("\"ctime\":"), "commits record their wall clock")
      val patched = body.replaceAll(""""ctime":[0-9]+,""",
        to.map(t => s""""ctime":$t,""").getOrElse(""))
      java.nio.file.Files.write(f.toPath, patched.getBytes("UTF-8"))
    }
    patchCtime(manifests(0), Some(now - 10000))
    patchCtime(manifests(1), None) // pre-ctime shape: mtime fallback
    assert(manifests(1).setLastModified(now - 5000))

    def at(t: String) = spark.read.format("graft-manifest")
      .option("timestampAsOf", t).load(dir)
    // between the commits: v1's snapshot
    assert(at((now - 7000).toString).count() == 1L)
    // after both (ISO form): the head
    assert(at(java.time.Instant.ofEpochMilli(now).toString).count() == 2L)
    // before the table existed: loud
    val e = intercept[Exception] { at((now - 60000).toString).count() }
    assert(e.getMessage.contains("no version"),
      s"expected the too-early error, got: ${e.getMessage}")
    // garbage value: loud
    intercept[Exception] { at("not-a-time").count() }
    // writes through a timestampAsOf read are rejected at planning
    val w = intercept[Exception] {
      Seq((3L, "x")).toDF("id", "s").write.format("graft-manifest")
        .mode("append").option("timestampAsOf", now.toString).save(dir)
    }
    assert(w.getMessage.contains("time-travel"),
      s"expected the time-travel write rejection, got: ${w.getMessage}")
    // the library twin agrees
    assert(TableManifest.readTableAsOf(spark, dir, now - 7000).count() == 1L)
    assert(TableManifest.versionAsOfTime(spark, dir, now - 60000).isEmpty)
  }
}
