package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest

/** `TIMESTAMP AS OF` time travel: `timestampAsOf` resolves to the newest
  * version committed at or before the asked wall-clock instant (commit
  * creation is sequential, so manifest mtimes are monotone in version)
  * and then pins that version's snapshot exactly like `versionAsOf`.
  * Asking for a time before the first surviving commit is LOUD — never
  * silently the oldest snapshot. */
class ManifestTimeTravelSpec extends SparkSpec {

  import spark.implicits._

  test("timestampAsOf picks the covering version; too-early is loud; writes rejected") {
    val dir = java.nio.file.Files.createTempDirectory("gm-tt").toString
    Seq((1L, "v1")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    Seq((2L, "v2")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    // pin deterministic commit times instead of sleeping: v1 at T-10s,
    // v2 at T-5s (mtime monotonicity is the resolution's contract)
    val now = System.currentTimeMillis()
    val mdir = new java.io.File(dir, "_manifest")
    val manifests = mdir.listFiles().filter(_.getName.endsWith(".json")).sorted
    assert(manifests.length == 2)
    assert(manifests(0).setLastModified(now - 10000))
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
