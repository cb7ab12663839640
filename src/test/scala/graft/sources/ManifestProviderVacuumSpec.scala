package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest

/** The one interleaving the provider path had not drilled: a relation is
  * RESOLVED (analysis pins the snapshot's explicit file paths), then a
  * snapshot-replacing publish plus a vacuum land BEFORE the scan runs.
  * Contract under drill:
  *  - with a grace covering reader runtime, vacuum must NOT reclaim the
  *    just-delisted files (delisting time, not file mtime, gates the
  *    delete), so the pinned scan completes on its own snapshot;
  *  - with zero grace the files are legitimately reclaimed and the pinned
  *    scan must fail LOUDLY — never silently return partial rows. */
class ManifestProviderVacuumSpec extends SparkSpec {

  import spark.implicits._

  private def tracked(n: Int): (String, Set[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("gm-vac").toString
    val rows = (1 to n).map(i => (i.toLong, s"old$i"))
    TableManifest.publish(rows.toDF("id", "s"), dir)
    (dir, rows.toSet)
  }

  test("graced vacuum keeps a pinned scan's just-delisted files; scan completes on its snapshot") {
    val (dir, oldRows) = tracked(5)
    // analysis pins v1's explicit file paths
    val pinnedDf = spark.read.format("graft-manifest").load(dir)
    // a full-snapshot publish delists every v1 file, and a vacuum runs
    // concurrently — with a grace longer than any in-flight reader
    TableManifest.publish(
      (10 to 12).map(i => (i.toLong, s"new$i")).toDF("id", "s"), dir)
    val deleted = TableManifest.vacuum(spark, dir, graceMillis = 600000L)
    assert(deleted.forall(!_.endsWith(".parquet")) || deleted.isEmpty,
      s"graced vacuum reclaimed just-delisted data files: $deleted")
    // the pinned relation still scans ITS snapshot — not the new head,
    // not a partial mix
    val got = pinnedDf.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == oldRows, s"pinned scan diverged: $got")
    // a fresh resolution sees the new head
    val fresh = spark.read.format("graft-manifest").load(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fresh == (10 to 12).map(i => (i.toLong, s"new$i")).toSet)
  }

  test("zero-grace vacuum reclaims the pinned files; the stale scan fails loudly, never partially") {
    val (dir, _) = tracked(5)
    val pinnedDf = spark.read.format("graft-manifest").load(dir)
    val pinnedFiles = TableManifest.read(spark, dir).get._2
    TableManifest.publish(
      (10 to 12).map(i => (i.toLong, s"new$i")).toDF("id", "s"), dir)
    val deleted = TableManifest.vacuum(spark, dir, graceMillis = 0L)
    assert(pinnedFiles.forall(deleted.contains),
      s"zero-grace vacuum should reclaim all delisted files; got $deleted")
    val e = intercept[Exception] { pinnedDf.collect() }
    // loud failure naming the missing file — not an empty/partial result
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(c.getMessage).toLowerCase.contains("file") &&
          String.valueOf(c.getMessage).toLowerCase.contains("not")),
      s"expected a missing-file failure, got: $e")
  }
}
