package graft.ops

import graft.SparkSpec

/** DV-DENSITY MAINTENANCE (round-18 verdict #3).
  *
  * Write-once union sidecars make k repeated small deletes to one file
  * cost O(k²) total sidecar bytes and leave k referenced sidecars until
  * vacuum — correct, but un-triggered: nothing routed a dv-dense file
  * to materialization except a manual OPTIMIZE. Now a dv write that
  * would push a file's deleted fraction past
  * `spark.graft.dv.materializeThreshold` (default 0.5) MATERIALIZES
  * that file locally instead: its survivors rewrite into a fresh clean
  * file in the same commit, the dense entry never exists, and no global
  * OPTIMIZE is needed. DESCRIBE DETAIL surfaces the per-table dv health
  * (file count, deleted rows, max density) operators size this by. */
class DvDensitySpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def withDv[A](f: => A): A = {
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    try f finally spark.conf.unset("spark.graft.dml.deletionVectors")
  }

  /** Tracked (k, v): one file of 10 rows k = 0..9. */
  private def table10(tag: String): String = {
    val dir = tmpDir(tag)
    (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    dir
  }

  private def keysOf(dir: String): Seq[Long] =
    TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted

  test("a delete crossing the default 0.5 density materializes the file locally — no sidecar, clean listing") {
    val dir = table10("gm-dvd-trigger")
    val before = TableManifest.read(spark, dir).get._2.toSet
    // 4/10 stays merge-on-read...
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(0L, 1L, 2L, 3L)) }
    assert(TableManifest.readDvs(spark, dir).size == 1,
      "below threshold: sidecar route")
    assert(TableManifest.read(spark, dir).get._2.toSet == before)
    // ...one more (5/10 = the threshold) routes THIS file to local
    // materialization: survivors rewritten, dv entry gone, old file out
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
    assert(TableManifest.readDvs(spark, dir).isEmpty,
      "at/over threshold: materialized, no dense sidecar")
    val after = TableManifest.read(spark, dir).get._2.toSet
    assert(after.intersect(before).isEmpty && after.size == 1,
      s"survivor file replaced the victim: $before -> $after")
    assert(keysOf(dir) == Seq(5L, 6L, 7L, 8L, 9L),
      "survivors exactly — neither resurrected nor over-deleted")
    // time travel still serves the dv'd intermediate state
    val head = TableManifest.read(spark, dir).get._1
    assert(TableManifest.readTableAt(spark, dir, head - 1)
      .count() == 6L, "the sidecar-era version still resolves its dv")
  }

  test("threshold is a session conf: 1.1 never materializes, 0.05 always does") {
    val loose = table10("gm-dvd-loose")
    spark.conf.set("spark.graft.dv.materializeThreshold", "1.1")
    try withDv {
      TableManifest.eraseWhereEq(spark, loose, "k", (0L to 8L))
    } finally spark.conf.unset("spark.graft.dv.materializeThreshold")
    assert(TableManifest.readDvs(spark, loose).size == 1 &&
      TableManifest.readDvs(spark, loose).values.head._2 == 9L,
      "disabled threshold keeps even a 90% delete merge-on-read")

    val tight = table10("gm-dvd-tight")
    spark.conf.set("spark.graft.dv.materializeThreshold", "0.05")
    try withDv {
      TableManifest.eraseWhereEq(spark, tight, "k", Seq(7L))
    } finally spark.conf.unset("spark.graft.dv.materializeThreshold")
    assert(TableManifest.readDvs(spark, tight).isEmpty,
      "a 10% delete over a 5% threshold materializes immediately")
    assert(keysOf(tight) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L))
  }

  test("materialization composes with UPDATE: replacements append, survivors rewrite, updated view exact") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = table10("gm-dvd-upd")
    spark.conf.set("spark.graft.dv.materializeThreshold", "0.3")
    try withDv {
      // 6/10 rows match: over the 0.3 threshold → the victim file
      // materializes; updated rows ride the replacement append
      TableManifest.updateWhere(spark, dir,
        Seq("v" -> (col("v") + lit(1000L))), Some(col("k") < 6L))
    } finally spark.conf.unset("spark.graft.dv.materializeThreshold")
    assert(TableManifest.readDvs(spark, dir).isEmpty)
    val got = TableManifest.readTable(spark, dir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == (0L until 10L).map(k =>
      (k, if (k < 6L) k * 10L + 1000L else k * 10L)).sorted, s"$got")
  }

  test("HIVE-PARTITIONED materialization keeps the layout: survivors land under their k=v dirs") {
    val dir = tmpDir("gm-dvd-part")
    val df = (0L until 10L).map(k => (k, k * 10L, if (k < 5) "a" else "b"))
      .toDF("k", "v", "p")
    TableManifest.publishPartitioned(df.repartition(1), dir, Seq("p"))
    spark.conf.set("spark.graft.dv.materializeThreshold", "0.05")
    try withDv {
      // one row per partition file (1/5 = 20% >= 5%): both materialize
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L, 7L))
    } finally spark.conf.unset("spark.graft.dv.materializeThreshold")
    assert(TableManifest.readDvs(spark, dir).isEmpty,
      "both partition files materialized")
    val names = TableManifest.read(spark, dir).get._2
    assert(names.forall(n => n.startsWith("p=a/") || n.startsWith("p=b/")),
      s"survivors stay under their partition dirs: $names")
    val got = TableManifest.readTable(spark, dir)
      .select("k", "p").as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((0L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"), (8L, "b"), (9L, "b")), s"$got")
  }

  // DESCRIBE DETAIL's dv-health columns are pinned in
  // graft.plans.MaintenanceSqlSpec (the statement needs the graft
  // parser, which the shared plain session doesn't carry)
}
