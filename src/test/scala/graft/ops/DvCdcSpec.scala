package graft.ops

import graft.SparkSpec

/** DV'd CDC RANGE FIDELITY — the round-18 verdict #6 decision, pinned.
  *
  * THE CONTRACT: `addedBetween(from, to)` serves the range's fresh
  * files AS OF `to` — schema, renames, and deletion vectors all
  * resolve at the range END (version-addressed, so one range always
  * replays identically). Consequences, each asserted below:
  *
  *  1. a deletion committed WITHIN (from, to] on a file added within
  *     the range is applied (the consumer never sees the dead rows);
  *  2. a deletion committed AFTER `to` is NOT applied (the range is a
  *     fact about `to`, not about the head);
  *  3. chunked replay ((v0,v1] then (v1,v2]) can differ from the
  *     single jump ((v0,v2]) by exactly the deletions that land in a
  *     later chunk on an earlier chunk's file — the file-granularity
  *     caveat's dv twin. Callers that poll chunk-by-chunk inherit it;
  *     the STREAMING source closes it for its own chunks by extending
  *     admission boundaries until every admitted file's dv entry
  *     agrees with the head's (ManifestStream dv-coherence walk).
  */
class DvCdcSpec extends SparkSpec {

  import spark.implicits._

  private def withDv[A](f: => A): A = {
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    spark.conf.set("spark.graft.dv.materializeThreshold", "1.1")
    try f finally {
      spark.conf.unset("spark.graft.dml.deletionVectors")
      spark.conf.unset("spark.graft.dv.materializeThreshold")
    }
  }

  private def ks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").as[Long].collect().toSeq.sorted

  test("dvs resolve at the range END: in-range deletions applied, post-range deletions not") {
    val dir = java.nio.file.Files.createTempDirectory("gm-dvcdc").toString
    (0L until 3L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val v1 = TableManifest.init(spark, dir)                       // file A
    TableManifest.analyze(spark, dir, Seq("k"))
    val v2 = withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L)) }
    val v3 = withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(2L)) }
    // (0, v2]: A is fresh, v2's dv (k=1) applies; v3's (k=2) does NOT
    assert(ks(TableManifest.addedBetween(spark, dir, 0L, v2)) ==
      Seq(0L, 2L), "range end = v2: only v2's deletions")
    // (0, v3]: both deletions applied
    assert(ks(TableManifest.addedBetween(spark, dir, 0L, v3)) == Seq(0L))
    // a dv-only range adds NO files — deletions alone never re-deliver
    assert(TableManifest.addedBetween(spark, dir, v2, v3).count() == 0L)
    // replaying the same range later reproduces it exactly (version-
    // addressed dvs, write-once sidecars)
    assert(ks(TableManifest.addedBetween(spark, dir, 0L, v2)) ==
      Seq(0L, 2L), "ranges are replay-deterministic")
    assert(v1 < v2 && v2 < v3)
  }

  test("chunk-vs-jump divergence is exactly the later-chunk deletions on earlier-chunk files") {
    val dir = java.nio.file.Files.createTempDirectory("gm-dvcdc2").toString
    (0L until 3L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)                                 // v1: A
    TableManifest.analyze(spark, dir, Seq("k"))
    val v1a = TableManifest.read(spark, dir).get._1
    (3L until 6L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    val v2 = TableManifest.read(spark, dir).get._1                 // B
    val v3 = withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(0L)) }
    // the jump applies v3's dv to A
    val jump = ks(TableManifest.addedBetween(spark, dir, 0L, v3))
    assert(jump == Seq(1L, 2L, 3L, 4L, 5L))
    // the chunked replay delivered A at v1a — BEFORE the dv existed —
    // so k=0 rides the first chunk and nothing retracts it: the
    // documented divergence, k=0 exactly
    val chunked =
      ks(TableManifest.addedBetween(spark, dir, 0L, v1a)) ++
        ks(TableManifest.addedBetween(spark, dir, v1a, v2)) ++
        ks(TableManifest.addedBetween(spark, dir, v2, v3))
    assert(chunked.sorted == Seq(0L, 1L, 2L, 3L, 4L, 5L),
      s"chunked union = jump + the divergent deletion: $chunked")
  }
}
