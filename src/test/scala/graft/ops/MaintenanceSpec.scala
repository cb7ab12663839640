package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one-call housekeeping composite: a fragmented, appended-to tracked
  * table comes out compacted, stat'd, bloom'd, and vacuumed — with
  * contents bit-identical and consumers still live. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("run: compact + analyze + bloom + vacuum converge on a messy table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-maint").toString
    // 16 tiny fragments + 4 streaming appends + a slow consumer marker
    spark.range(1000).selectExpr("id AS k", "id % 7 AS grp")
      .repartition(16)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    (0L to 3L).foreach { i =>
      graft.streaming.ManifestAppendSink.applyBatch(
        Seq(10000L + i).toDF("k").withColumn("grp", lit(-1L)).coalesce(1),
        i, dir)
    }
    TableManifest.consumeNew(spark, dir, "tail") { (_, _, _) => () }
    val before = TableManifest.readTable(spark, dir)
      .agg(count(lit(1)), sum("k")).as[(Long, Long)].collect()(0)

    val report = Maintenance.run(spark, dir,
      statsCols = Seq("k", "grp"), bloomCol = Some("k"),
      targetBytes = 1L << 30, minFileBytes = 1L << 30,
      graceMillis = 0L, retainManifests = 4)

    assert(report.compaction.filesBefore == 20 &&
      report.compaction.filesAfter == 1, s"${report.compaction}")
    assert(report.statsVersion.isDefined && report.bloomVersion.isDefined)
    assert(report.vacuumed.size >= 20, "fragments reclaimed")
    // contents bit-identical through the whole pipeline
    val after = TableManifest.readTable(spark, dir)
      .agg(count(lit(1)), sum("k")).as[(Long, Long)].collect()(0)
    assert(after == before)
    // the surviving file is stat'd AND bloom'd
    assert(TableManifest.readStats(spark, dir).nonEmpty)
    assert(TableManifest.readBloom(spark, dir).nonEmpty)
    assert(TableManifest.readTableRange(spark, dir, "k", 10000L, 10003L)
      .count() == 4)
    assert(TableManifest.prunedFilesEq(spark, dir, "k", Seq(10001L))
      .size == 1)
    // manifest listing bounded by retention; hwm survived everything.
    // Retention is CHAIN-AWARE (a retained delta record keeps its
    // checkpoint base and intermediate records alive), so the bound is
    // retainManifests + checkpointInterval - 1 — here the slow consumer's
    // marker (v5, a delta anchored at the v1 checkpoint) pins [v1..v5]
    // and the post-compaction records ride the compaction checkpoint.
    val manifests = new java.io.File(dir, "_manifest").listFiles()
      .count(_.getName.endsWith(".json"))
    assert(manifests <= 4 + 8 - 1,
      s"chain-aware retention must bound the listing: $manifests")
    assert(graft.streaming.ManifestAppendSink
      .committedBatchHighWater(spark, dir) == 3L,
      "append replay protection must survive maintenance")
    // the consumer can still resume after the vacuum
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq(20000L).toDF("k").withColumn("grp", lit(-2L)).coalesce(1), 9L, dir)
    var n = -1L
    TableManifest.consumeNew(spark, dir, "tail") { (df, _, _) => n = df.count() }
    assert(n >= 1L, "consumer resumes across full maintenance")
  }
}
