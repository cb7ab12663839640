package graft.sources

import graft.SparkSpec
import graft.ops.{Compaction, TableManifest}
import org.apache.spark.sql.streaming.Trigger

/** Round-18: streaming delivery OVER deletion-vector'd files.
  *
  * Enabling `spark.graft.dml.deletionVectors` must not kill every
  * downstream tailing stream (the reference pipeline's very shape is
  * batch DML feeding streams). A dv on a NOT-YET-delivered file now
  * delivers exactly the file's live rows: the file gets its own
  * sub-batch planned with Spark's parquet row-index generator column,
  * wrapped in [[DvFilteringReaderFactory]] (drop deleted positions,
  * project the generator column out) — composed with the rename-group
  * routing from round 17. A dv added to an ALREADY-delivered file
  * re-delivers nothing (no new file): those deletions never
  * retro-propagate, the documented file-granularity CDC caveat. */
class ManifestStreamDvSpec extends SparkSpec {

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

  /** Tracked (k, v), k = 0..8 in exactly 3 known files:
    * {0,1,2}, {3,4,5}, {6,7,8}. */
  private def table3(tag: String): String = {
    val dir = tmpDir(tag)
    (0L until 3L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    (3L until 6L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    (6L until 9L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    dir
  }

  /** One AvailableNow pass against `ckpt`; returns the batch's rows. */
  private def runOnce(dir: String, ckpt: String,
      options: Map[String, String] = Map.empty): Seq[(Long, Long)] = {
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    var reader = spark.readStream.format("graft-manifest")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.as[(Long, Long)].collect() }
        ()
      }
      .start()
    q.awaitTermination()
    seen.toSeq.sorted
  }

  test("a dv DELETE on an undelivered file streams exactly the live rows, exactly once") {
    val dir = table3("gm-sdv-basic")
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
    val ckpt = tmpDir("gm-sdv-ck")
    val rows = runOnce(dir, ckpt)
    assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L),
      s"live rows only: $rows")
    assert(rows.map(_._2) == Seq(0L, 10L, 20L, 30L, 50L, 60L, 70L, 80L),
      "values ride untouched")
    // kill/restart: the checkpoint resumes with NOTHING re-delivered
    assert(runOnce(dir, ckpt) == Seq.empty, "exactly once across restart")
  }

  test("capped catch-up (maxFilesPerTrigger=1) over multiple dv'd files unions to exactly the live rows") {
    val dir = table3("gm-sdv-cap")
    withDv {
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L))
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(7L, 8L))
    }
    val ckpt = tmpDir("gm-sdv-ck2")
    val rows = runOnce(dir, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(rows.map(_._1) == Seq(0L, 2L, 3L, 4L, 5L, 6L),
      s"both files' dvs applied across chunked triggers: $rows")
    assert(runOnce(dir, ckpt, Map("maxFilesPerTrigger" -> "1")) == Seq.empty)
  }

  test("a dv added to an ALREADY-delivered file re-delivers nothing; later appends still flow") {
    val dir = table3("gm-sdv-late")
    val ckpt = tmpDir("gm-sdv-ck3")
    assert(runOnce(dir, ckpt).size == 9, "clean snapshot delivered")
    // the dv lands on a delivered file: file-granularity CDC cannot
    // retract rows — nothing re-delivers (documented caveat)...
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(0L)) }
    assert(runOnce(dir, ckpt) == Seq.empty,
      "no retro-propagation, no refusal either")
    // ...and the stream keeps flowing for later commits
    (9L until 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    assert(runOnce(dir, ckpt) == Seq((9L, 90L), (10L, 100L)))
  }

  test("dv'd RENAME-carrier files deliver live rows under the logical schema") {
    val dir = table3("gm-sdv-ren")
    TableManifest.renameColumn(spark, dir, "v", "w")
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
    val stream = spark.readStream.format("graft-manifest").load(dir)
    assert(stream.schema.fieldNames.toSeq == Seq("k", "w"))
    val ckpt = tmpDir("gm-sdv-ck4")
    val rows = runOnce(dir, ckpt)
    assert(rows == Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L),
      (5L, 50L), (6L, 60L), (7L, 70L), (8L, 80L)),
      s"carrier + dv compose, no NULLs, no deleted rows: $rows")
  }

  test("HIVE-PARTITIONED dv'd files deliver live rows with their partition values") {
    val dir = tmpDir("gm-sdv-part")
    val df = Seq((0L, 0L, "a"), (1L, 10L, "a"), (2L, 20L, "b"),
      (3L, 30L, "b")).toDF("k", "v", "p")
    TableManifest.publishPartitioned(df.repartition(1), dir, Seq("p"))
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L, 2L)) }
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long, String)]
    val ckpt = tmpDir("gm-sdv-ck5")
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= b.select("k", "v", "p").as[(Long, Long, String)].collect()
        }
        ()
      }.start()
    q.awaitTermination()
    assert(seen.toSeq.sorted == Seq((0L, 0L, "a"), (3L, 30L, "b")),
      s"per-partition dvs applied, partition values served: ${seen.toSeq.sorted}")
  }

  test("rename + OPTIMIZE between triggers refuses loudly on the at-`to` schema, never serves NULLs") {
    val dir = table3("gm-sdv-optren")
    val ckpt = tmpDir("gm-sdv-ck6")
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.as[(Long, Long)].collect() }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.size == 9)
      // rename AND rewrite every carrier between two triggers: the
      // mapping entries are gone by the next trigger, so only the
      // at-`to` committed schema can catch the skew (ADVICE r18)
      TableManifest.renameColumn(spark, dir, "v", "w")
      Compaction.compactInPlace(spark, dir, minFileBytes = 1L << 30)
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("restart the stream")),
        s"schema-based forward guard must be loud: ${messages(e)}")
    } finally q.stop()
    // the plain restart re-pins (k, w) and resumes: the compacted
    // rewrite re-lists every row under new names (file-granularity
    // CDC re-delivery of a rewrite, the documented caveat)
    val resumed = runOnce(dir, ckpt)
    assert(resumed.map(_._1).sorted == (0L to 8L).toSeq,
      s"restart resumes under the new schema: $resumed")
  }

  test("capped catch-up whose chunk boundary lands before a rename extends through it") {
    val dir = table3("gm-sdv-chunk") // v1..v4ish: 3 files + analyze
    TableManifest.renameColumn(spark, dir, "v", "w")
    (9L until 10L).map(k => (k, k * 10L)).toDF("k", "w")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    // fresh stream pins (k, w); maxFilesPerTrigger=1 would naively chunk
    // the catch-up at pre-rename versions whose schema can't spell `w` —
    // the admission walk must extend those chunks through the rename
    val ckpt = tmpDir("gm-sdv-ck7")
    val rows = runOnce(dir, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(rows.map(_._1) == (0L to 9L).toSeq,
      s"every generation delivered once, no NULLs: $rows")
    assert(rows.map(_._2) == (0L to 9L).map(_ * 10L),
      s"carrier values intact: $rows")
  }
}
