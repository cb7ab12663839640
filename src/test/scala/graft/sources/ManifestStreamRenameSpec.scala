package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.spark.sql.streaming.Trigger

/** Round-17: streaming reads over RENAME COLUMN carrier ranges.
  *
  * A micro-batch delivery range holding pre-rename carrier files is no
  * longer refused: [[ManifestMicroBatchStream.planInputPartitions]]
  * groups the range by carried physical name (the renameGroups rule the
  * batch expansion uses) and scans each group under the stream's pinned
  * schema respelled to that group's physical names — rows are
  * positional, so the pinned logical schema names them at the surface.
  * The loud refusal that REMAINS is the forward case: a rename
  * committed while a stream is tailing under the PRE-rename pinned
  * schema (post-rename files would otherwise pass a carriers-only check
  * and serve NULLs under the pinned name) — restart required, after
  * which the re-pinned schema makes the same ranges deliverable. The
  * batch-scan guard moved from scan CREATION to `toBatch`, so stream
  * starts and checkpointed restarts never trip over it. */
class ManifestStreamRenameSpec extends SparkSpec {

  import spark.implicits._

  /** Tracked table (k BIGINT, v BIGINT), one file, rows (0,0) (1,10). */
  private def newTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gm-strm-ren-").toString
    Seq((0L, 0L), (1L, 10L)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    dir
  }

  /** Append one data file holding `rows` under column names `cols`. */
  private def append(dir: String, cols: (String, String),
      rows: (Long, Long)*): Long = {
    val tmp = java.nio.file.Files.createTempDirectory("gm-strm-add-").toString
    rows.toDF(cols._1, cols._2).repartition(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir,
      s"added-${java.util.UUID.randomUUID()}.parquet")
    java.nio.file.Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files :+ target.getName, head).get
  }

  private def runOnce(dir: String, ckpt: String): Seq[(Long, Long)] = {
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-manifest").load(dir)
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

  test("earliest backfill over a renamed table delivers carrier files under the logical schema") {
    val dir = newTable() // v1: file physically carries v
    TableManifest.renameColumn(spark, dir, "v", "w") // v2
    append(dir, ("k", "w"), (2L, 20L)) // v3: physically carries w
    val got = spark.readStream.format("graft-manifest").load(dir)
    assert(got.schema.fieldNames.toSeq == Seq("k", "w"),
      "the stream pins the logical (post-rename) schema")
    val ckpt = java.nio.file.Files.createTempDirectory("gm-strm-ck").toString
    val rows = runOnce(dir, ckpt)
    assert(rows == Seq((0L, 0L), (1L, 10L), (2L, 20L)),
      s"carrier files serve their physical column AS the logical one: $rows")
    // exactly once: nothing re-delivers on resume
    assert(runOnce(dir, ckpt) == Seq.empty)
  }

  test("mixed carrier + post-rename delivery range groups per physical name") {
    val dir = newTable() // v1
    val ckpt = java.nio.file.Files.createTempDirectory("gm-strm-ck2").toString
    assert(runOnce(dir, ckpt) == Seq((0L, 0L), (1L, 10L)),
      "pre-rename snapshot delivered under the old schema")
    append(dir, ("k", "v"), (2L, 20L)) // v2: still physically v
    TableManifest.renameColumn(spark, dir, "v", "w") // v3: both files carriers
    append(dir, ("k", "w"), (3L, 30L)) // v4: physically w
    // the restart re-pins the NEW logical schema; its one delivery range
    // holds a carrier file (physical v) AND a fresh file (physical w)
    val rows = runOnce(dir, ckpt)
    assert(rows == Seq((2L, 20L), (3L, 30L)),
      s"both generations delivered once, correct values, no NULLs: $rows")
  }

  test("a rename committed while a stream tails its old schema is loud; a restart resumes") {
    val dir = newTable()
    val ckpt = java.nio.file.Files.createTempDirectory("gm-strm-ck3").toString
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.as[(Long, Long)].collect() }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.toSeq.sorted == Seq((0L, 0L), (1L, 10L)))
      TableManifest.renameColumn(spark, dir, "v", "w")
      append(dir, ("k", "w"), (2L, 20L))
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("restart the stream")),
        s"forward rename must refuse loudly: ${messages(e)}")
    } finally q.stop()
    // the PLAIN restart re-pins (k, w) and the same checkpoint resumes:
    // the undelivered range is now servable (nothing redelivered, the
    // failed batch never committed)
    assert(runOnce(dir, ckpt) == Seq((2L, 20L)))
  }

  test("a plain-session BATCH read of a renamed table is loud at execution, never NULLs") {
    val dir = newTable()
    TableManifest.renameColumn(spark, dir, "v", "w")
    // the plain session may or may not carry the expansion rule (session
    // creation order in the shared JVM) — both outcomes are safe; silent
    // NULLs are the one forbidden result
    (try Right(spark.read.format("graft-manifest").load(dir)
        .select("k", "w").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
      catch { case e: Exception => Left(e) }) match {
      case Right(rows) =>
        assert(rows == Seq((0L, 0L), (1L, 10L)), s"correct read: $rows")
      case Left(e) =>
        assert(e.getMessage.contains("renamed columns"), e.getMessage)
    }
  }
}
