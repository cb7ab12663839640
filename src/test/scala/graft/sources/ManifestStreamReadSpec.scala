package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.spark.sql.streaming.Trigger

/** `spark.readStream.format("graft-manifest")` tails a manifest table's
  * commits: first batch = the head snapshot, later batches = per-commit
  * deltas, resume driven by the engine's checkpoint (the provider-level
  * twin of `TableManifest.consumeNew`, whose marker the checkpoint
  * replaces). Mirrors `ConsumeNewSpec` through the DSv2 surface. */
class ManifestStreamReadSpec extends SparkSpec {

  import spark.implicits._

  private def newTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gm-stream-").toString
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    dir
  }

  /** Append one data file holding `rows` and commit it as the next version
    * (the append-only writer shape whose deltas are exact CDC). */
  private def append(dir: String, rows: (String, Long)*): Long = {
    val tmp = java.nio.file.Files.createTempDirectory("gm-stream-add-").toString
    rows.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir,
      s"added-${java.util.UUID.randomUUID()}.parquet")
    java.nio.file.Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files :+ target.getName, head).get
  }

  private def runOnce(dir: String, ckpt: String,
      options: Map[String, String] = Map.empty): Seq[(String, Long)] = {
    val seen = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val reader = spark.readStream.format("graft-manifest")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.as[(String, Long)].collect() }
        ()
      }
      .start()
    q.awaitTermination()
    seen.toSeq.sorted
  }

  test("tail delivers the snapshot, then delta-only on checkpointed resume, then nothing") {
    val dir = newTable()
    val ckpt = java.nio.file.Files.createTempDirectory("gm-stream-ck").toString
    assert(runOnce(dir, ckpt) == Seq(("a", 1L), ("b", 2L)),
      "first run tails the whole head snapshot")
    assert(runOnce(dir, ckpt) == Seq.empty, "idle table: no re-delivery")
    append(dir, ("c", 3L))
    assert(runOnce(dir, ckpt) == Seq(("c", 3L)),
      "restart resumes from the checkpointed version: delta only")
    append(dir, ("d", 4L))
    append(dir, ("e", 5L))
    assert(runOnce(dir, ckpt) == Seq(("d", 4L), ("e", 5L)),
      "two commits since the checkpoint: both deltas, nothing else")
  }

  test("startingVersion=latest skips history; a fresh checkpoint starting earliest replays it") {
    val dir = newTable()
    append(dir, ("c", 3L))
    val ckptLatest = java.nio.file.Files.createTempDirectory("gm-stream-ck2").toString
    assert(runOnce(dir, ckptLatest, Map("startingVersion" -> "latest")) ==
      Seq.empty, "latest: nothing committed after stream start")
    append(dir, ("d", 4L))
    assert(runOnce(dir, ckptLatest, Map("startingVersion" -> "latest")) ==
      Seq(("d", 4L)), "only the post-start commit")
    // an independent consumer from earliest still sees everything
    val ckptAll = java.nio.file.Files.createTempDirectory("gm-stream-ck3").toString
    assert(runOnce(dir, ckptAll) ==
      Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
  }

  test("explicit startingVersion resumes mid-history; a bad one fails loudly") {
    val dir = newTable() // v1
    append(dir, ("c", 3L)) // v2
    append(dir, ("d", 4L)) // v3
    val ckpt = java.nio.file.Files.createTempDirectory("gm-stream-ck4").toString
    assert(runOnce(dir, ckpt, Map("startingVersion" -> "2")) ==
      Seq(("d", 4L)), "version 2 already delivered: v3's delta only")
    val e = intercept[Exception] {
      runOnce(dir,
        java.nio.file.Files.createTempDirectory("gm-stream-ck5").toString,
        Map("startingVersion" -> "99"))
    }
    assert(e.getMessage != null)
  }

  /** Run one AvailableNow pass collecting each micro-batch separately. */
  private def runBatches(dir: String, ckpt: String,
      options: Map[String, String]): Seq[Seq[(String, Long)]] = {
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[(String, Long)]]
    val reader = spark.readStream.format("graft-manifest")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized {
          batches += df.as[(String, Long)].collect().toSeq.sorted
        }
        ()
      }
      .start()
    q.awaitTermination()
    batches.toSeq.filter(_.nonEmpty)
  }

  test("maxFilesPerTrigger chunks catch-up into per-commit batches, in commit order") {
    val dir = newTable() // v1: one file (a, b)
    append(dir, ("c", 3L)) // v2
    append(dir, ("d", 4L)) // v3
    val ckpt = java.nio.file.Files.createTempDirectory("gm-stream-ck6").toString
    val got = runBatches(dir, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got == Seq(
      Seq(("a", 1L), ("b", 2L)), Seq(("c", 3L)), Seq(("d", 4L))),
      s"one commit per trigger during catch-up, commit order, nothing lost: $got")
    // resume: checkpoint + cap still in force
    append(dir, ("e", 5L))
    append(dir, ("f", 6L))
    val got2 = runBatches(dir, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got2 == Seq(Seq(("e", 5L)), Seq(("f", 6L))),
      s"checkpointed resume chunks the new backlog the same way: $got2")
    // uncapped consumer from scratch: whole backlog in ONE batch
    val ckptAll = java.nio.file.Files.createTempDirectory("gm-stream-ck7").toString
    assert(runBatches(dir, ckptAll, Map.empty).length == 1,
      "no cap: AvailableNow drains everything in a single batch")
  }

  test("a single commit larger than the cap is admitted whole, never stalling") {
    val dir = newTable() // v1
    // one commit adding TWO files (admission is version-granular)
    val names = Seq(("x", 7L), ("y", 8L)).map { row =>
      val tmp = java.nio.file.Files.createTempDirectory("gm-stream-big").toString
      Seq(row).toDF("k", "v").repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir,
        s"added-${java.util.UUID.randomUUID()}.parquet")
      java.nio.file.Files.copy(part.toPath, target.toPath)
      target.getName
    }
    val (head, files) = graft.ops.TableManifest.read(spark, dir).get
    graft.ops.TableManifest.commitIf(spark, dir, files ++ names, head).get
    val ckpt = java.nio.file.Files.createTempDirectory("gm-stream-ck8").toString
    val got = runBatches(dir, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got == Seq(
      Seq(("a", 1L), ("b", 2L)), Seq(("x", 7L), ("y", 8L))),
      s"the 2-file commit arrives as one oversized batch: $got")
  }

  test("a retention-pruned INTERMEDIATE version is skipped by the capped walk, not fatal") {
    // checkpoint-only commits for THIS table: a hand-deleted intermediate
    // is only survivable when every surviving manifest is a full
    // snapshot — a pruned DELTA record would (correctly, loudly) break
    // its successors' replay chain, and vacuum's own retention never
    // creates that gap (it keeps everything from the oldest retained
    // version's checkpoint base forward)
    spark.conf.set("spark.graft.manifest.checkpointInterval", "1")
    val dir = try {
      val d = newTable() // v1: one file (a, b)
      append(d, ("c", 3L)) // v2
      append(d, ("d", 4L)) // v3
      d
    } finally spark.conf.unset("spark.graft.manifest.checkpointInterval")
    // manifest retention pruned v2: these manifests are full snapshots,
    // so the delta v1 -> v3 still delivers exactly c + d — the pruned
    // step only loses batch-boundary granularity, never data
    val v2 = new java.io.File(dir, f"_manifest/v${2L}%020d.json")
    assert(v2.isFile && v2.delete(), s"fixture: cannot prune $v2")
    val ckpt = java.nio.file.Files.createTempDirectory("gm-stream-ck9").toString
    val got = runBatches(dir, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got == Seq(
      Seq(("a", 1L), ("b", 2L)), Seq(("c", 3L), ("d", 4L))),
      s"snapshot, then the v1->v3 delta as one (over-cap, whole-version) batch: $got")
  }

  test("a PARTITIONED table streams under DML churn: appends deliver once, copy-on-write re-lists only its victims") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gm-stream-part").toString
    graft.ops.TableManifest.publishPartitioned(
      Seq((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)).toDF("k", "v", "b"),
      dir, Seq("b"))
    graft.ops.TableManifest.analyze(spark, dir, Seq("k"))
    val ckpt = java.nio.file.Files.createTempDirectory("gm-stream-pck").toString
    def drain(): Seq[(Long, Long, Long)] = {
      val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      // partition values are name-inferred (b=0 → INT) on a
      // publishPartitioned table; cast for the typed collect
      val q = spark.readStream.format("graft-manifest").load(dir)
        .select(col("k"), col("v"), col("b").cast("long"))
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= df.as[(Long, Long, Long)].collect() }
          ()
        }.start()
      q.awaitTermination()
      seen.toSeq.sorted
    }
    // run 1: the whole partitioned snapshot, partition values served
    assert(drain() == Seq((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)))
    // CHURN between triggers: an append plus a partition-scoped UPDATE
    // whose copy-on-write rewrites ONLY partition b=1's matching file
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((4L, 40L, 1L)).toDF("k", "v", "b").coalesce(1), 1L, dir)
    graft.ops.TableManifest.updateWhere(spark, dir,
      Seq("v" -> (col("v") + lit(5L))),
      Some(col("b") === 1L && col("k") === 3L),
      pruneRanges = Seq(("b", 1L, 1L), ("k", 3L, 3L)))
    // run 2: the append arrives once; the rewrite re-lists its victim
    // file, so the updated row re-delivers (the documented
    // file-granularity CDC caveat) — rows of UNTOUCHED partitions must
    // NOT re-deliver, pinning that the copy-on-write stayed file-granular
    assert(drain() == Seq((3L, 35L, 1L), (4L, 40L, 1L)),
      "append once + exactly the rewritten victim, nothing else")
    // OPTIMIZE one leaf: per-leaf compaction re-lists that leaf only
    graft.ops.Compaction.compactPartition(spark, dir, "b=1")
    val afterOpt = drain()
    assert(afterOpt == Seq((3L, 35L, 1L), (4L, 40L, 1L)),
      s"per-leaf OPTIMIZE re-lists exactly its leaf's rows: $afterOpt")
    // quiet table: nothing to deliver
    assert(drain().isEmpty)
    // the stream never dropped a row: final table state equals what a
    // last-writer-wins fold of the deliveries says
    assert(graft.ops.TableManifest.readTable(spark, dir)
      .select("k", "v").as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 35L), (4L, 40L)))
  }

  test("bad maxFilesPerTrigger fails loudly") {
    val dir = newTable()
    intercept[Exception] {
      runOnce(dir,
        java.nio.file.Files.createTempDirectory("gm-stream-ck9").toString,
        Map("maxFilesPerTrigger" -> "0"))
    }
    intercept[Exception] {
      runOnce(dir,
        java.nio.file.Files.createTempDirectory("gm-stream-ck10").toString,
        Map("maxFilesPerTrigger" -> "lots"))
    }
  }

  test("offsets round-trip through the JSON contract; garbage is loud") {
    assert(ManifestOffset.parse(ManifestOffset(7L).json()) == ManifestOffset(7L))
    assert(ManifestOffset.parse("""{ "version" : 12 }""") == ManifestOffset(12L))
    intercept[IllegalArgumentException] {
      ManifestOffset.parse("""{"recordCount":3}""")
    }
  }
}
