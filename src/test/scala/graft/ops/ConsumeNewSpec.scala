package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental consumption of a manifested table: delta-only delivery,
  * durable per-consumer markers, failure re-delivery, independent
  * consumers, and the end-to-end composition with maintainAgg — an
  * incrementally maintained view that tails the table's commits. */
class ConsumeNewSpec extends SparkSpec {

  import spark.implicits._

  private def newTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("consume-").toString
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    dir
  }

  /** Append one data file holding `rows` and commit it as the next version. */
  private def append(dir: String, rows: (String, Long)*): Long = {
    val tmp = java.nio.file.Files.createTempDirectory("consume-add-").toString
    rows.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir,
      s"added-${java.util.UUID.randomUUID()}.parquet")
    java.nio.file.Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files :+ target.getName, head).get
  }

  test("first consume delivers the snapshot, later consumes only the delta") {
    val dir = newTable()
    var seen = Seq.empty[(String, Long)]
    def sink(df: org.apache.spark.sql.DataFrame, from: Long, to: Long): Unit =
      seen = df.as[(String, Long)].collect().toSeq.sorted
    assert(TableManifest.consumeNew(spark, dir, "c1")(sink) == Some((0L, 1L)))
    assert(seen == Seq(("a", 1L), ("b", 2L)))
    assert(TableManifest.consumeNew(spark, dir, "c1")(sink) == None,
      "nothing new: no delivery")
    append(dir, ("c", 3L))
    assert(TableManifest.consumeNew(spark, dir, "c1")(sink) == Some((1L, 2L)))
    assert(seen == Seq(("c", 3L)), "second delivery is the delta only")
  }

  test("a failing processor leaves the marker alone; the range re-delivers") {
    val dir = newTable()
    intercept[RuntimeException] {
      TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) =>
        sys.error("downstream crashed")
      }
    }
    assert(TableManifest.consumerVersion(spark, dir, "c1") == 0L)
    var n = -1L
    TableManifest.consumeNew(spark, dir, "c1") { (df, _, _) => n = df.count() }
    assert(n == 2L, "same range delivered again after the crash")
  }

  test("independent consumers tail at their own pace") {
    val dir = newTable()
    TableManifest.consumeNew(spark, dir, "fast") { (_, _, _) => () }
    append(dir, ("c", 3L))
    var fastRows, slowRows = -1L
    TableManifest.consumeNew(spark, dir, "fast") { (df, _, _) => fastRows = df.count() }
    TableManifest.consumeNew(spark, dir, "slow") { (df, _, _) => slowRows = df.count() }
    assert(fastRows == 1L, "fast consumer sees only the delta")
    assert(slowRows == 3L, "slow consumer starts from the full snapshot")
  }

  test("a delete-only commit advances the marker without a poison delivery") {
    val dir = newTable()
    TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) => () }
    // retention: drop a file from the manifest, adding nothing
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files.tail, head).get
    var called = false
    val got = TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) =>
      called = true
    }
    assert(got == None && !called, "no rows added: nothing to deliver")
    assert(TableManifest.consumerVersion(spark, dir, "c1") == head + 1,
      "marker must advance past the delete-only range, not wedge on it")
    append(dir, ("z", 9L))
    var n = -1L
    TableManifest.consumeNew(spark, dir, "c1") { (df, _, _) => n = df.count() }
    assert(n == 1L, "the next append delivers normally")
  }

  test("vacuum prunes superseded markers and old manifests, never a consumer's") {
    val dir = newTable()
    TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) => () } // marker v1
    (1 to 6).foreach(i => append(dir, (s"x$i", i.toLong)))         // head v7
    def manifestFiles(): Seq[String] =
      new java.io.File(dir, "_manifest").listFiles().map(_.getName).toSeq
    // advance c1 to v4 by consuming mid-stream... it consumes to head (v7).
    // Instead leave c1 at v1 and let a second consumer reach the head.
    TableManifest.consumeNew(spark, dir, "c2") { (_, _, _) => () } // marker v7
    TableManifest.consumeNew(spark, dir, "c2") { (_, _, _) => () } // no-op

    val before = manifestFiles()
    assert(before.count(_.endsWith(".json")) == 7)
    val deleted = TableManifest.vacuum(spark, dir, retainManifests = 2)
    // c1 sits at v1, so despite retainManifests=2 nothing below v1 — i.e.
    // nothing at all — may be pruned except superseded markers
    assert(manifestFiles().count(_.endsWith(".json")) == 7,
      s"slow consumer c1 must pin all manifests, deleted=$deleted")
    // post-vacuum resume: c1 still computes its full delta
    var n = -1L
    TableManifest.consumeNew(spark, dir, "c1") { (df, _, _) => n = df.count() }
    assert(n == 6L, "c1 resumes across the vacuum with the exact delta")

    // now both consumers are at the head: retention applies — but it is
    // CHAIN-AWARE: every append so far is a DELTA record anchored at the
    // v1 checkpoint, so pruning below the oldest retained version would
    // orphan its replay chain; the whole chain survives (bounded by
    // retainManifests + checkpointInterval - 1, never the history)
    TableManifest.vacuum(spark, dir, retainManifests = 2)
    val mid = manifestFiles()
    assert(mid.count(_.endsWith(".json")) == 7,
      s"a retained delta keeps its chain base alive: $mid")
    // push the table ACROSS its next checkpoint (interval 8: v9 is the
    // first checkpoint after v1), re-advance the consumers, and retention
    // prunes TIGHTLY again — the boundary version now anchors itself
    append(dir, ("y1", 10L)) // v8: delta (chain length 7)
    append(dir, ("y2", 11L)) // v9: checkpoint (chain length hit 8)
    TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) => () }
    TableManifest.consumeNew(spark, dir, "c2") { (_, _, _) => () }
    TableManifest.vacuum(spark, dir, retainManifests = 1)
    val after = manifestFiles()
    assert(after.count(_.endsWith(".json")) == 1,
      s"a checkpoint boundary prunes exactly: $after")
    // superseded markers pruned: exactly one marker per consumer remains
    assert(after.count(_.startsWith("consumer-c1-")) == 1)
    assert(after.count(_.startsWith("consumer-c2-")) == 1)
    // consumers still live after retention pruning
    append(dir, ("tail", 99L))
    var m = -1L
    TableManifest.consumeNew(spark, dir, "c2") { (df, _, _) => m = df.count() }
    assert(m == 1L, "consumer keeps tailing after manifest retention pruning")
  }

  test("vacuum grace period protects an in-flight micro-batch's files") {
    val dir = newTable()
    // simulate a live micro-batch: scratch dir + a moved-but-uncommitted
    // data file, both freshly written
    new java.io.File(dir, ".inflight-b9-live").mkdirs()
    val moved = new java.io.File(dir, "b9-live-p0.parquet")
    moved.createNewFile()
    val deleted = TableManifest.vacuum(spark, dir, graceMillis = 60000L)
    assert(!deleted.contains(".inflight-b9-live"))
    assert(!deleted.contains("b9-live-p0.parquet"))
    assert(moved.exists(), "young uncommitted file must survive the vacuum")
    // aged-out debris is still reclaimed. Above-hwm b-files carry an
    // additional in-flight floor of max(grace, 10 min) — the
    // rename→commit window must survive even an aggressive grace — so
    // the orphan must age past the FLOOR, not just the grace, before a
    // dead query's leftovers reclaim
    val old = new java.io.File(dir, ".inflight-b1-dead")
    old.mkdirs()
    old.setLastModified(System.currentTimeMillis() - 120000L)
    moved.setLastModified(System.currentTimeMillis() - 2L * 3600L * 1000L)
    val deleted2 = TableManifest.vacuum(spark, dir, graceMillis = 60000L)
    assert(deleted2.contains(".inflight-b1-dead"))
    assert(deleted2.contains("b9-live-p0.parquet"),
      "once past the in-flight floor an uncommitted orphan is reclaimed")
  }

  test("manifest reads merge schemas across evolved appends") {
    val dir = newTable()
    // append a file with an extra column the original files lack
    val tmp = java.nio.file.Files.createTempDirectory("consume-evo-").toString
    Seq(("c", 3L, "fresh")).toDF("k", "v", "note")
      .repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir, "evolved-0.parquet")
    java.nio.file.Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files :+ target.getName, head).get

    val df = TableManifest.readTable(spark, dir)
    assert(df.columns.toSet == Set("k", "v", "note"),
      s"evolved column dropped: ${df.columns.mkString(",")}")
    assert(df.filter(col("note") === "fresh").count() == 1)
    assert(df.filter(col("note").isNull).count() == 2,
      "pre-evolution rows surface with the new column null")
    // time travel and CDC honor the merge too
    assert(TableManifest.readTableAt(spark, dir, head + 1)
      .columns.toSet == Set("k", "v", "note"))
    assert(TableManifest.addedBetween(spark, dir, head, head + 1)
      .columns.toSet == Set("k", "v", "note"))
  }

  test("maintained view tailing the table equals a scratch recompute") {
    val dir = newTable()
    var state = Seq.empty[(String, Long, Long)].toDF("k", "cnt", "sum_v")
    def refresh(): Unit =
      TableManifest.consumeNew(spark, dir, "view") { (df, _, _) =>
        state = Merge.maintainAgg(state,
          df.withColumn("op", lit(1L)), Seq("k"), Seq("v"))
          .localCheckpoint() // state must survive the source moving on
      }
    refresh()
    append(dir, ("a", 10L), ("c", 5L))
    refresh()
    append(dir, ("c", 7L))
    refresh()
    val got = state.orderBy("k").as[(String, Long, Long)].collect().toSeq
    val want = TableManifest.readTable(spark, dir)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == want, s"maintained $got != recompute $want")
  }
}
