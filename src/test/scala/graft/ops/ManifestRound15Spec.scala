package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round 15: LOG-STRUCTURED manifest commits. A commit appends a DELTA
  * record (added/removed names + stat overlays) instead of rewriting the
  * complete O(files) snapshot; every `checkpointInterval` commits (or
  * when the delta would not be materially smaller — snapshot replaces,
  * analyze sweeps) a full CHECKPOINT re-anchors the chain. Readers
  * replay checkpoint+deltas; the CAS linearization point is unchanged
  * (the exclusive create of `v<N>.json`). These drills pin the protocol
  * from the OUTSIDE: body kinds on disk, cold-path replay equivalence,
  * mid-chain time travel and restore, and the chain-aware retention /
  * CDC edges the round's advice named. */
class ManifestRound15Spec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"gm-r15-$tag").toString

  private def bodies(dir: String): Seq[(Long, String)] =
    new java.io.File(dir, "_manifest").listFiles().toSeq
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".json"))
      .flatMap(n => n.stripPrefix("v").stripSuffix(".json").toLongOption
        .map(_ -> n))
      .sortBy(_._1)
      .map { case (v, n) => v -> new String(
        Files.readAllBytes(Paths.get(dir, "_manifest", n)),
        StandardCharsets.UTF_8) }

  private def isDelta(body: String): Boolean = body.contains(""""delta":1,"base":""")

  /** One small append commit via the streaming sink path (the
    * high-frequency writer the delta protocol exists for). */
  private def append(dir: String, batchId: Long, k: Long): Unit =
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((k, s"row$k")).toDF("k", "s").coalesce(1), batchId, dir,
      statsCols = Seq("k"))

  test("appends write DELTA records; the chain re-anchors at the checkpoint interval") {
    val dir = tmpDir("kinds")
    spark.range(4).selectExpr("id AS k", "CONCAT('row', id) AS s")
      .repartition(2).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1: checkpoint (first commit)
    (1L to 9L).foreach(i => append(dir, i, 100L + i)) // v2..v10
    val kinds = bodies(dir).map { case (v, b) => v -> isDelta(b) }.toMap
    assert(!kinds(1L), "the first commit is a checkpoint")
    // interval 8: v2..v8 are deltas anchored at v1; v9 hits chain length
    // 8 and re-anchors; v10 is a delta on the v9 checkpoint
    (2L to 8L).foreach(v => assert(kinds(v), s"v$v must be a delta record"))
    assert(!kinds(9L), "v9 must re-anchor the chain as a checkpoint")
    assert(kinds(10L), "v10 rides the v9 checkpoint")
    // the delta bodies are O(batch), not O(table): every delta must be
    // far smaller than the checkpoint that anchors it
    val cp1 = bodies(dir).find(_._1 == 9L).get._2.length
    bodies(dir).filter(b => b._1 == 10L).foreach { case (v, b) =>
      assert(b.length < cp1, s"delta v$v (${b.length}B) not smaller " +
        s"than its checkpoint (${cp1}B)")
    }
    // resolved state serves the full table regardless of body kind
    assert(TableManifest.readTable(spark, dir).count() == 13L)
    // appended files are born prunable THROUGH the delta records: the
    // stat overlays replay into the resolved head like carried stats did
    // (the two init files carry no k-stats and stay conservative
    // candidates; every OTHER batch file must prune away)
    val cands = TableManifest.prunedFiles(spark, dir, "k", 109L, 109L)
    assert(cands.count(_.startsWith("b")) == 1 &&
      cands.exists(_.startsWith("b9-")),
      s"per-batch stats must survive delta replay: $cands")
  }

  test("COLD replay equals the in-process view: a copied table re-resolves from disk alone") {
    val dir = tmpDir("cold-src")
    spark.range(6).selectExpr("id AS k", "CONCAT('r', id) AS s")
      .repartition(2).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    (1L to 4L).foreach(i => append(dir, i, 200L + i))
    TableManifest.addColumns(spark, dir,
      Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)))
    val want = TableManifest.readTable(spark, dir)
      .orderBy("k").collect().toSeq
    val wantStats = TableManifest.readStats(spark, dir)
    // copy the WHOLE table to a fresh path: nothing about it is cached
    // (cache keys carry the dir), so the first read replays the
    // checkpoint + every delta record from disk
    val cold = tmpDir("cold-dst")
    def copyTree(from: java.io.File, to: java.io.File): Unit = {
      to.mkdirs()
      from.listFiles().foreach { f =>
        val t = new java.io.File(to, f.getName)
        if (f.isDirectory) copyTree(f, t)
        else Files.copy(f.toPath, t.toPath, StandardCopyOption.COPY_ATTRIBUTES)
      }
    }
    copyTree(new java.io.File(dir), new java.io.File(cold))
    assert(bodies(cold).count(b => isDelta(b._2)) >= 4,
      "fixture: the copied history must actually contain delta records")
    assert(TableManifest.readTable(spark, cold).orderBy("k").collect()
      .toSeq == want, "cold replay must serve identical rows")
    assert(TableManifest.readSchema(spark, cold).get.fieldNames
      .contains("extra"), "schema evolution must ride the delta records")
    assert(TableManifest.readStats(spark, cold) == wantStats,
      "stat overlays must replay identically")
  }

  test("time travel and RESTORE address mid-chain versions exactly") {
    val dir = tmpDir("travel")
    spark.range(3).selectExpr("id AS k", "CONCAT('r', id) AS s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1: 3 rows
    append(dir, 1L, 500L) // v2 (delta): 4 rows
    append(dir, 2L, 501L) // v3 (delta): 5 rows
    append(dir, 3L, 502L) // v4 (delta): 6 rows
    assert(TableManifest.readTableAt(spark, dir, 3L).count() == 5L,
      "a mid-chain version reads as its exact replayed state")
    val v5 = TableManifest.restore(spark, dir, 2L)
    assert(v5 == 5L && TableManifest.readTable(spark, dir).count() == 4L,
      "restore to a mid-chain version re-lists exactly its files")
    // the bad intermediate versions stay time-travelable (history kept)
    assert(TableManifest.readTableAt(spark, dir, 4L).count() == 6L)
  }

  test("graft CDC: an unchanged version range returns ZERO ROWS with the snapshot schema") {
    val dir = tmpDir("cdc-empty")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    append(dir, 1L, 9L) // v2
    // (v2, v2] added nothing — the common CDC poll; projecting a column
    // must analyze fine and return empty (the round-15 advice fix: a
    // zero-column emptyDataFrame failed analysis here)
    val df = TableManifest.addedBetween(spark, dir, 2L, 2L)
    assert(df.columns.toSeq.sorted == Seq("k", "s"),
      s"empty range must serve the snapshot schema: ${df.columns.toSeq}")
    assert(df.select("k").count() == 0L)
    // backwards / negative ranges are caller bugs with named errors
    val back = intercept[RuntimeException](
      TableManifest.addedBetween(spark, dir, 2L, 1L))
    assert(back.getMessage.contains("backwards range"))
    val neg = intercept[IllegalArgumentException](
      TableManifest.addedBetween(spark, dir, -1L, 1L))
    assert(neg.getMessage.contains(">= 0"))
    // a retention-pruned version names the pruning in its error
    val pruned = intercept[RuntimeException](
      TableManifest.addedBetween(spark, dir, 1L, 99L))
    assert(pruned.getMessage.contains("retention pruned"),
      s"got: ${pruned.getMessage}")
  }

  test("history monotonizes skewed commit stamps exactly like TIMESTAMP AS OF") {
    val dir = tmpDir("hist-mono")
    Seq((1L, "a")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1
    append(dir, 1L, 2L) // v2
    append(dir, 2L, 3L) // v3
    // simulate cross-process clock skew: backdate v2's recorded ctime
    // far behind v1's (the ledger would show non-monotone commit_ts and
    // disagree with versionAsOfTime's running-max resolution)
    val mdir = Paths.get(dir, "_manifest")
    val v2p = mdir.resolve(f"v${2L}%020d.json")
    val body = new String(Files.readAllBytes(v2p), StandardCharsets.UTF_8)
    assert(body.contains("\"ctime\":"))
    Files.write(v2p, body.replaceAll(""""ctime":[0-9]+,""",
      """"ctime":1000,""").getBytes(StandardCharsets.UTF_8))
    val ts = TableManifest.history(spark, dir).orderBy("version")
      .collect().map(_.getTimestamp(1).getTime).toSeq
    assert(ts == ts.sorted,
      s"ledger commit_ts must be monotone under skew: $ts")
    // and both surfaces agree: picking v2's ledger stamp resolves to a
    // version AT OR ABOVE v2, never behind it
    val resolved = TableManifest.versionAsOfTime(spark, dir, ts(1))
    assert(resolved.exists(_ >= 2L),
      s"ledger stamp must resolve forward, got $resolved")
  }

  test("restore's rollback refuses to fabricate an empty head when its target was pruned too") {
    val dir = tmpDir("restore-gone")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1
    TableManifest.publish(Seq((3L, "c")).toDF("k", "s").coalesce(1), dir) // v2
    val headFiles = TableManifest.read(spark, dir).get._2
    // stage the double-loss window deterministically through the two
    // seams: the aggressive concurrent vacuum reclaims one of v1's
    // delisted data files in the check→commit window (pre-commit seam)
    // AND, keyed on the NEW head, prunes the pre-restore head's own
    // manifest before restore re-verifies (post-commit seam) — the exact
    // scenario the round-15 advice named, where the old rollback
    // committed parseFiles("") = an EMPTY file list as the new head
    // while claiming the head was rolled back
    TableManifest.restorePreCommitHook = () => {
      val v1Only = new java.io.File(dir).listFiles().toSeq
        .filter(f => f.isFile && !headFiles.contains(f.getName) &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(v1Only.nonEmpty, "fixture: v1 must have delisted files")
      v1Only.foreach(f => assert(f.delete(), s"fixture: $f"))
    }
    TableManifest.restorePostCommitHook = () =>
      assert(Files.deleteIfExists(
        Paths.get(dir, "_manifest", f"v${2L}%020d.json")),
        "fixture: prune the pre-restore head manifest")
    try {
      val e = intercept[RuntimeException](TableManifest.restore(spark, dir, 1L))
      assert(e.getMessage.contains("neither the restore nor a rollback " +
        "target is recoverable"), s"got: ${e.getMessage}")
      // the head must NOT be a silently-truncated empty list: the
      // restored listing stays (documented posture), and its missing
      // files fail loudly at scan — never a silent "0 rows, all fine"
      val head = TableManifest.read(spark, dir).get
      assert(head._2.nonEmpty,
        s"rollback must never commit an empty fabricated head: $head")
    } finally {
      TableManifest.restorePreCommitHook = () => ()
      TableManifest.restorePostCommitHook = () => ()
    }
  }

  test("chain-aware retention: vacuum never orphans a retained delta's replay chain") {
    val dir = tmpDir("chain-vac")
    Seq((1L, "a")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1 checkpoint
    (1L to 3L).foreach(i => append(dir, i, 10L + i)) // v2..v4 deltas
    TableManifest.vacuum(spark, dir, retainManifests = 1)
    // v4 is a delta anchored at v1: [v1..v4] must all survive
    val left = bodies(dir).map(_._1)
    assert(left == Seq(1L, 2L, 3L, 4L),
      s"retained delta must keep its chain: $left")
    // and the table still resolves after the vacuum
    assert(TableManifest.readTable(spark, dir).count() == 4L)
  }
}
