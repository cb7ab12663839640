package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Round-16 CROSS-PROCESS drills of the log-structured commit protocol
  * specifically — the pre-existing cross-process drills (INSERT race,
  * restore/vacuum) predate the delta protocol and never force its two
  * new windows across real OS processes:
  *
  *  1. the CHECKPOINT-DUE BOUNDARY: under `checkpointInterval=2` (the
  *     maximum boundary frequency) every other commit must re-anchor, so
  *     two racing CAS appenders contend exactly there — the winner
  *     writes the checkpoint, the loser re-reads and writes a delta on
  *     the NEW head. Pass = linearizability (no lost update, dense
  *     versions) PLUS protocol-shape evidence: every delta record's base
  *     is a checkpoint and no replay chain exceeds the interval.
  *
  *  2. VACUUM racing a MID-CHAIN REPLAY: an aggressive retention loop
  *     (grace 0, retainManifests=2) in this process while a COLD-cache
  *     reader JVM resolves the head and near-boundary retained versions.
  *     Vacuum's chain-aware retention keeps every link from the oldest
  *     retained version's checkpoint base forward, so the reader must
  *     NEVER hit the loud out-of-protocol chain error
  *     (`resolveSnap`'s missing-link path) — whole versions aging out is
  *     legitimate and skipped by the reader. */
class ManifestDeltaProtocolRaceSpec extends SparkSpec {

  private def spawnChild(mode: String, dir: String, tag: String, n: Int,
      ready: String, go: String, interval: Int): Process = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val moduleFlags = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.ops.ManifestDeltaRaceMain", mode, dir, tag, n.toString,
      ready, go, interval.toString)
    val child = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).start()
    val drain = new Thread(() => {
      val src = scala.io.Source.fromInputStream(child.getInputStream)
      src.getLines().foreach(l => System.err.println(s"[child] $l"))
      src.close()
    })
    drain.setDaemon(true); drain.start()
    child
  }

  private def awaitReadyAndGo(child: Process, ready: String, go: String): Unit = {
    val deadline = System.currentTimeMillis() + 120000
    while (!new java.io.File(ready).exists()) {
      assert(System.currentTimeMillis() < deadline, "child never ready")
      assert(child.isAlive, "child died during startup")
      Thread.sleep(20)
    }
    assert(new java.io.File(go).createNewFile())
  }

  test("two processes racing CAS appends across checkpoint-due boundaries (interval=2)") {
    import spark.implicits._
    val N = 8
    val dir = Files.createTempDirectory("graft-dxp").toString
    spark.conf.set("spark.graft.manifest.checkpointInterval", "2")
    try {
      graft.streaming.ManifestAppendSink.applyBatch(Seq(1L).toDF("v"), 7L, dir)
      val (v0, names0, hwm0) = TableManifest.readHead(spark, dir).get
      assert(hwm0.contains(7L))
      val scratch = Files.createTempDirectory("graft-dxp-flags")
      val ready = scratch.resolve("ready").toString
      val go = scratch.resolve("go").toString
      val child = spawnChild("append", dir, "dxpB", N, ready, go, 2)
      try {
        awaitReadyAndGo(child, ready, go)
        CasAppendLoop.run(spark, dir, "dxpA", N)
        assert(child.waitFor() == 0, "child writer failed")
      } finally if (child.isAlive) child.destroyForcibly()

      val (v1, names1, hwm1) = TableManifest.readHead(spark, dir).get
      val want = (1 to N).flatMap(i =>
        Seq(s"dxpA-$i.parquet", s"dxpB-$i.parquet")).toSet
      assert((want -- names1.toSet).isEmpty, "lost updates across processes")
      assert(names0.toSet.subsetOf(names1.toSet), "seed files must survive")
      assert(v1 == v0 + 2 * N, s"dense versions: $v0 -> $v1")
      assert(hwm1.contains(7L), s"hwm clobbered: $hwm1")

      // protocol-shape evidence straight from the written bodies: every
      // delta's base is a CHECKPOINT and no chain exceeds the interval
      val mdir = new java.io.File(dir, "_manifest")
      val bodies = mdir.listFiles()
        .filter(_.getName.matches("v\\d+\\.json")).sortBy(_.getName)
        .map(f => f.getName.drop(1).takeWhile(_ != '.').toLong ->
          new String(java.nio.file.Files.readAllBytes(f.toPath)))
        .toMap
      val baseRe = """"delta":1,"base":(\d+)""".r
      bodies.foreach { case (v, body) =>
        baseRe.findFirstMatchIn(body) match {
          case Some(m) =>
            val base = m.group(1).toLong
            val baseBody = bodies.getOrElse(base,
              fail(s"v$v's base v$base missing"))
            assert(baseRe.findFirstMatchIn(baseBody).isEmpty,
              s"v$v's base v$base is itself a delta — corrupt chain")
            assert(v - base < 2L,
              s"v$v replays ${v - base} links past its checkpoint " +
                "under interval=2")
          case None => () // a checkpoint
        }
      }
    } finally spark.conf.unset("spark.graft.manifest.checkpointInterval")
  }

  test("aggressive vacuum racing a cold-cache reader never breaks a retained chain (interval=2)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dxv").toString
    spark.conf.set("spark.graft.manifest.checkpointInterval", "2")
    try {
      graft.streaming.ManifestAppendSink.applyBatch(Seq(1L).toDF("v"), 1L, dir)
      val scratch = Files.createTempDirectory("graft-dxv-flags")
      val ready = scratch.resolve("ready").toString
      val go = scratch.resolve("go").toString
      val child = spawnChild("read", dir, "dxvR", 40, ready, go, 2)
      try {
        awaitReadyAndGo(child, ready, go)
        // writer+vacuum loop in THIS process: append a name, then prune
        // to the last 2 manifests with zero grace — the most hostile
        // retention the protocol allows (chain-aware: keeps the oldest
        // retained version's checkpoint base and every link forward)
        (1 to 30).foreach { i =>
          var won = false
          var attempts = 0
          while (!won) {
            attempts += 1
            assert(attempts <= 200, s"append $i starved")
            val (v, names, hwm) = TableManifest.readHead(spark, dir).get
            won = TableManifest.commitIf(spark, dir,
              names :+ s"dxv-$i.parquet", expectedHead = v, hwm = hwm)
              .isDefined
          }
          TableManifest.vacuum(spark, dir, graceMillis = 0L,
            retainManifests = 2)
        }
        assert(child.waitFor() == 0,
          "cold-cache reader hit a broken chain (see [child] stderr)")
      } finally if (child.isAlive) child.destroyForcibly()
      // the surviving history is still whole: head resolves, and every
      // surviving delta's chain is intact
      val (_, names, _) = TableManifest.readHead(spark, dir).get
      assert((1 to 30).map(i => s"dxv-$i.parquet").toSet.subsetOf(names.toSet))
    } finally spark.conf.unset("spark.graft.manifest.checkpointInterval")
  }

  // ---- round-18 DELETION-VECTOR race drills (verdict #4) ----

  import spark.implicits._

  /** Tracked single-file table, k = 0..99. */
  private def dvTable(tag: String): String = {
    val dir = Files.createTempDirectory(tag).toString
    (0L until 100L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    dir
  }

  private def withDv[A](f: => A): A = {
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    spark.conf.set("spark.graft.dv.materializeThreshold", "1.1")
    try f finally {
      spark.conf.unset("spark.graft.dml.deletionVectors")
      spark.conf.unset("spark.graft.dv.materializeThreshold")
    }
  }

  private def dvRetry(dir: String, k: Long): Unit = {
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      assert(attempts <= 100, s"dv delete k=$k starved")
      try { TableManifest.eraseWhereEq(spark, dir, "k", Seq(k)); done = true }
      catch {
        case e: Throwable if e.getMessage != null &&
            e.getMessage.contains("re-run against the new head") => ()
      }
    }
  }

  private def keysOf(dir: String): Seq[Long] =
    TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted

  test("two PROCESSES racing dv DELETEs on the same victim file: no position dropped, no row resurrected") {
    val N = 8
    val dir = dvTable("graft-dvxp")
    val scratch = Files.createTempDirectory("graft-dvxp-flags")
    val ready = scratch.resolve("ready").toString
    val go = scratch.resolve("go").toString
    val child = spawnChild("dvdelete", dir, "dvxpB", N, ready, go, 4)
    try {
      awaitReadyAndGo(child, ready, go)
      withDv { (0L until N.toLong).foreach(k => dvRetry(dir, k)) }
      assert(child.waitFor() == 0, "child dv writer failed")
    } finally if (child.isAlive) child.destroyForcibly()
    // the union of BOTH processes' deletions, exactly: a CAS loser that
    // overlaid a stale sidecar would resurrect the winner's rows here
    val want = (0L until 100L)
      .filterNot(k => k < N || (k >= 50L && k < 50L + N))
    assert(keysOf(dir) == want, "every process's deletions stick")
    val dvs = TableManifest.readDvs(spark, dir)
    assert(dvs.size == 1 && dvs.values.head._2 == 2L * N,
      s"one union sidecar carrying all ${2 * N} positions: $dvs")
    // protocol-shape: the referenced sidecar exists and decodes to the
    // exact position count
    val dvFile = new java.io.File(new java.io.File(dir, Dv.DirName),
      dvs.values.head._1)
    assert(dvFile.exists(), s"referenced sidecar missing: $dvFile")
  }

  test("dv DELETEs racing OPTIMIZE (victims vanish mid-statement): retry discipline converges exactly") {
    val N = 6
    val dir = dvTable("graft-dvxo")
    val scratch = Files.createTempDirectory("graft-dvxo-flags")
    val ready = scratch.resolve("ready").toString
    val go = scratch.resolve("go").toString
    val child = spawnChild("dvdelete", dir, "dvxoB", N, ready, go, 4)
    try {
      awaitReadyAndGo(child, ready, go)
      // hostile maintenance loop: append a fragment, then compact the
      // whole table (materializes any dvs, renames every file) — the
      // child's statements keep hitting vanished victims / dv drift
      (1 to 5).foreach { i =>
        (1000L + i to 1000L + i).map(k => (k, k)).toDF("k", "v")
          .coalesce(1).write.format("graft-manifest").mode("append")
          .save(dir)
        try Compaction.compactInPlace(spark, dir,
          targetBytes = 1L << 26, minFileBytes = 1L << 26)
        catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("races") => ()
        }
      }
      assert(child.waitFor() == 0, "child dv writer failed under OPTIMIZE")
    } finally if (child.isAlive) child.destroyForcibly()
    val want = ((0L until 100L).filterNot(k => k >= 50L && k < 50L + N) ++
      (1 to 5).map(i => 1000L + i)).sorted
    assert(keysOf(dir) == want,
      "deletes survive materialization; appends never lost")
  }

  test("dv DELETEs racing zero-grace vacuum: a referenced sidecar is never reclaimed out from under its commit") {
    val N = 6
    val dir = dvTable("graft-dvxv")
    val scratch = Files.createTempDirectory("graft-dvxv-flags")
    val ready = scratch.resolve("ready").toString
    val go = scratch.resolve("go").toString
    val child = spawnChild("dvdelete", dir, "dvxvB", N, ready, go, 4)
    try {
      awaitReadyAndGo(child, ready, go)
      // the most hostile retention the protocol allows, in a tight loop
      // against the child's executor-side sidecar writes: the in-flight
      // floor must protect a never-referenced young sidecar (its commit
      // may be invisible to this pass's listing)
      (1 to 20).foreach { i =>
        (2000L + i to 2000L + i).map(k => (k, k)).toDF("k", "v")
          .coalesce(1).write.format("graft-manifest").mode("append")
          .save(dir)
        TableManifest.vacuum(spark, dir, graceMillis = 0L,
          retainManifests = 2)
      }
      assert(child.waitFor() == 0, "child dv writer failed under vacuum")
    } finally if (child.isAlive) child.destroyForcibly()
    // every committed deletion holds AND every referenced sidecar is
    // still readable — a reclaimed-but-referenced sidecar would throw
    // FileNotFound right here
    val want = ((0L until 100L).filterNot(k => k >= 50L && k < 50L + N) ++
      (1 to 20).map(i => 2000L + i)).sorted
    assert(keysOf(dir) == want,
      "vacuum never gutted a live dv commit")
    val head = TableManifest.read(spark, dir).get._1
    assert(TableManifest.readTableAt(spark, dir, head).count() ==
      want.size.toLong)
  }

  test("DESCRIBE HISTORY racing vacuum: a version pruned mid-walk is omitted, never a raw FileNotFound") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-histvac").toString
    // interval=1: every body a checkpoint, so the ledger walk has no
    // chain dependencies and the deterministic mid-walk prune below
    // isolates exactly the listing-to-read window
    spark.conf.set("spark.graft.manifest.checkpointInterval", "1")
    try {
      (1 to 4).foreach { i =>
        graft.streaming.ManifestAppendSink.applyBatch(
          Seq(i.toLong).toDF("v"), i.toLong, dir)
      }
      // the racing vacuum, deterministically: prune v2 AFTER history's
      // listing saw it but BEFORE its body read
      TableManifest.historyListedHook = () => {
        TableManifest.historyListedHook = () => ()
        val m = new java.io.File(dir, "_manifest")
        assert(new java.io.File(m,
          "v00000000000000000002.json").delete())
        new java.io.File(m, ".v00000000000000000002.json.crc").delete()
      }
      val rows = TableManifest.history(spark, dir)
        .select("version", "n_files").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(1L, 3L, 4L),
        s"pruned version omitted, survivors intact: ${rows.toSeq}")
      // deltas re-anchor against what REMAINS: v3 counts its adds vs v1
      assert(rows.toMap.apply(3L) == 3L, s"v3 lists 3 files: ${rows.toSeq}")
    } finally {
      TableManifest.historyListedHook = () => ()
      spark.conf.unset("spark.graft.manifest.checkpointInterval")
    }
  }
}
