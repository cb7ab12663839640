package graft.ops

import graft.SparkSpec

/** Deletion-vector COMMIT RACES (round-18 ADVICE high).
  *
  * A victim staying LISTED across the race window is not enough for a
  * rewrite to commit: a concurrent dv commit on the same file keeps it
  * listed but re-points its `dvs` entry. If the racing statement's
  * sidecars were merged from the stale entry (dv DELETE vs dv DELETE),
  * or its copy-on-write output never dropped the winner's positions
  * (CoW rewrite / OPTIMIZE vs dv DELETE), committing would silently
  * resurrect the winner's deleted rows. Both commit loops
  * ([[TableManifest.spliceCommit]] and the dvRewrite CAS) therefore
  * verify per attempt that every victim's dv entry still equals the
  * entry the rewrite was built from. On drift the dv path AUTO-RETRIES
  * its own marking pass against the fresh head (bounded by
  * `spark.graft.dml.conflictRetries`, default 3 — the marking pass is
  * the statement's whole work, so the retry is cheap) and aborts
  * LOUDLY on exhaustion; the CoW splice aborts loudly immediately (a
  * retry there means rewriting files — the user's re-run reads the
  * fresh head and re-prunes). The race window is driven
  * deterministically via [[TableManifest.rewritePreCommitHook]].
  */
class DvRaceSpec extends SparkSpec {

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

  /** Fires `body` exactly once, from inside the NEXT rewrite's race
    * window (after its victims were read and its outputs written, before
    * its first commit attempt), then clears itself so the concurrent
    * statement it lands doesn't recurse into the hook. */
  private def onceInRaceWindow(body: => Unit): Unit =
    TableManifest.rewritePreCommitHook = () => {
      TableManifest.rewritePreCommitHook = () => ()
      body
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

  private def keysOf(dir: String): Seq[Long] =
    TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted

  private def dvFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir, Dv.DirName)
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).filterNot(_.endsWith(".crc")).toSeq
  }

  test("dv DELETE racing dv DELETE on the SAME file: loser auto-retries against the fresh head and unions") {
    val dir = table3("gm-dvrace-dvdv")
    try {
      // winner lands k=3 inside the loser's (k=4) race window — same
      // victim file {3,4,5}, so the loser's sidecar was merged from a
      // dv entry that no longer exists. The loser detects the drift,
      // reclaims its artifacts, and RE-RUNS its marking pass against
      // the fresh head internally — both deletes land, no user re-run.
      // (confs held at TEST scope: the retry re-reads them mid-statement,
      // and a nested withDv's finally would unset them under it)
      withDv {
        onceInRaceWindow {
          TableManifest.eraseWhereEq(spark, dir, "k", Seq(3L))
        }
        TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L))
      }
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 5L, 6L, 7L, 8L),
        "both racing deletes applied, exactly once")
      val dvs = TableManifest.readDvs(spark, dir)
      assert(dvs.size == 1 && dvs.values.head._2 == 2L,
        s"retry unioned the winner's position with its own: $dvs")
      // the loser's first-attempt sidecar (merged from the stale entry)
      // was reclaimed: winner's + the retry's union sidecar only
      assert(dvFiles(dir).size == 2,
        s"aborted-attempt sidecar not reclaimed: ${dvFiles(dir)}")
    } finally TableManifest.rewritePreCommitHook = () => ()
  }

  test("dv-drift retries exhausted (conflictRetries=0): loud abort, winner's positions intact") {
    val dir = table3("gm-dvrace-exhaust")
    try {
      spark.conf.set("spark.graft.dml.conflictRetries", "0")
      onceInRaceWindow {
        withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(3L)) }
      }
      val err = intercept[RuntimeException] {
        withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
      }
      assert(err.getMessage.contains("deletion vector"),
        s"loud dv-drift abort, got: ${err.getMessage}")
      assert(err.getMessage.contains("re-run"), err.getMessage)
      // the winner's delete holds; the loser changed NOTHING
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L, 8L))
      val dvs = TableManifest.readDvs(spark, dir)
      assert(dvs.size == 1 && dvs.values.head._2 == 1L, s"$dvs")
      // the loser's aborted sidecar was cleaned up: only the winner's
      // write-once sidecar exists under _dv/
      assert(dvFiles(dir).size == 1, s"loser sidecar not reclaimed: ${dvFiles(dir)}")
      // the instructed re-run unions cleanly on the fresh head
      withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 5L, 6L, 7L, 8L))
      assert(TableManifest.readDvs(spark, dir).values.head._2 == 2L,
        "re-run merged both statements' positions")
    } finally {
      spark.conf.unset("spark.graft.dml.conflictRetries")
      TableManifest.rewritePreCommitHook = () => ()
    }
  }

  test("copy-on-write DELETE racing a dv DELETE on the SAME victim: splice aborts loudly instead of resurrecting") {
    val dir = table3("gm-dvrace-cow")
    try {
      onceInRaceWindow {
        withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(5L)) }
      }
      // dv conf OFF: this is the CoW sliceRewrite → spliceCommit path.
      // Its rewrite of {3,4,5} was read BEFORE the winner's dv on that
      // file existed — splicing it in would resurrect k=5.
      val err = intercept[RuntimeException] {
        TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L))
      }
      assert(err.getMessage.contains("deletion vector"),
        s"loud dv-drift abort, got: ${err.getMessage}")
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L),
        "winner's dv delete holds; loser changed nothing")
      // re-run reads the fresh head (dv applied), materializes it
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L))
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 3L, 6L, 7L, 8L))
      assert(TableManifest.readDvs(spark, dir).isEmpty,
        "the CoW rewrite materialized the dv away")
    } finally TableManifest.rewritePreCommitHook = () => ()
  }

  test("OPTIMIZE Z-ORDER racing a dv DELETE: maintenance auto-retries and materializes, never resurrects") {
    val dir = table3("gm-dvrace-zopt")
    TableManifest.analyze(spark, dir, Seq("k", "v"))
    try {
      // the dv lands inside the re-cluster's race window; maintenance is
      // idempotent, so the z-order re-plans from the fresh head (reading
      // through the winner's dv) instead of bouncing to the operator
      onceInRaceWindow {
        withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(7L)) }
      }
      TableManifest.optimizeZOrder(spark, dir, "k", "v", 2)
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L),
        "the retry materialized the winner's deletion into clean files")
      assert(TableManifest.readDvs(spark, dir).isEmpty)
    } finally TableManifest.rewritePreCommitHook = () => ()
  }

  test("OPTIMIZE Z-ORDER with maintenance retries disabled: the dv-drift abort stays loud") {
    val dir = table3("gm-dvrace-zopt0")
    TableManifest.analyze(spark, dir, Seq("k", "v"))
    try {
      spark.conf.set("spark.graft.maintenance.conflictRetries", "0")
      onceInRaceWindow {
        withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(7L)) }
      }
      val err = intercept[RuntimeException] {
        TableManifest.optimizeZOrder(spark, dir, "k", "v", 2)
      }
      assert(err.isInstanceOf[TableManifest.ConflictAbortException] &&
        err.getMessage.contains("deletion vector"),
        s"loud dv-drift abort, got: ${err.getMessage}")
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L))
      // the instructed re-run materializes the winner's deletion
      TableManifest.optimizeZOrder(spark, dir, "k", "v", 2)
      assert(keysOf(dir) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L))
      assert(TableManifest.readDvs(spark, dir).isEmpty)
    } finally {
      spark.conf.unset("spark.graft.maintenance.conflictRetries")
      TableManifest.rewritePreCommitHook = () => ()
    }
  }

  test("precision: a dv DELETE racing a dv DELETE on a DIFFERENT file commits normally") {
    val dir = table3("gm-dvrace-ok")
    try {
      onceInRaceWindow {
        withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L)) }
      }
      // k=4 lives in {3,4,5}; the concurrent k=1 dv is on {0,1,2} — no
      // victim overlap, so the CAS retry commits without drama
      withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
      assert(keysOf(dir) == Seq(0L, 2L, 3L, 5L, 6L, 7L, 8L))
      assert(TableManifest.readDvs(spark, dir).size == 2)
    } finally TableManifest.rewritePreCommitHook = () => ()
  }
}
