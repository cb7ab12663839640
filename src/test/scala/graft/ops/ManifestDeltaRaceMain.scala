package graft.ops

import org.apache.spark.sql.SparkSession

/** Second-JVM side of `ManifestDeltaProtocolRaceSpec` — the round-16
  * cross-process drills of the LOG-STRUCTURED commit protocol
  * specifically (the pre-existing `ManifestRaceMain` drills predate it).
  * args: mode dir tag n readyFile goFile interval
  *
  *  - mode=append: the contended CAS append loop under the given
  *    `checkpointInterval` — with interval=2 every other commit lands on
  *    a checkpoint-due boundary, so two racing processes constantly
  *    contend exactly there (one must write the checkpoint, the loser
  *    re-reads and writes a delta on the NEW head).
  *  - mode=read: a COLD-cache reader loop (fresh JVM = empty resolution
  *    caches) resolving the head and recent retained versions while the
  *    parent process appends and aggressively vacuums. A retention that
  *    pruned a chain link the reader still needs would surface as the
  *    loud out-of-protocol resolution error — the drill's failure mode;
  *    a version pruned WHOLE (named "no manifest v…"/"does not exist")
  *    is legitimate retention and skipped.
  *  - mode=dvdelete (round 18): a DELETION-VECTOR DML loop — one
  *    merge-on-read DELETE per iteration of this process's own key
  *    range (tag ending "A" deletes 0.., anything else 50..), honoring
  *    the protocol's retry discipline: a loud "re-run against the new
  *    head" abort (dv-drift or victim-vanished — the exact guards the
  *    parent's racing dv/OPTIMIZE/vacuum traffic trips) re-runs the
  *    statement against the fresh head. The drill's failure mode is a
  *    delete that silently doesn't stick (the parent asserts the exact
  *    final survivor set) or an abort loop that starves.
  *
  * Exit 0 iff the loop completed without a protocol violation. */
object ManifestDeltaRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, dir, tag, nStr, readyFile, goFile, intervalStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-delta-race-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.manifest.checkpointInterval", intervalStr)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      require(new java.io.File(readyFile).createNewFile(), "ready flag exists")
      val deadline = System.currentTimeMillis() + 60000
      while (!new java.io.File(goFile).exists()) {
        require(System.currentTimeMillis() < deadline, "go flag never appeared")
        Thread.sleep(5)
      }
      mode match {
        case "append" => CasAppendLoop.run(spark, dir, tag, n)
        case "dvdelete" =>
          spark.conf.set("spark.graft.dml.deletionVectors", "true")
          spark.conf.set("spark.graft.dv.materializeThreshold", "1.1")
          val baseKey = if (tag.endsWith("A")) 0L else 50L
          var i = 0
          while (i < n) {
            val k = baseKey + i
            var done = false
            var attempts = 0
            while (!done) {
              attempts += 1
              require(attempts <= 100, s"dv delete k=$k starved")
              try {
                TableManifest.eraseWhereEq(spark, dir, "k", Seq(k))
                done = true
              } catch {
                case e: Throwable if e.getMessage != null &&
                    e.getMessage.contains("re-run against the new head") =>
                  () // the protocol's mandated retry; loop re-runs
              }
            }
            i += 1
          }
        case "read" =>
          var i = 0
          while (i < n) {
            val head = TableManifest.read(spark, dir)
              .getOrElse(sys.error(s"no manifest head in $dir"))
            require(head._2.nonEmpty || head._1 >= 1L, "head resolved empty")
            // probe a few RETAINED versions below the head — cold or
            // cache-anchored chain replays racing the parent's vacuum.
            // "no manifest v…" = the whole version aged out (fine);
            // the out-of-protocol chain error is a require-failure.
            (1L to 3L).foreach { back =>
              val v = head._1 - back
              if (v >= 1L) {
                try { TableManifest.readAt(spark, dir, v); () }
                catch {
                  case e: Throwable
                      if e.getMessage != null &&
                        (e.getMessage.contains("no manifest v") ||
                          e.getMessage.contains("does not exist")) => ()
                }
              }
            }
            i += 1
          }
      }
      spark.stop()
    } catch {
      case e: Throwable =>
        System.err.println(s"[delta-race-child] ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
  }
}
