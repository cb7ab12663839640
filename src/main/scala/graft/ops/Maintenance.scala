package graft.ops

import org.apache.spark.sql.SparkSession

/** One-call housekeeping for a manifest-tracked table — the nightly
  * maintenance job a 100 TB deployment schedules per table instead of
  * wiring four primitives by hand:
  *
  *   1. [[Compaction.compactInPlace]] — coalesce small-file fragments
  *      (reader-atomic CAS commit on tracked dirs; right-sized files stay
  *      byte-identical); hive-partitioned tables run
  *      [[Compaction.compactPartition]] per LEAF partition instead;
  *   2. [[TableManifest.analyze]] — refresh footer min/max (long + safe
  *      string) data-skipping stats for the given columns;
  *   3. [[TableManifest.analyzeBloom]] — refresh the point-lookup bloom
  *      for an id column, if one is named;
  *   4. [[TableManifest.vacuum]] — reclaim dead files and prune
  *      superseded markers/manifests under a retention budget, never past
  *      the slowest consumer and never inside the grace window — which
  *      covers both in-flight writes (young mtimes) and in-flight READERS
  *      of the pre-compaction head: the fragments step 1 just replaced
  *      were dereferenced seconds ago, so they survive until a full
  *      `graceMillis` has passed since their delisting commit and are
  *      reclaimed by the NEXT run.
  *
  * Every step commits independently via CAS and degrades conservatively,
  * so a crash between steps leaves the table fully consistent and the
  * next run converges — there is deliberately no cross-step transaction.
  * Concurrent streaming appends are safe throughout (each step either
  * splices or carries the head it re-reads per attempt). */
object Maintenance {

  final case class Report(
      compaction: Compaction.Stats,
      statsVersion: Option[Long],
      bloomVersion: Option[Long],
      vacuumed: Seq[String])

  def run(
      spark: SparkSession,
      dir: String,
      statsCols: Seq[String] = Seq.empty,
      bloomCol: Option[String] = None,
      targetBytes: Long = 128L << 20,
      minFileBytes: Long = 64L << 20,
      graceMillis: Long = 60L * 60 * 1000,
      retainManifests: Int = 64): Report = {
    // hive-partitioned tables compact PER LEAF PARTITION (whole-table
    // compaction refuses the layout — a root rewrite would strip the
    // name-carried values); flat tables keep the one-call form
    // layout dispatch + per-leaf isolation + PARALLEL leaves all live in
    // compactTracked — one definition of partitioned maintenance
    val compaction =
      Compaction.compactTracked(spark, dir, targetBytes, minFileBytes)
    val statsVersion =
      if (statsCols.nonEmpty) Some(TableManifest.analyze(spark, dir, statsCols))
      else None
    val bloomVersion = bloomCol.map(TableManifest.analyzeBloom(spark, dir, _))
    val vacuumed =
      TableManifest.vacuum(spark, dir, graceMillis, retainManifests)
    Report(compaction, statsVersion, bloomVersion, vacuumed)
  }
}
