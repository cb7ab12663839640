package graft.streaming

import graft.ops.Merge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC apply: a change stream continuously merged (SCD-1) into a
  * parquet target via foreachBatch — the streaming face of
  * [[graft.ops.Merge]].
  *
  * Each micro-batch is last-writer-wins-collapsed ([[Merge.dedupLatest]])
  * and upserted into the current target snapshot; the new snapshot is
  * written to a scratch directory and swapped in with a delete+rename. The
  * swap is not atomic for concurrent readers (a transactional table format
  * owns that problem); it IS idempotent for the pipeline itself — a crashed
  * batch re-runs against whichever snapshot survived and upserting the same
  * keyed updates twice converges to the same table, so checkpointed
  * re-delivery is safe.
  *
  * 100 TB posture: the rewrite cost is the full-snapshot scan, the standard
  * copy-on-write trade. Partition the target by a key prefix and merge only
  * affected partitions to bound it; the merge itself is the
  * [[Merge.upsert]] anti-join + union (key shuffles only).
  */
object UpsertSink {

  def start(
      updates: DataFrame,
      targetDir: String,
      keys: Seq[String],
      versionCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, targetDir, keys, versionCol)
      }
      .start()

  /** Marker written into a scratch dir AFTER its snapshot write completes
    * and BEFORE the target swap starts. Our own marker, not `_SUCCESS`:
    * committers can be configured markerless
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`), and a
    * recovery keyed on an absent-by-config marker would misread every
    * complete scratch as garbage and delete the only surviving snapshot.
    * Underscore-prefixed, so parquet readers ignore it if it survives the
    * rename into the target. */
  private val CompleteMarker = "_GRAFT_COMPLETE"

  /** One merge round — exposed for tests and batch backfills. */
  def applyBatch(batch: DataFrame, batchId: Long, targetDir: String,
      keys: Seq[String], versionCol: String): Unit = {
    val spark = batch.sparkSession
    val target = new Path(targetDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratchPath = new Path(s"$targetDir.__batch$batchId")
    val scratchMarker = new Path(scratchPath, CompleteMarker)
    def renameOrThrow(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        // Hadoop rename reports failure as `false`, not an exception; a
        // silently failed swap here is exactly the overwrite-the-scratch
        // data-loss path recovery exists to close — fail the batch so the
        // checkpoint never advances past it
        sys.error(s"UpsertSink: rename $src -> $dst failed (batch $batchId)")
    // crash recovery FIRST: a previous attempt of this batch (same id —
    // the checkpoint only advances after foreachBatch returns) may have
    // died anywhere in its write→delete→rename sequence. The marker makes
    // the decision total:
    //  - marker present → the scratch is a COMPLETE snapshot and is
    //    authoritative; the target is either the pre-swap snapshot (crash
    //    before its delete), a PARTIAL remnant of a non-atomic recursive
    //    delete (its mere existence must not be trusted), or gone. Delete
    //    whatever remains and complete the swap; the re-merge below then
    //    converges idempotently.
    //  - marker absent but scratch present → the write itself died; the
    //    swap never started, so the target (if the table existed) is
    //    intact. Discard the garbage scratch.
    // Without the marker, an `fs.exists(target)` guard alone misreads a
    // partial target remnant as a live snapshot and merges against a
    // truncated table — silent row loss.
    if (fs.exists(scratchMarker)) {
      if (fs.exists(target)) fs.delete(target, true)
      renameOrThrow(scratchPath, target)
    } else if (fs.exists(scratchPath)) {
      fs.delete(scratchPath, true)
    }
    val collapsed = Merge.dedupLatest(batch, keys, versionCol)
    val merged =
      if (fs.exists(target))
        Merge.upsert(spark.read.parquet(targetDir), collapsed, keys)
      else collapsed
    merged.write.mode("overwrite").parquet(scratchPath.toString)
    fs.create(scratchMarker, true).close()
    // delete+rename swap: readers between the two calls see a missing dir
    // (documented non-atomicity); the pipeline itself re-runs cleanly —
    // a crash before the delete replays against the intact target, and a
    // crash during/after it leaves the marked scratch for recovery above
    if (fs.exists(target)) fs.delete(target, true)
    renameOrThrow(scratchPath, target)
  }
}
