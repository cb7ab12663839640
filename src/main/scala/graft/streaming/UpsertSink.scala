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

  /** One merge round — exposed for tests and batch backfills. */
  def applyBatch(batch: DataFrame, batchId: Long, targetDir: String,
      keys: Seq[String], versionCol: String): Unit = {
    val spark = batch.sparkSession
    val target = new Path(targetDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery FIRST: a previous attempt of this batch (same id —
    // the checkpoint only advances after foreachBatch returns) may have
    // died between its delete and its rename. In that window the ONLY
    // surviving snapshot is the scratch dir; without this step the replay
    // would see no target, compute merged = this batch alone, and
    // OVERWRITE the scratch — silently erasing every row not in the
    // current batch. Completing the swap restores the full snapshot, and
    // the re-merge below then converges idempotently.
    val scratchPath = new Path(s"$targetDir.__batch$batchId")
    if (!fs.exists(target) && fs.exists(scratchPath))
      fs.rename(scratchPath, target)
    val collapsed = Merge.dedupLatest(batch, keys, versionCol)
    val merged =
      if (fs.exists(target))
        Merge.upsert(spark.read.parquet(targetDir), collapsed, keys)
      else collapsed
    merged.write.mode("overwrite").parquet(scratchPath.toString)
    // delete+rename swap: readers between the two calls see a missing dir
    // (documented non-atomicity); the pipeline itself re-runs cleanly —
    // a crash before the delete replays against the intact target, a
    // crash after it is healed by the recovery rename at the top
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(scratchPath, target)
  }
}
