package graft.streaming

import java.util.UUID

import graft.ops.TableManifest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once streaming append into a [[TableManifest]]-tracked parquet
  * table — the missing commit protocol between "a stream writes parquet
  * files" and "readers see each micro-batch once, atomically":
  *
  *   - each micro-batch's rows are written to a hidden scratch dir, moved
  *     in under batch-stamped unique names (`b<batchId>-<uuid>-pN
  *     .parquet`), and committed to the manifest as ONE new version —
  *     readers on [[TableManifest.readTable]] see the whole batch or none
  *     of it, never a torn prefix;
  *   - the batch id high-water mark is carried by the file names already
  *     in the head manifest, so a checkpoint-replayed batch (crash after
  *     commit, before the checkpoint advanced) is detected and skipped —
  *     re-delivery never duplicates rows;
  *   - a crash BEFORE the commit leaves only scratch/moved files that no
  *     manifest lists — invisible to readers, reclaimed by
  *     [[TableManifest.vacuum]].
  *
  * Single-writer per table (one streaming query), the same assumption the
  * checkpoint itself makes; manifest-version races with concurrent
  * maintenance (compaction) are handled by `commit`'s token read-back.
  * At scale the per-batch cost is one file move + one manifest rename per
  * commit — no table rewrite, readers never re-list the directory. */
object ManifestAppendSink {

  private val BatchFile = "b([0-9]+)-.*".r

  /** Highest batch id recorded in the head manifest's file names, -1 when
    * none. */
  def committedBatchHighWater(spark: org.apache.spark.sql.SparkSession,
      dir: String): Long =
    TableManifest.read(spark, dir).map(_._2).getOrElse(Nil)
      .collect { case BatchFile(id) => id.toLong }
      .maxOption.getOrElse(-1L)

  /** One micro-batch append — exposed for tests and batch backfills.
    * Idempotent on `batchId`: appending an already-committed batch is a
    * no-op. */
  def applyBatch(batch: DataFrame, batchId: Long, dir: String): Unit = {
    val spark = batch.sparkSession
    if (batchId <= committedBatchHighWater(spark, dir)) return

    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = UUID.randomUUID().toString
    val scratch = new Path(p, s".inflight-b$batchId-$tag")
    batch.write.parquet(scratch.toString)
    val moved = fs.listStatus(scratch).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.map { case (s, i) =>
        val name = s"b$batchId-$tag-p$i.parquet"
        require(fs.rename(s.getPath, new Path(p, name)),
          s"move of ${s.getPath} to $name failed")
        name
      }
    val prev = TableManifest.read(spark, dir).map(_._2).getOrElse(Nil)
    TableManifest.commit(spark, dir, prev ++ moved)
    fs.delete(scratch, true)
  }

  /** Continuously append `events` to the tracked table at `dir`. */
  def start(
      events: DataFrame,
      dir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, dir)
      }
      .start()
}
