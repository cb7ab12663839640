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
  *   - the batch id high-water mark is carried INSIDE the manifest (the
  *     `hwm` field), so a checkpoint-replayed batch (crash after commit,
  *     before the checkpoint advanced) is detected and skipped even after
  *     compaction or publish has renamed every data file — re-delivery
  *     never duplicates rows;
  *   - a crash BEFORE the commit leaves only scratch/moved files that no
  *     manifest lists — invisible to readers, reclaimed by
  *     [[TableManifest.vacuum]]. Vacuum never touches a `b<id>-…` file
  *     with id above the head hwm until it is at least max(grace, 10 min)
  *     old, so the moved-in window between rename and manifest commit is
  *     safe against a concurrent vacuum at ANY grace setting (far beyond
  *     any real commit latency), while a permanently-dead query's orphans
  *     still reclaim once clearly stale.
  *
  * Single-writer per table for BATCHES (one streaming query), the same
  * assumption the checkpoint itself makes; concurrent MAINTENANCE commits
  * (compaction, publish) are safe — the append commit is a
  * [[TableManifest.commitIf]] compare-and-swap, so a mid-append
  * maintenance commit forces a re-read-and-retry instead of being
  * silently overwritten. At scale the per-batch cost is one file move +
  * one exclusive manifest create — no table rewrite, readers never
  * re-list the directory. */
object ManifestAppendSink {

  /** Highest batch id committed to the table: the manifest-carried `hwm`
    * field (survives compaction/publish renaming the data files), falling
    * back to batch-stamped file names for tables written before the field
    * existed. -1 when neither is present. */
  def committedBatchHighWater(spark: org.apache.spark.sql.SparkSession,
      dir: String): Long =
    TableManifest.readHead(spark, dir) match {
      case None => -1L
      case Some((_, files, hwm)) =>
        val fromNames = files
          .collect { case BatchFile(id) => id.toLong }.maxOption
        (hwm.toSeq ++ fromNames).maxOption.getOrElse(-1L)
    }

  private val BatchFile = "b([0-9]+)-.*".r

  /** One micro-batch append — exposed for tests and batch backfills.
    * Idempotent on `batchId`: appending an already-committed batch is a
    * no-op. The commit is a compare-and-swap against the head the batch's
    * file list was derived from, so a maintenance commit landing
    * mid-append (compaction, publish) is never overwritten — the append
    * re-reads the fresh head and retries with its files preserved.
    *
    * `statsCols`: long/int columns whose footer min/max are committed
    * WITH the batch, so an appended file is born prunable
    * ([[TableManifest.readTableRange]]) with no separate analyze pass —
    * the footers were just written and are hot, so the extra cost is one
    * metadata read per file. */
  def applyBatch(batch: DataFrame, batchId: Long, dir: String,
      statsCols: Seq[String] = Seq.empty): Unit = {
    val spark = batch.sparkSession
    if (batchId <= committedBatchHighWater(spark, dir)) return
    val p = new Path(dir)
    val scratch = new Path(p,
      s".inflight-b$batchId-${UUID.randomUUID().toString}")
    batch.write.parquet(scratch.toString)
    commitScratch(spark, dir, scratch, batchId, Some(batch.schema), statsCols)
  }

  /** The commit tail shared by [[applyBatch]] and the DSv2 streaming
    * write ([[graft.sources.ManifestTableProvider]]): move the finalized
    * `part-*` files out of `scratch` under batch-stamped unique names,
    * CAS-commit them WITH the batch-id high-water mark (retrying against
    * a racing maintenance commit), then drop the scratch dir. Re-checks
    * the hwm first — the caller may have raced a replay — so a
    * double-invoked epoch only cleans up its scratch. */
  private[graft] def commitScratch(spark: org.apache.spark.sql.SparkSession,
      dir: String, scratch: Path, batchId: Long,
      schema: Option[org.apache.spark.sql.types.StructType],
      statsCols: Seq[String]): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (batchId <= committedBatchHighWater(spark, dir)) {
      fs.delete(scratch, true) // replayed epoch: rows already committed
      return
    }
    val parts =
      (if (fs.exists(scratch)) fs.listStatus(scratch).toSeq else Seq.empty)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
    // HIVE-PARTITIONED target (a date-partitioned event table is the
    // canonical streaming sink): the scratch holds FLAT part files whose
    // rows carry the partition columns as data, so the micro-batch is
    // re-laid out k=v/-nested before the move-in — one extra read+write
    // of the BATCH (just-written, hot), never of the table. The nested
    // BASENAMES keep the b<batchId>- stamp, so vacuum's above-hwm
    // in-flight protection and replay detection work unchanged.
    val partCols = TableManifest.layoutPartitionCols(spark, dir)
    val tag = UUID.randomUUID().toString
    // A SCHEMA-LESS batch (no writer-declared schema) reads its scratch
    // footers ALIGNED to the table's declared types: an up-cast-safe
    // narrow column (an old producer still writing INT into a column
    // widened to BIGINT — the exact flow ALTER COLUMN TYPE supports) is
    // read and RE-WRITTEN wide; a genuinely new column keeps the
    // append-widens posture; a NON-widenable type drift (long into a
    // declared int, string into a long) is LOUD — silently committing it
    // would retype the carried schema through the one path with no
    // declared contract. Applies to BOTH layouts (a flat table must not
    // keep the silent-merge hole the partitioned branch closed); the
    // partition columns themselves are exempt — their values re-lay out
    // into directory NAMES (an int 3 and a long 3 both land `bucket=3`).
    // `alignedWidened` = some column needed the up-cast, so the batch
    // must be rewritten (committing the narrow footer directly would
    // make commitIf's schema merge fail on int-vs-long).
    var alignedWidened = false
    val alignedReadSchema: Option[org.apache.spark.sql.types.StructType] =
      if (schema.nonEmpty || parts.isEmpty) schema
      else {
        import org.apache.spark.sql.types.{StructField, StructType}
        def norm(f: StructField) =
          org.apache.spark.sql.graft.SchemaBridge
            .asNullable(StructType(Array(f))).head.dataType
        val footer = spark.read.option("mergeSchema", "true")
          .parquet(parts.map(_.getPath.toString): _*).schema
        val declTypes = TableManifest.readSchema(spark, dir)
          .map(_.fields
            .filterNot(f => partCols.exists(_.equalsIgnoreCase(f.name)))
            .map(f => f.name.toLowerCase -> norm(f)).toMap)
          .getOrElse(Map.empty)
        Some(StructType(footer.fields.map { f =>
          declTypes.get(f.name.toLowerCase) match {
            case Some(dt) if dt == norm(f) => f
            case Some(dt) if TableManifest.losslesslyWidens(norm(f), dt) =>
              alignedWidened = true
              f.copy(dataType = dt)
            case Some(dt) => sys.error(
              s"streaming append into $dir: batch $batchId carries " +
                s"`${f.name}` as ${norm(f).simpleString} but the table " +
                s"declares ${dt.simpleString} — a schema-less sink never " +
                "retypes a column; widen the table (ALTER TABLE … ALTER " +
                "COLUMN … TYPE) or declare the batch schema")
            case None => f // new column: the append-widens contract
          }
        }))
      }
    val moved =
      if (parts.isEmpty) Seq.empty[String]
      else if (partCols.isEmpty && !alignedWidened)
        parts.zipWithIndex.map { case (s, i) =>
          val name = s"b$batchId-$tag-p$i.parquet"
          require(fs.rename(s.getPath, new Path(p, name)),
            s"move of ${s.getPath} to $name failed")
          name
        }
      else if (partCols.isEmpty) {
        // flat table, schema-less batch that needs the up-cast: rewrite
        // the batch under the aligned (wide) schema before the move-in —
        // one extra read+write of the BATCH, never of the table
        val wide = spark.read.schema(alignedReadSchema.get)
          .parquet(parts.map(_.getPath.toString): _*)
        val tmp = new Path(p, s".inflight-b$batchId-align-$tag")
        wide.write.parquet(tmp.toString)
        val rewritten = fs.listStatus(tmp).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .sortBy(_.getPath.getName)
          .zipWithIndex.map { case (s, i) =>
            val name = s"b$batchId-$tag-p$i.parquet"
            require(fs.rename(s.getPath, new Path(p, name)),
              s"move of ${s.getPath} to $name failed")
            name
          }
        fs.delete(tmp, true)
        rewritten
      }
      else {
        partCols.foreach(c => require(
          alignedReadSchema.forall(_.fieldNames.exists(_.equalsIgnoreCase(c))),
          s"streaming append into the partitioned table $dir must carry " +
            s"its partition column `$c`"))
        val batch = spark.read.schema(alignedReadSchema.get)
          .parquet(parts.map(_.getPath.toString): _*)
        // WRITE-PATH small-file policy, MEASURED by default: each input
        // task writes one file per partition value it holds, so a
        // micro-batch of T tasks spanning P live partition values lands
        // up to T×P files per epoch. The policy estimates P with one
        // cheap approx-distinct aggregate over the (already-hot,
        // epoch-sized) scratch read and shuffles ONLY when the T×P bound
        // exceeds `spark.graft.manifest.appendMaxFilesPerEpoch`
        // (default 64) — small batches keep their shuffle-free layout.
        // The shuffle is SALTED, not one-task-per-value: rows hash on
        // (partition cols, salt) into ~cap tasks with salt fan-out
        // cap/P per value, so a HOT partition keeps up to cap/P tasks of
        // parallelism while the epoch's file count stays ≤ cap (each
        // (value, salt) pair lands in exactly one task). The legacy
        // boolean `spark.graft.manifest.appendRepartition` still forces
        // the strict one-file-per-live-partition layout (salt factor 1).
        import org.apache.spark.sql.functions.{abs => sqlAbs, approx_count_distinct, col, lit, pmod, struct, xxhash64}
        val forceOnePerPartition = spark.conf
          .getOption("spark.graft.manifest.appendRepartition")
          .exists(_.trim.equalsIgnoreCase("true"))
        val maxFiles = spark.conf
          .getOption("spark.graft.manifest.appendMaxFilesPerEpoch")
          .flatMap(_.trim.toIntOption).map(math.max(1, _)).getOrElse(64)
        val laid =
          if (forceOnePerPartition && parts.size > 1)
            batch.repartition(partCols.map(col): _*)
          else if (parts.size > 1) {
            val live = math.max(1L, batch
              .agg(approx_count_distinct(
                struct(partCols.map(col): _*)).as("p"))
              .head().getLong(0))
            if (parts.size.toLong * live <= maxFiles) batch // small epoch
            else {
              val saltFactor = math.max(1L, maxFiles / live).toInt
              val dataCols = batch.columns.filterNot(c =>
                partCols.exists(_.equalsIgnoreCase(c)))
              val salt =
                if (saltFactor <= 1 || dataCols.isEmpty) lit(0)
                else pmod(sqlAbs(xxhash64(dataCols.map(col).toSeq: _*)),
                  lit(saltFactor.toLong))
              val n = math.max(1, math.min(maxFiles,
                (live * saltFactor).toInt))
              batch.repartition(n, (partCols.map(col) :+ salt): _*)
            }
          }
          else batch
        TableManifest.writeAndMoveInPartitioned(
          laid, s"b$batchId", dir, partCols)
      }
    // the carried schema stays DATA columns only on a partitioned target
    // (partition values live in the names — the init convention)
    val committedSchema =
      if (partCols.isEmpty) schema
      else schema.map(s0 => org.apache.spark.sql.types.StructType(
        s0.fields.filterNot(f =>
          partCols.exists(_.equalsIgnoreCase(f.name)))))
    val (stats, sstats) =
      if (statsCols.isEmpty || moved.isEmpty)
        (Map.empty[String, Map[String, (Long, Long)]],
          Map.empty[String, Map[String, (String, String)]])
      else TableManifest.fileAllStats(spark, dir, moved, statsCols)
    // the batch was laid out for the layout read above; appendBatch
    // re-checks against the CURRENT head inside every CAS attempt (so a
    // racing layout change — partitioned publish, restore — is loud,
    // never a mixed listing with silently-NULL partition values) and
    // routes steady-state epochs through the O(delta) append commit
    TableManifest.appendBatch(spark, dir, moved, hwm = Some(batchId),
      stats = stats, sstats = sstats, schema = committedSchema)
    fs.delete(scratch, true)
  }

  /** Continuously append `events` to the tracked table at `dir`;
    * `statsCols` makes every appended file immediately prunable (see
    * [[applyBatch]]). */
  def start(
      events: DataFrame,
      dir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      statsCols: Seq[String] = Seq.empty): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, dir, statsCols)
      }
      .start()
}
