package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, VariantExtraction}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.Statistics
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.internal.connector.{SupportsMetadata, SupportsPushDownCatalystFilters}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TableManifest

/** Streaming face of the `graft-manifest` provider: tailing a table's
  * COMMITS as micro-batches, `spark.readStream.format("graft-manifest")
  * .load(dir)` — the provider-level twin of [[TableManifest.consumeNew]]
  * (whose progress marker the streaming engine's own checkpoint replaces).
  *
  * Offsets are manifest VERSIONS (offset v = "everything up to and
  * including manifest v has been delivered"; 0 = nothing). Each batch
  * scans exactly the files listed at `end` but not at `start` — the same
  * delta [[TableManifest.addedBetween]] serves — through Spark's own
  * parquet DSv2 batch over that explicit file list, so the read path
  * (vectorized reader, split planning) is identical to the batch scan's.
  * For append-only writers (the streaming manifest sink, `commitIf` with
  * `files :+ new`) this is exact CDC; a full-snapshot rewrite re-lists
  * rows under new names and they reappear, the documented
  * file-granularity caveat.
  *
  * `startingVersion` option: `earliest` (default — first batch delivers
  * the whole head snapshot), `latest` (only commits after the stream
  * starts), or a version number. Consulted only on a fresh checkpoint;
  * restarts resume from the checkpointed version. The stream's schema is
  * pinned at stream start (the engine's contract); files committed later
  * are read under that schema.
  *
  * 100 TB posture: planning cost per trigger is two small manifest reads
  * (head + the `start` version) and a name diff — independent of table
  * size; scan cost is the delta's files only. `maxFilesPerTrigger` caps
  * admission during catch-up (native `SupportsAdmissionControl` +
  * `SupportsTriggerAvailableNow`, version-granular — see the field
  * scaladoc), so backfilling from `earliest` streams the snapshot as
  * schedulable chunks instead of one table-sized batch. A vacuum racing the stream
  * can only reclaim files the head no longer lists, so an append-only
  * tail never loses a listed file; a snapshot-REPLACING writer plus
  * zero-grace vacuum can invalidate an in-flight delta, which then fails
  * loudly at scan (the batch contract, same as time travel after
  * vacuum).
  *
  * DELETION VECTORS (round 18): a dv'd file in a delivery range streams
  * its LIVE rows only — see [[ManifestMicroBatchStream
  * .planInputPartitions]] (per-file row-index-filtered sub-batches) and
  * the dv-coherent admission walk in `latestOffset` (a chunk boundary
  * never splits a file from a later dv on it within the same catch-up
  * window, so the chunked union equals the uncapped one). A dv added to
  * an ALREADY-delivered file re-delivers nothing — file-granularity CDC
  * cannot retract rows, the same documented caveat as a rewrite
  * re-listing them. */
private[sources] object ManifestStream {

  /** The files at `to` not yet delivered at `from` (version 0 = nothing
    * delivered). Loud on a pruned/missing manifest — silently treating a
    * vanished `from` as empty would re-deliver the whole table. */
  def freshFiles(spark: SparkSession, dir: String,
      from: Long, to: Long): Seq[String] = {
    if (to <= from) return Seq.empty
    val toFiles = TableManifest.readAt(spark, dir, to)
      .getOrElse(sys.error(s"graft-manifest stream: v$to vanished from $dir"))
    val fromFiles =
      if (from <= 0) Set.empty[String]
      else TableManifest.readAt(spark, dir, from)
        .getOrElse(sys.error(
          s"graft-manifest stream: checkpointed v$from vanished from $dir " +
            "(manifest history pruned?) — cannot compute an exact delta"))
        .toSet
    toFiles.filterNot(fromFiles)
  }
}

/** ScanBuilder wrapper that forwards the delegate parquet builder's whole
  * pushdown surface (columns, catalyst filters, aggregates, variant
  * extractions) so BATCH plans through the provider keep pruning +
  * pushdown bit-identical, while `build()` wraps the scan to add the
  * micro-batch entry point. */
private[sources] final class ManifestScanBuilder(
    delegate: ParquetScanBuilder, dir: String,
    options: CaseInsensitiveStringMap,
    renamedCarriers: Boolean = false,
    dvdFiles: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with SupportsPushDownAggregates
    with SupportsPushDownVariantExtractions {

  override def build(): Scan =
    new ManifestScan(delegate.build(), dir, options, renamedCarriers,
      dvdFiles)

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters
  override def pushAggregation(aggregation: Aggregation): Boolean =
    delegate.pushAggregation(aggregation)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    delegate.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    delegate.pushVariantExtractions(extractions)
}

/** Scan wrapper: batch behavior (partitions, statistics → broadcast
  * decisions, explain metadata) delegates untouched to the parquet
  * FileScan; `toMicroBatchStream` is the one addition.
  *
  * `renamedCarriers`: the table had live RENAME COLUMN carrier files
  * when this scan was built. A BATCH execution of such a scan would
  * silently serve NULLs for renamed columns of pre-rename files, so
  * `toBatch` refuses loudly — the guard lives HERE, not at scan
  * creation, because a MICRO-BATCH stream through the same builder is
  * fine: [[ManifestMicroBatchStream.planInputPartitions]] does its own
  * per-delivery-range grouping (pre-rename files are delivered under
  * their own physical names, aliased positionally to the pinned
  * schema), and a checkpointed restart whose ranges are entirely
  * post-rename never touches a carrier at all. Batch plans through a
  * session with the graft extensions never reach this: the expansion
  * rule replaced the relation before planning. */
private[sources] final class ManifestScan(
    delegate: Scan, dir: String, options: CaseInsensitiveStringMap,
    renamedCarriers: Boolean = false,
    dvdFiles: Boolean = false)
    extends Scan with SupportsReportStatistics with SupportsMetadata {

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def toBatch: Batch = {
    // each guard names ITS OWN failure mode: a dv-only table must not
    // be told about renamed columns it doesn't have (and vice versa)
    if (renamedCarriers)
      sys.error(s"graft-manifest: $dir has renamed columns whose old " +
        "physical names are still carried by live files; reading it " +
        "requires the graft session extensions " +
        "(GraftExtensions expands the scan into per-physical-name " +
        "groups) or TableManifest.readTable. OPTIMIZE the table to " +
        "rewrite the carriers and clear the mapping.")
    if (dvdFiles)
      sys.error(s"graft-manifest: $dir has files carrying deletion " +
        "vectors; a plain batch scan would re-serve the deleted rows. " +
        "Reading it requires the graft session extensions (the dv " +
        "splice applies the bitmaps) or TableManifest.readTable. " +
        "OPTIMIZE the table to materialize the deletions.")
    delegate.toBatch
  }
  override def supportedCustomMetrics(): Array[CustomMetric] =
    delegate.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    delegate.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()
  override def estimateStatistics(): Statistics =
    delegate.asInstanceOf[SupportsReportStatistics].estimateStatistics()
  override def getMetaData(): Map[String, String] =
    delegate.asInstanceOf[SupportsMetadata].getMetaData()

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ManifestMicroBatchStream(dir, delegate.readSchema(), options)
}

/** Offset = highest manifest version already delivered. */
case class ManifestOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

object ManifestOffset {
  private val VersionRe = """.*"version"\s*:\s*(-?\d+).*""".r
  def parse(json: String): ManifestOffset = json match {
    case VersionRe(v) => ManifestOffset(v.toLong)
    case _ => throw new IllegalArgumentException(
      s"bad graft-manifest offset: $json")
  }
}

private[sources] final class ManifestMicroBatchStream(
    dir: String, schema: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  /** `maxFilesPerTrigger`: catch-up throttle. A stream starting at
    * `earliest` on a big table would otherwise deliver the ENTIRE head
    * snapshot as one micro-batch — at 100 TB that is one unschedulable
    * trigger monopolizing the cluster and a checkpoint that holds nothing
    * until it finishes. With the cap, `latestOffset(start, limit)` walks
    * versions forward from `start` and admits the longest prefix whose
    * cumulative fresh-file count stays within the cap (offsets are
    * manifest versions, so admission is VERSION-granular: one commit
    * larger than the cap is admitted whole rather than stalling the
    * stream — documented, same shape as a too-big Kafka batch). Steady
    * state (tailing one commit per trigger) is unaffected. Walk cost is
    * one small manifest read per candidate version, paid only while
    * catching up. */
  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map { v =>
      val n = v.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"maxFilesPerTrigger must be a positive int: '$v'"))
      require(n > 0, s"maxFilesPerTrigger must be > 0: $n")
      n
    }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** Trigger.AvailableNow pin: everything up to the head AT QUERY START is
    * delivered (chunked by the read limit), then the query terminates —
    * commits landing while it drains wait for the next run. */
  @volatile private var availableNowHead: Long = Long.MaxValue
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = headVersion()

  private def headVersion(): Long =
    TableManifest.read(spark, dir).map(_._1).getOrElse(0L)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = ManifestOffset.parse(start.json()).version
    val head = math.min(headVersion(), availableNowHead)
    if (head <= from) return ManifestOffset(from)
    val limits = limit match {
      case c: CompositeReadLimit => c.getReadLimits.toSeq
      case l => Seq(l)
    }
    limits.collectFirst { case f: ReadMaxFiles => f.maxFiles() } match {
      case None => ManifestOffset(head)
      case Some(k) =>
        val delivered: Set[String] =
          if (from <= 0) Set.empty
          else TableManifest.readAt(spark, dir, from).getOrElse(sys.error(
            s"graft-manifest stream: checkpointed v$from vanished from " +
              s"$dir (manifest history pruned?) — cannot size the batch"))
            .toSet
        // longest version prefix whose CUMULATIVE fresh-file count (names
        // at v not at `from` — exactly what freshFiles will deliver) fits
        // the cap; a version admitting nothing new (stats-only commits)
        // passes through for free. An intermediate version pruned by
        // manifest retention is SKIPPED, not fatal: the next surviving
        // version still RESOLVES (vacuum's chain-aware retention keeps
        // every record from the oldest retained version's checkpoint
        // base forward), so its fresh count vs `from` is exactly the
        // delta the stream will deliver — the pruned step only loses
        // batch-boundary granularity, never data (the uncapped path
        // diffs `from` vs `head` directly and was already immune).
        // `vStop` only ever lands on a SURVIVING version, so the planned
        // batch's `end` manifest is readable.
        var vStop = from
        var v = from + 1
        var halt = false
        while (!halt && v <= head) {
          TableManifest.readAt(spark, dir, v) match {
            case None => v += 1 // retention-pruned intermediate: skip
            case Some(names) =>
              val cum = names.count(n => !delivered(n))
              if (cum <= k) { vStop = v; v += 1 }
              else if (vStop == from) { vStop = v; halt = true } // oversized single step: admit whole, never stall
              else halt = true
          }
        }
        // a chunk boundary must not land INSIDE a pre-rename window: a
        // stream pinned to the post-rename logical schema whose capped
        // catch-up stopped at a version that predates the rename would
        // plan a range whose at-`to` schema can't spell the pinned
        // names (planInputPartitions refuses it loudly — correct for a
        // genuine forward rename, but a catch-up just needs the chunk
        // extended THROUGH the rename commit; the grouping delivers the
        // carriers). The cap is advisory here, same as the oversized
        // single-commit case above.
        while (vStop > from && vStop < head && !pinnedCoveredAt(vStop)) {
          vStop += 1
          while (vStop < head &&
            TableManifest.readAt(spark, dir, vStop).isEmpty) vStop += 1
        }
        // DV-coherence: deliveries are filtered by the dvs at the
        // chunk's own `to` (deterministic — replanning a checkpointed
        // range must reproduce it exactly), so a chunk must not admit a
        // file whose dv entry CHANGES later in this same catch-up
        // window: the dv overlay rides a fileless commit the walk would
        // skip past, and the chunked union would diverge from the
        // uncapped run's (deleted rows served, or rewrite duplicates).
        // Extend the boundary until every admitted file's dv entry
        // agrees with the head's. Catch-up-only cost, zero on dv-free
        // tables; offsets are chosen here ONCE per trigger, so
        // consulting the live head keeps plan determinism intact.
        val dvsAtHead = dvsAt(head)
        if (dvsAtHead.nonEmpty) {
          var coherent = false
          while (!coherent && vStop < head) {
            val dvsHere = dvsAt(vStop)
            val freshHere = ManifestStream.freshFiles(spark, dir, from, vStop)
            if (freshHere.exists(f => dvsHere.get(f) != dvsAtHead.get(f))) {
              vStop += 1
              while (vStop < head &&
                TableManifest.readAt(spark, dir, vStop).isEmpty) vStop += 1
            } else coherent = true
          }
        }
        ManifestOffset(vStop)
    }
  }

  /** The dv entries committed at version `v` (empty for dv-free bodies
    * and untracked dirs). */
  private def dvsAt(v: Long): Map[String, (String, Long)] =
    TableManifest.readAtFull(spark, dir, v).map(_._6)
      .getOrElse(Map.empty)

  /** Whether version `v`'s committed schema (data + declared partition
    * columns) spells every pinned stream column. Pre-schema bodies pass
    * (no evidence either way — the entry-based guard still stands). */
  private def pinnedCoveredAt(v: Long): Boolean =
    TableManifest.readAtFull(spark, dir, v).forall { t =>
      t._2.forall { s =>
        val names = (s.fieldNames ++
          t._4.map(_.fieldNames).getOrElse(Array.empty[String]))
          .map(_.toLowerCase).toSet
        schema.fieldNames.forall(n => names(n.toLowerCase))
      }
    }

  override def reportLatestOffset(): Offset = ManifestOffset(headVersion())

  /** Parquet DSv2 batch over an explicit file list under `readSchema`
    * (the stream's pinned schema, or a carrier group's physical-name
    * respelling of it) — one or more per trigger; the factories of the
    * last planned trigger serve `createReaderFactory` (the engine plans
    * partitions and then builds the factory within the same trigger,
    * single-threaded). Planned through the manifest-fabricated file
    * index (`fstat` from the batch's OWN `end`-version body), so
    * per-trigger planning makes zero filesystem calls — during an
    * `earliest` catch-up on a big table the admission cap bounds each
    * trigger's files, and this keeps each trigger's planning bounded
    * too. */
  private def batchFor(files: Seq[String],
      fstat: Map[String, (Long, Long)],
      readSchema: StructType): Batch = {
    // the stream's PINNED schema also types any name-carried partition
    // columns, so a declared-type partitioned table serves the same
    // partition types per trigger as its batch scans do
    val idx = ManifestReadTable.index(spark, dir, files, fstat,
      Some(readSchema))
    // hive layouts: the stream's pinned schema contains the partition
    // columns; the (full, data) split keeps them served from the names,
    // never asked of the footers (the batch-scan discipline)
    val (full, data) = ManifestReadTable.splitSchemas(readSchema, idx)
    ParquetScanBuilder(spark, idx, full, data, options).build().toBatch
  }

  @volatile private var planned: PartitionReaderFactory = _

  override def initialOffset(): Offset =
    Option(options.get("startingVersion")).map(_.trim.toLowerCase) match {
      case None | Some("earliest") => ManifestOffset(0L)
      case Some("latest") => latestOffset()
      case Some(v) =>
        val version = v.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"startingVersion must be 'earliest', 'latest', or a version: '$v'"))
        require(version == 0 ||
          TableManifest.readAt(spark, dir, version).isDefined,
          s"startingVersion $version does not exist in $dir")
        ManifestOffset(version)
    }

  override def latestOffset(): Offset =
    ManifestOffset(TableManifest.read(spark, dir).map(_._1).getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    ManifestOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = ManifestOffset.parse(start.json()).version
    val to = ManifestOffset.parse(end.json()).version
    val fresh = ManifestStream.freshFiles(spark, dir, from, to)
    val (fstat, schemaAtTo, partAtTo, renames, dvsAtEnd) =
      if (to <= from) (Map.empty[String, (Long, Long)],
        None: Option[StructType], None: Option[StructType],
        Seq.empty[graft.ops.TableManifest.Rename],
        Map.empty[String, (String, Long)])
      else TableManifest.readAtFull(spark, dir, to)
        .map(t => (t._3, t._2, t._4, t._5, t._6))
        .getOrElse((Map.empty[String, (Long, Long)], None, None,
          Seq.empty[graft.ops.TableManifest.Rename],
          Map.empty[String, (String, Long)]))
    // FORWARD guard: a RENAME COLUMN committed AFTER this stream pinned
    // its schema. The mapping entries at `to` spell logical names the
    // pinned schema doesn't know (and the pinned name survives only as
    // an entry's physical `from`): post-rename files would pass a
    // carriers-only check and then silently serve NULLs under the
    // pinned name — exactly the failure mode the design refuses loudly.
    // Delta takes the same posture: a rename mid-stream requires a
    // restart (the restarted stream pins the new logical schema and the
    // grouping below serves every generation).
    val pinned = schema.fieldNames.map(_.toLowerCase).toSet
    renames.find(r =>
      pinned(r.from.toLowerCase) || !pinned(r.to.toLowerCase)).foreach(r =>
      sys.error(s"graft-manifest stream: $dir renamed column " +
        s"`${r.from}` -> `${r.to}` after this stream pinned its schema; " +
        "restart the stream (a fresh start pins the new logical schema " +
        "and serves every file generation)"))
    // SCHEMA-based forward guard, independent of surviving mapping
    // entries: if a rename commits and OPTIMIZE rewrites every carrier
    // between two triggers, the entries at `to` are already empty — the
    // entry check above passes — yet the range's files spell the NEW
    // physical name and would serve NULLs under the pinned one. The
    // at-`to` committed schema (data + declared partition columns)
    // must cover every pinned name, or the delivery refuses loudly
    // with the same restart path. Pre-schema bodies (None) skip the
    // check — the entry guard still stands for them.
    if (fresh.nonEmpty) schemaAtTo.foreach { s =>
      val atTo = (s.fieldNames ++
        partAtTo.map(_.fieldNames).getOrElse(Array.empty[String]))
        .map(_.toLowerCase).toSet
      val missing = schema.fieldNames.filterNot(n => atTo(n.toLowerCase))
      if (missing.nonEmpty)
        sys.error(s"graft-manifest stream: $dir delivery range " +
          s"(v$from, v$to] does not carry pinned column(s) " +
          s"${missing.mkString("`", "`, `", "`")} (a column was renamed " +
          "after this stream pinned its schema); restart the stream " +
          "(a fresh start pins the new logical schema)")
    }
    // BACKWARD ranges (the stream pinned the POST-rename logical schema
    // and this range delivers pre-rename carrier files — an `earliest`
    // backfill over a renamed table): group the delivery by carried
    // physical name, scan each group under the pinned schema respelled
    // to that group's physical names, and serve the rows as-is — rows
    // are POSITIONAL, so the pinned logical schema names them at the
    // stream surface. At most #renames+1 groups; the common tail case
    // (no carriers in range) stays the single-batch fast path.
    //
    // DELETION VECTORS: an undelivered file that carries a dv at `to`
    // is delivered through its own sub-batch whose requested schema
    // appends Spark's parquet row-index generator column
    // (ROW_INDEX_TEMPORARY_COLUMN_NAME — the exact mechanism behind
    // the V1 `_metadata.row_index`), wrapped in a reader factory that
    // drops the deleted positions and projects the column back out. So
    // a dv DELETE landing on a not-yet-delivered file streams exactly
    // the live rows; splits stay parallel (row indexes are global per
    // file, whichever split serves them). A dv added to an ALREADY
    // delivered file re-delivers nothing (no new file) — those
    // deletions never retro-propagate to the stream, the documented
    // file-granularity CDC caveat (same as a rewrite re-listing rows).
    val groups = TableManifest.renameGroups(renames, fresh)
    val freshDvd: Set[String] = fresh.iterator.filter(dvsAtEnd.contains).toSet
    if (groups.length == 1 && groups.head._2.isEmpty && freshDvd.isEmpty) {
      val batch = batchFor(fresh, fstat, schema)
      val parts = batch.planInputPartitions()
      planned = batch.createReaderFactory()
      parts
    } else {
      // deleted-position arrays for the range's dv'd files, resolved
      // driver-side from the at-`to` sidecars; manifest names are
      // unique relative paths, so the lookup is exact by construction
      val bitmaps =
        if (freshDvd.isEmpty)
          graft.ops.Dv.Index("", Map.empty)
        else graft.ops.Dv.loadBitmaps(spark, dir,
          dvsAtEnd.filter(kv => freshDvd(kv._1)))
      def positionsOf(f: String): Array[Long] = {
        val base = f.substring(f.lastIndexOf('/') + 1)
        bitmaps.buckets.getOrElse(base, Seq.empty)
          .collectFirst { case (name, arr) if name == f => arr }
          .getOrElse(sys.error(
            s"graft-manifest stream: no deletion bitmap resolved for $f"))
      }
      // delivery units: per rename group, ONE parquet batch for its
      // clean files plus one dv-filtered batch PER dv'd file (each
      // file's bitmap is its own — per-file units keep the filter
      // exact without shipping file identity into every row)
      val units: Seq[(Seq[String], StructType, Option[Array[Long]])] =
        groups.flatMap { case (gFiles, subst) =>
          val phys = StructType(schema.fields.map(f =>
            subst.get(f.name.toLowerCase)
              .map(p => f.copy(name = p)).getOrElse(f)))
          val (dvd, clean) = gFiles.partition(freshDvd)
          (if (clean.nonEmpty || dvd.isEmpty) Seq((clean, phys, None))
           else Seq.empty) ++
            dvd.map(f => (Seq(f), phys, Some(positionsOf(f))))
        }
      val factories = new Array[PartitionReaderFactory](units.length)
      val parts = units.zipWithIndex.flatMap {
        case ((uFiles, phys, None), ui) =>
          val b = batchFor(uFiles, fstat, phys)
          factories(ui) = b.createReaderFactory()
          b.planInputPartitions()
            .map(p => GroupTaggedPartition(p, ui): InputPartition)
        case ((uFiles, phys, Some(deleted)), ui) =>
          val withIdx = StructType(phys.fields :+ StructField(
            ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
            org.apache.spark.sql.types.LongType, nullable = true))
          val idx = ManifestReadTable.index(spark, dir, uFiles, fstat,
            Some(withIdx))
          val (full, data) = ManifestReadTable.splitSchemas(withIdx, idx)
          val b = ParquetScanBuilder(spark, idx, full, data, options)
            .build().toBatch
          factories(ui) = new DvFilteringReaderFactory(
            b.createReaderFactory(), full,
            full.fieldIndex(
              ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME),
            deleted)
          b.planInputPartitions()
            .map(p => GroupTaggedPartition(p, ui): InputPartition)
      }
      // Spark's DataSourceRDD requires every partition of one scan to
      // agree row-vs-columnar; a trigger holding any dv-filtered unit
      // (row-based by construction) therefore reads its clean units
      // row-based too — dv'd triggers are the sparse exception, the
      // all-clean fast path above stays columnar
      planned = new GroupedReaderFactory(factories,
        forceRows = freshDvd.nonEmpty)
      parts.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val f = planned
    if (f != null) f
    else batchFor(Seq.empty, Map.empty, schema).createReaderFactory()
  }

  /** The manifest keeps history (vacuum owns retention); nothing to ack. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** An input partition of one RENAME-carrier group's parquet batch,
  * tagged with its group index so the trigger's single reader factory
  * can route it to the factory built for that group's physical-name
  * read schema. The delegate rides verbatim (split locality preserved). */
private[sources] final case class GroupTaggedPartition(
    delegate: InputPartition, group: Int) extends InputPartition {
  override def preferredLocations(): Array[String] =
    delegate.preferredLocations()
}

/** Reader factory for ONE deletion-vector'd file's sub-batch: the
  * delegate parquet reader was planned with Spark's row-index generator
  * column appended to the requested schema (row indexes are global
  * within the file, correct under any split), and this wrapper drops
  * every row whose index is in `deleted` (the file's sidecar positions,
  * sorted — one binary search per row) and projects the generator
  * column back out, so the stream surface serves exactly the pinned
  * schema. Row-based by construction (`supportColumnarReads` = false):
  * dv'd files are the sparse exception in a delivery range, never the
  * bulk path. The positions array rides the task closure — bounded by
  * the file's deleted-row count, sparse by the dv write path's contract
  * (dense files are materialized away, never dv'd). */
private[sources] final class DvFilteringReaderFactory(
    delegate: PartitionReaderFactory, schema: StructType, tmpIdx: Int,
    deleted: Array[Long]) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read.PartitionReader

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createColumnarReader(p: InputPartition) =
    throw new UnsupportedOperationException(
      "dv-filtered stream partitions are row-based")

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(schema.fields.zipWithIndex.collect {
        case (f, i) if i != tmpIdx =>
          org.apache.spark.sql.catalyst.expressions
            .BoundReference(i, f.dataType, f.nullable)
      }.toSeq)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (java.util.Arrays.binarySearch(deleted,
              r.getLong(tmpIdx)) < 0) {
            cur = r
            return true
          }
        }
        false
      }
      override def get(): InternalRow = proj(cur)
      override def close(): Unit = inner.close()
    }
  }
}

/** Routes each [[GroupTaggedPartition]] to its group's parquet reader
  * factory. Rows/columnar batches come back POSITIONAL — the stream's
  * pinned logical schema names them — so a pre-rename file's physical
  * columns serve the logical stream schema with zero per-row work. */
private[sources] final class GroupedReaderFactory(
    factories: Array[PartitionReaderFactory],
    forceRows: Boolean = false) extends PartitionReaderFactory {
  private def route[A](p: InputPartition)(
      f: (PartitionReaderFactory, InputPartition) => A): A = p match {
    case GroupTaggedPartition(d, g) => f(factories(g), d)
    case other => throw new IllegalStateException(
      s"GroupedReaderFactory got an untagged partition: $other")
  }
  override def createReader(p: InputPartition) =
    route(p)(_.createReader(_))
  override def createColumnarReader(p: InputPartition) =
    route(p)(_.createColumnarReader(_))
  override def supportColumnarReads(p: InputPartition): Boolean =
    // one scan must be uniformly row-based or columnar (DataSourceRDD
    // refuses a mix); a trigger with any dv-filtered unit forces rows
    !forceRows && route(p)(_.supportColumnarReads(_))
}
