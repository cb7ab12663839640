package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{AlwaysTrue, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TableManifest

/** DataSource V2 provider exposing [[graft.ops.TableManifest]] tables to
  * generic consumers — most importantly the pure-SQL surface:
  *
  * {{{
  *   CREATE TABLE events USING `graft-manifest` OPTIONS (path '/wh/events');
  *   SELECT * FROM events;                                     -- head
  *   spark.read.format("graft-manifest")
  *     .option("versionAsOf", 3).load(dir)                     -- time travel
  *   spark.read.format("graft-manifest")                       -- by wall clock
  *     .option("timestampAsOf", "2024-01-01T00:00:00Z").load(dir)
  * }}}
  *
  * (Direct `FROM `graft-manifest`.`dir`` path queries are not available:
  * Spark restricts that syntax to V1 `FileFormat` sources; `CREATE TABLE
  * ... USING` is the DSv2 SQL entry point.)
  *
  * The provider resolves the manifest at ANALYSIS time — reads the head
  * (or `versionAsOf`) manifest version, maps its file names to full paths
  * — and then delegates scanning to Spark's own parquet DSv2 table over
  * exactly that file list. So every scan feature the native parquet
  * source has (column pruning, predicate pushdown, vectorized read,
  * partition-size splitting) applies unchanged, and the manifest layer
  * only decides WHICH files exist — the same separation
  * [[TableManifest.readTable]] makes, now reachable from SQL. A snapshot
  * is pinned when the relation is resolved: concurrent commits or vacuums
  * after analysis don't change (or break) a running query, because the
  * delegate holds explicit file paths, never a directory listing.
  *
  * An untracked plain directory falls back to the full parquet dir scan
  * (mirrors `readTable`'s contract). */
class ManifestTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  override def supportsExternalMetadata(): Boolean = true

  /** Snapshots resolved by `inferSchema` on this provider instance, keyed
    * by (path, versionAsOf). Spark calls `inferSchema` then `getTable` on
    * the same instance during one load; without the pin, the two calls
    * would read the manifest twice, and a commit landing in between would
    * split schema inference and the scan across DIFFERENT snapshots.
    * `getTable` reuses the pinned file list when the key matches and only
    * re-resolves for a genuinely different read.
    *
    * A bounded LRU MAP, not a single slot: one provider instance can be
    * shared by concurrent resolutions of different catalog tables, and a
    * single slot lets resolution B evict A's pin between A's two calls —
    * re-opening exactly the split-snapshot window the pin closes
    * (`ManifestProviderPinSpec` drills it). 16 entries bounds the
    * worst case at one small file list per in-flight resolution; an
    * evicted pin only costs a re-read of the same manifest version for
    * `versionAsOf` reads, and for head reads degrades to the pre-pin
    * behavior (two head reads that a racing commit could split — with
    * >16 SIMULTANEOUS resolutions through one instance, an unbounded
    * map would be the leak instead). Access-ordered so the `getTable`
    * half of an in-flight pair refreshes its pin's recency. */
  private val pinned =
    new util.LinkedHashMap[String, ManifestTableProvider.Resolved](
        32, 0.75f, true) {
      override def removeEldestEntry(
          e: util.Map.Entry[String, ManifestTableProvider.Resolved])
        : Boolean = size() > 16
    }

  private def snapshotKey(options: CaseInsensitiveStringMap,
      dir: String): String =
    dir + " " + Option(options.get("versionAsOf")).getOrElse("") +
      " " + Option(options.get("timestampAsOf")).getOrElse("")

  /** `timestampAsOf` accepts epoch millis or an ISO-8601 instant
    * (`2024-01-01T00:00:00Z`). */
  private def parseAsOfMillis(v: String): Long =
    v.trim.toLongOption.getOrElse(
      scala.util.Try(java.time.Instant.parse(v.trim).toEpochMilli)
        .getOrElse(throw new IllegalArgumentException(
          s"timestampAsOf must be epoch millis or an ISO-8601 instant: '$v'")))

  /** The resolved snapshot — file names, carried schema, AND the per-file
    * (length, mtime) inventory all from the SAME manifest body, so a
    * commit racing the resolution cannot pair one version's schema (or
    * file index) with another's file list. */
  private def resolveFiles(options: CaseInsensitiveStringMap,
      dir: String): ManifestTableProvider.Resolved = {
    val spark = SparkSession.active
    val versionAsOf = Option(options.get("versionAsOf")).map(_.toLong)
    val timestampAsOf = Option(options.get("timestampAsOf"))
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "graft-manifest: versionAsOf and timestampAsOf are exclusive")
    // TIMESTAMP AS OF resolves to a version first (commit mtimes are
    // monotone in version); loud when the table is younger than the ask
    val pinnedVersion = versionAsOf.orElse(timestampAsOf.map { t =>
      val millis = parseAsOfMillis(t)
      TableManifest.versionAsOfTime(spark, dir, millis).getOrElse(sys.error(
        s"graft-manifest: no version of $dir existed at $t " +
          "(before the first surviving commit)"))
    })
    pinnedVersion match {
      case Some(v) =>
        val (names, schema, fstat, partSchema, renames, dvs) =
          TableManifest.readAtFull(spark, dir, v).getOrElse(sys.error(
            s"graft-manifest: version $v does not exist in $dir"))
        ManifestTableProvider.Tracked(names, schema, fstat, partSchema,
          renames, dvs)
      case None =>
        TableManifest.readFull(spark, dir) match {
          case Some((_, names, schema, fstat, partSchema, renames, dvs)) =>
            ManifestTableProvider.Tracked(names, schema, fstat, partSchema,
              renames, dvs)
          case None => ManifestTableProvider.Untracked // plain dir scan
        }
    }
  }

  private def delegate(options: CaseInsensitiveStringMap,
      userSchema: Option[StructType]): Table = {
    val dir = Option(options.get("path")).filter(_.nonEmpty).getOrElse(
      sys.error("graft-manifest requires a path " +
        "(`.load(dir)`, `.option(\"path\", dir)`, or a catalog table " +
        "created with USING `graft-manifest` OPTIONS (path ...))"))
    val key = snapshotKey(options, dir)
    val resolved = pinned.synchronized {
      val hit = pinned.get(key)
      if (hit != null) hit
      else {
        val fs = resolveFiles(options, dir)
        pinned.put(key, fs)
        fs
      }
    }
    val (files, manifestSchema, snapshot) = resolved match {
      case ManifestTableProvider.Tracked(names, schema, fstat, partSchema,
          renames, dvs) =>
        (names.map(f => s"$dir/$f"), schema,
          Some((names, fstat, partSchema, renames, dvs)))
      case ManifestTableProvider.Untracked => (Seq(dir), None, None)
    }
    // schema priority: caller's explicit schema, then the manifest-carried
    // one (O(1) — no footer reads at planning), then footer inference
    val schema = userSchema.orElse(manifestSchema)
    // a zero-file version without a carried schema has nothing to infer
    // from; letting the parquet table throw its generic unable-to-infer
    // error would point users at the wrong layer
    if (files.isEmpty && schema.isEmpty)
      sys.error(s"graft-manifest: the resolved version of $dir lists no " +
        "files, so the schema cannot be inferred; pass an explicit schema " +
        "to read an empty table")
    // footer-inference fallback (pre-schema manifests, untracked dirs):
    // readTable MERGES footer schemas; the delegated table must infer the
    // same way or the two read paths diverge: without mergeSchema the
    // parquet table samples ONE path-ordered footer, so a column added by
    // a later commit silently vanishes for SQL/provider consumers
    // whenever the evolved file doesn't happen to sort first
    // (ManifestProviderEvolutionSpec). An explicit user setting wins.
    val effective =
      if (options.containsKey("mergeSchema")) options
      else {
        val m = new util.HashMap[String, String](options.asCaseSensitiveMap())
        m.put("mergeSchema", "true")
        new CaseInsensitiveStringMap(m)
      }
    new ManifestReadTable(SparkSession.active,
      new ParquetTable(s"graft-manifest:$dir", SparkSession.active, effective,
        files, schema, classOf[ParquetFileFormat]), dir, effective,
      snapshot.map { case (names, fstat, partSchema, renames, dvs) =>
        (names, schema, fstat, partSchema, renames, dvs) })
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    delegate(options, None).schema()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    delegate(new CaseInsensitiveStringMap(properties), Option(schema))
}

private[sources] object ManifestTableProvider {
  /** One resolved read: a pinned manifest snapshot, or the untracked
    * plain-directory fallback. */
  sealed trait Resolved
  final case class Tracked(names: Seq[String], schema: Option[StructType],
      fstat: Map[String, (Long, Long)],
      partSchema: Option[StructType],
      renames: Seq[graft.ops.TableManifest.Rename] = Seq.empty,
      dvs: Map[String, (String, Long)] = Map.empty)
    extends Resolved
  case object Untracked extends Resolved
}

private object ManifestReadTable {
  /** Build the planning index for a pinned snapshot. With a complete
    * `filestat` inventory this makes no filesystem call at all; files
    * missing from it (manifests written before the field, commit-time
    * stat failures) are filled by ONE `listStatus` of the table dir —
    * a single RPC, never O(files) stats — and a file truly absent from
    * both fails loudly here at planning instead of mid-scan. */
  def index(spark: SparkSession, dir: String, names: Seq[String],
      fstat: Map[String, (Long, Long)],
      declaredPartSchema: Option[StructType] = None): ManifestFileIndex = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qdir = fs.makeQualified(p)
    lazy val listed: Map[String, org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(qdir).iterator.filter(_.isFile)
        .map(s => s.getPath.getName -> s).toMap
    val statuses = names.map { n =>
      fstat.get(n) match {
        case Some((len, mtime)) =>
          new org.apache.hadoop.fs.FileStatus(len, false, 1, 0L, mtime,
            new Path(qdir, n))
        case None if n.contains("/") =>
          // a hive-partitioned name lives under a subdir the one-listing
          // fallback can't see: stat it directly — O(inventory gaps),
          // which is zero on any manifest written since the field
          scala.util.Try(fs.getFileStatus(new Path(qdir, n))).getOrElse(
            sys.error(s"graft-manifest: listed file $n is missing from " +
              s"$dir (vacuumed under a live reader?)"))
        case None => listed.getOrElse(n, sys.error(
          s"graft-manifest: listed file $n is missing from $dir " +
            "(vacuumed under a live reader?)"))
      }
    }.toArray
    new ManifestFileIndex(spark, qdir, statuses, declaredPartSchema)
  }

  /** Split a snapshot's served schema around the index's inferred
    * partition columns: `full` = data columns ++ partition columns (what
    * the table serves — SQL users must see `date` even though no footer
    * holds it), `data` = the carried/declared schema minus partition
    * names (what the parquet reader asks the FILES for). Handles both a
    * carried schema that lacks the partition columns (init's footer
    * sweep) and one that already includes them (a catalog-stored full
    * schema handed back as the user schema). Flat layouts pass through
    * untouched.
    *
    * `declared` is the manifest-persisted partition schema: consulted
    * ONLY when the snapshot lists no files at all (nothing to infer
    * from), so an emptied partitioned table — full retention delete,
    * erase-all — keeps serving its partition columns instead of
    * silently shrinking its schema. When files exist, the inferred spec
    * always wins: its VALUE types are what the scan actually serves,
    * and pairing declared types with inferred values could mistype
    * rows. */
  def splitSchemas(carried: StructType, index: ManifestFileIndex,
      declared: Option[StructType] = None, snapshotEmpty: Boolean = false)
      : (StructType, StructType) = {
    val pSchema =
      if (index.partitionSchema.nonEmpty) index.partitionSchema
      else if (snapshotEmpty) declared.getOrElse(new StructType())
      else new StructType()
    if (pSchema.isEmpty) (carried, carried)
    else {
      val pNames = pSchema.fieldNames.map(_.toLowerCase).toSet
      val data = StructType(
        carried.fields.filterNot(f => pNames(f.name.toLowerCase)))
      (StructType(data.fields ++ pSchema.fields), data)
    }
  }
}

/** Facade over the delegated parquet table that routes every capability
  * through the manifest protocol. The delegate's own BATCH_WRITE must
  * never leak through: its "paths" are data FILES, so an insert through
  * it would write AROUND the commit protocol (misleading runtime FS error
  * on a tracked dir; unlinearized files on an untracked fallback).
  * Instead [[newWriteBuilder]] writes through [[ManifestWriteBuilder]]:
  * the rows land in a hidden scratch dir via Spark's own parquet DSv2
  * writer, and only the job-level commit moves them in and CAS-commits
  * the next manifest version — so `INSERT INTO` appends (linearized
  * against concurrent committers, schema merged into the carried one)
  * and `INSERT OVERWRITE` snapshot-replaces (publish semantics, streaming
  * high-water mark preserved), both from pure SQL.
  *
  * MICRO_BATCH_READ tails the table's commits as a stream
  * ([[ManifestMicroBatchStream]]): the batch scan path still delegates to
  * the parquet builder's full pushdown surface through
  * [[ManifestScanBuilder]], so batch plans are unchanged. */
private final class ManifestReadTable(spark: SparkSession,
    delegate: ParquetTable,
    dir: String, tableOptions: CaseInsensitiveStringMap,
    tracked: Option[(Seq[String], Option[StructType],
      Map[String, (Long, Long)], Option[StructType],
      Seq[graft.ops.TableManifest.Rename],
      Map[String, (String, Long)])])
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  override def name(): String = delegate.name

  /** The zero-FS-call planning index for a pinned snapshot — built once
    * per resolved table and shared by `schema()` and every scan (the
    * index also owns the inferred partition spec of a hive layout). */
  private lazy val trackedIndex: Option[ManifestFileIndex] =
    tracked.map { case (names, _, fstat, partSchema, _, _) =>
      // the construction-time session, NOT SparkSession.active: schema()
      // (which forces this) is called by relation creation in library
      // paths where no session is active on the calling thread. The
      // DECLARED partition schema types the name-carried values.
      ManifestReadTable.index(spark, dir, names, fstat, partSchema)
    }

  /** The manifest-DECLARED partition schema and whether the snapshot is
    * empty — splitSchemas' empty-table fallback inputs. */
  private def declaredPartSchema: Option[StructType] = tracked.flatMap(_._4)

  /** Column-mapping entries of the pinned snapshot that still have a
    * live carrier in THIS relation's file list — nonEmpty means a plain
    * single scan would serve NULLs for the renamed columns of those
    * files, so the scan must be EXPANDED into per-physical-name group
    * scans first ([[RenameReads.expand]], injected as a post-hoc
    * resolution rule). Exposed for that rule. */
  private[sources] def liveRenames: Seq[graft.ops.TableManifest.Rename] =
    tracked.map { case (names, _, _, _, renames, _) =>
      if (renames.isEmpty) Seq.empty
      else {
        val live = names.toSet
        renames.map(r => r.copy(carriers = r.carriers.filter(live)))
          .filter(_.carriers.nonEmpty)
      }
    }.getOrElse(Seq.empty)

  /** Deletion-vector references of the pinned snapshot whose data file
    * is in THIS relation's file list — nonEmpty means a plain scan would
    * serve DELETED rows, so the relation must be expanded (the dv half
    * of the post-hoc rule) before any batch executes. */
  private[sources] def liveDvs: Map[String, (String, Long)] =
    tracked.map { case (names, _, _, _, _, dvs) =>
      if (dvs.isEmpty) dvs
      else { val live = names.toSet; dvs.filter(kv => live(kv._1)) }
    }.getOrElse(Map.empty)
  private[sources] def tableDir: String = dir
  private[sources] def sessionOf: SparkSession = spark
  private[sources] def tableOpts: CaseInsensitiveStringMap = tableOptions
  private[sources] def trackedSnapshot: Option[(Seq[String],
      Option[StructType], Map[String, (Long, Long)], Option[StructType],
      Seq[graft.ops.TableManifest.Rename],
      Map[String, (String, Long)])] = tracked
  private def snapshotEmpty: Boolean = tracked.exists(_._1.isEmpty)

  /** Serve the resolved schema DIRECTLY when the snapshot carries one:
    * `delegate.schema` would subtract the partition schema, which forces
    * the delegate's `InMemoryFileIndex` — an O(files) path discovery that
    * made even carried-schema planning cost ~8s at 2048 files. On a
    * hive-partitioned layout the name-inferred partition columns are
    * APPENDED (no footer holds them, so the carried data schema alone
    * would hide them from SQL users). The delegate is only consulted on
    * pre-schema manifests and untracked dirs, where footer inference is
    * the documented fallback. */
  override def schema(): StructType =
    (tracked.flatMap(_._2), trackedIndex) match {
      case (Some(carried), Some(idx)) =>
        ManifestReadTable.splitSchemas(carried, idx,
          declaredPartSchema, snapshotEmpty)._1
      case _ => delegate.schema
    }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // a RENAMED table's relation must have been EXPANDED into
    // per-physical-name group scans before any BATCH scan executes (the
    // post-hoc rule in GraftExtensions, or readTable's library path) —
    // a plain batch scan would silently serve NULLs for renamed columns
    // of pre-rename files. The guard fires in ManifestScan.toBatch, NOT
    // here: a MICRO-BATCH stream builds through this same path and is
    // safe regardless (ManifestMicroBatchStream groups each delivery
    // range by carried physical name itself), so failing at scan
    // CREATION would kill legitimate streams — including checkpointed
    // restarts whose ranges are entirely post-rename. Loud beats wrong
    // either way: a session without the extensions errors at batch
    // execution, never serves bad data.
    (tracked, trackedIndex) match {
      case (Some((_, schemaOpt, _, _, _, _)), Some(idx)) =>
        // zero-FS-call planning: the file index is fabricated from the
        // pinned manifest body; only inventory gaps (pre-filestat
        // manifests) cost ONE directory listing. On a hive layout the
        // (full, data) schema split keeps partition columns served but
        // never asked of the footers — and partition pruning rides the
        // index's inferred spec.
        val carried = schemaOpt.getOrElse(delegate.schema)
        val (full, data) = ManifestReadTable.splitSchemas(carried, idx,
          declaredPartSchema, snapshotEmpty)
        new ManifestScanBuilder(
          org.apache.spark.sql.execution.datasources.v2.parquet
            .ParquetScanBuilder(SparkSession.active, idx, full, data, options),
          dir, tableOptions,
          renamedCarriers = liveRenames.nonEmpty,
          dvdFiles = liveDvs.nonEmpty)
      case _ =>
        new ManifestScanBuilder(
          delegate.newScanBuilder(options)
            .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder],
          dir, tableOptions,
          renamedCarriers = liveRenames.nonEmpty,
          dvdFiles = liveDvs.nonEmpty)
    }
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // a time-travel relation is a snapshot of the past; writing "to" it
    // would silently target the head instead — reject at planning
    if (tableOptions.containsKey("versionAsOf") ||
        tableOptions.containsKey("timestampAsOf"))
      sys.error("graft-manifest: cannot write through a time-travel read " +
        "(versionAsOf/timestampAsOf); load the table without it to write")
    new ManifestWriteBuilder(info, dir, tableOptions)
  }

  /** SQL `DELETE FROM` routed onto the metadata-pruned erase primitives:
    * the condition's top-level conjuncts arrive as source filters, and the
    * supported shapes map 1:1 — `col = v` / `col IN (...)` to
    * [[TableManifest.eraseWhereEq]] (bloom+range victim pruning) or
    * `eraseWhereIn` for strings, any conjunction of integral comparisons
    * on ONE column folded to a single inclusive range for
    * [[TableManifest.eraseWhereRange]] (the retention shape:
    * `DELETE WHERE ts_us < cutoff`), and no condition at all to a
    * snapshot-replace truncate that keeps the carried schema (the table
    * stays readable) and the streaming hwm. At 100 TB only the files
    * whose committed stats can hold a target row are rewritten. Anything
    * else — disjunctions, expressions, multi-column mixes — reports
    * `canDeleteWhere = false`, so Spark rejects the statement loudly at
    * planning instead of silently deleting the wrong slice; row-level
    * shapes belong to [[TableManifest.mergeByKey]] and the library
    * surface. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    translateDelete(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit =
    translateDelete(filters).getOrElse(sys.error(
      s"graft-manifest: unsupported DELETE condition " +
        s"[${filters.mkString(", ")}]")).apply()

  private def integral(v: Any): Option[Long] = v match {
    case b: java.lang.Byte => Some(b.toLong)
    case s: java.lang.Short => Some(s.toLong)
    case i: java.lang.Integer => Some(i.toLong)
    case l: java.lang.Long => Some(l)
    case _ => None
  }

  /** A comparison bound in the column's STAT units ([[graft.ops
    * .TableManifest.analyze]]'s canonical units — what `eraseWhereRange`
    * expects): raw value for integrals, unix-MICROS for timestamp
    * literals (Spark hands `java.sql.Timestamp` or `java.time.Instant`
    * depending on the datetime API conf), epoch-DAYS for date literals.
    * This is what makes `DELETE FROM t WHERE ts < TIMESTAMP '2024-01-01'`
    * — the canonical retention statement — a stats-pruned range erase. */
  private def rangeUnits(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    case d: java.sql.Date =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
    case l: java.time.LocalDate => Some(l.toEpochDay)
    case other => integral(other)
  }

  private def translateDelete(filters: Array[Filter])
      : Option[() => Unit] = {
    if (tableOptions.containsKey("versionAsOf") ||
        tableOptions.containsKey("timestampAsOf")) return None
    val spark = SparkSession.active
    // a DELETE on an untracked dir converts it in place first (same
    // posture as INSERT): the erase primitives require a manifest
    def ensureTracked(): Unit =
      if (TableManifest.read(spark, dir).isEmpty) TableManifest.init(spark, dir)
    val effective = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    // a HIVE-PARTITIONED snapshot: a condition constrained ENTIRELY to
    // partition columns is row-exact at FILE granularity — the value is
    // constant per file — so the delete becomes a metadata-only partition
    // DROP (no data touched, the cheapest delete a lakehouse has). A
    // condition on DATA columns falls through to the generic erase
    // shapes below, whose copy-on-write is partition-aware (victims
    // rewritten back under their k=v/ directories); mixed
    // partition+data conjunctions stay rejected at planning.
    val partitionedNames = tracked.map(_._1).filter(_.exists(_.contains("/")))
    partitionedNames match {
      case Some(names) if effective.nonEmpty =>
        import TableManifest.{PartitionPredicate => PP}
        val partCols = names.iterator
          .flatMap(_.split('/').dropRight(1))
          .flatMap(_.split("=", 2) match {
            case Array(k, _) => Some(k.toLowerCase)
            case _ => None
          }).toSet
        def simple(v: Any): Boolean = integral(v).isDefined ||
          v.isInstanceOf[String] || v.isInstanceOf[java.lang.Boolean] ||
          v.isInstanceOf[java.sql.Date] || v.isInstanceOf[java.time.LocalDate]
        // range literals in the SAME units the segment parser emits:
        // raw integrals, or epoch DAYS for date literals (a date-ranged
        // retention drop — `WHERE day < DATE '…'` — is the statement a
        // partitioned event table ages out with)
        def units(v: Any): Option[Long] = v match {
          case d: java.sql.Date =>
            Some(org.apache.spark.sql.catalyst.util.DateTimeUtils
              .fromJavaDate(d).toLong)
          case l: java.time.LocalDate => Some(l.toEpochDay)
          case other => integral(other)
        }
        // a RANGE predicate is only row-exact when EVERY live segment
        // value of that column is comparable in those units (numeric or
        // ISO date) — an unparseable value would silently under-delete,
        // so the whole statement is rejected at planning instead
        def rangeable(c: String): Boolean = names.forall { n =>
          TableManifest.partitionSegmentValue(n, c) match {
            case Some(null) | None => true // NULL never matches: exact
            case Some(v) => TableManifest.partitionSegmentUnits(v).isDefined
          }
        }
        def bounds(c: String, lo: Long, hi: Long): Option[(String, PP)] =
          if (rangeable(c)) Some(c -> PP.Bounds(lo, hi)) else None
        val preds: Array[Option[(String, PP)]] = effective.map {
          case EqualTo(c, v) if partCols(c.toLowerCase) && simple(v) =>
            Some(c -> PP.In(Seq(v)))
          case In(c, vs) if partCols(c.toLowerCase) &&
              vs.nonEmpty && vs.forall(simple) =>
            Some(c -> PP.In(vs.toSeq))
          case org.apache.spark.sql.sources.IsNotNull(c)
              if partCols(c.toLowerCase) => Some(c -> PP.NotNull)
          case LessThan(c, v) if partCols(c.toLowerCase) &&
              units(v).exists(_ > Long.MinValue) =>
            bounds(c, Long.MinValue, units(v).get - 1)
          case LessThanOrEqual(c, v) if partCols(c.toLowerCase) &&
              units(v).isDefined =>
            bounds(c, Long.MinValue, units(v).get)
          case GreaterThan(c, v) if partCols(c.toLowerCase) &&
              units(v).exists(_ < Long.MaxValue) =>
            bounds(c, units(v).get + 1, Long.MaxValue)
          case GreaterThanOrEqual(c, v) if partCols(c.toLowerCase) &&
              units(v).isDefined =>
            bounds(c, units(v).get, Long.MaxValue)
          case _ => None
        }
        // every conjunct partition-shaped → metadata-only drop; otherwise
        // fall THROUGH to the generic erase shapes (partition-aware
        // copy-on-write) instead of rejecting the statement
        if (preds.forall(_.isDefined))
          return Some { () =>
            TableManifest.dropPartitions(spark, dir, preds.flatten.toSeq)
            ()
          }
      case _ => ()
    }
    effective match {
      case Array() => Some { () =>
        ensureTracked()
        // truncate: keep the schema so the empty table stays readable,
        // falling back to the merged scan schema on pre-schema manifests
        val schema = TableManifest.readSchema(spark, dir).orElse(
          scala.util.Try(TableManifest.readTable(spark, dir).schema).toOption)
        TableManifest.replaceFiles(spark, dir, Seq.empty, schema)
        ()
      }
      case Array(EqualTo(c, v)) if integral(v).isDefined => Some { () =>
        ensureTracked(); TableManifest.eraseWhereEq(spark, dir, c, Seq(integral(v).get)); ()
      }
      case Array(EqualTo(c, v: String)) => Some { () =>
        ensureTracked(); TableManifest.eraseWhereIn(spark, dir, c, Seq(v)); ()
      }
      case Array(In(c, vs)) if vs.nonEmpty && vs.forall(integral(_).isDefined) =>
        Some { () =>
          ensureTracked()
          TableManifest.eraseWhereEq(spark, dir, c, vs.map(integral(_).get).toSeq)
          ()
        }
      case Array(In(c, vs)) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        Some { () =>
          ensureTracked()
          TableManifest.eraseWhereIn(spark, dir, c,
            vs.map(_.asInstanceOf[String]).toSeq)
          ()
        }
      case ranges if ranges.nonEmpty => foldRange(ranges).map {
        case (c, lo, hi) => () => {
          ensureTracked()
          if (lo <= hi) TableManifest.eraseWhereRange(spark, dir, c, lo, hi)
          () // an empty fold (contradictory bounds) deletes nothing
        }
      }
      case _ => None
    }
  }

  /** Fold a conjunction of comparisons on ONE column into a single
    * inclusive `[lo, hi]` in stat units; None when any conjunct is out
    * of shape. Exclusive bounds at the Long extremes fold to an empty
    * range (nothing can satisfy `col > Long.MaxValue`). An
    * `IsNotNull(col)` conjunct is a no-op AGAINST a real bound (Spark
    * can emit it alongside the comparison, and erases never touch null
    * keys anyway) — but never accepted alone: with no typed literal the
    * column's units are unknown (a full-range "erase" of a string
    * column would compare strings to longs). */
  private def foldRange(filters: Array[Filter])
      : Option[(String, Long, Long)] = {
    var col: String = null
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var empty = false // an exclusive bound at a Long extreme excludes all
    var bounds = 0 // conjuncts that carried a typed literal
    def on(c: String)(f: => Boolean): Boolean =
      (col == null || col == c) && { col = c; f }
    def narrowLo(l: Long): Boolean = { lo = math.max(lo, l); bounds += 1; true }
    def narrowHi(l: Long): Boolean = { hi = math.min(hi, l); bounds += 1; true }
    val ok = filters.forall {
      case GreaterThan(c, v) => on(c)(rangeUnits(v).exists { l =>
        if (l == Long.MaxValue) { empty = true; bounds += 1; true }
        else narrowLo(l + 1)
      })
      case GreaterThanOrEqual(c, v) => on(c)(rangeUnits(v).exists(narrowLo))
      case LessThan(c, v) => on(c)(rangeUnits(v).exists { l =>
        if (l == Long.MinValue) { empty = true; bounds += 1; true }
        else narrowHi(l - 1)
      })
      case LessThanOrEqual(c, v) => on(c)(rangeUnits(v).exists(narrowHi))
      case EqualTo(c, v) =>
        on(c)(rangeUnits(v).exists(l => narrowLo(l) && narrowHi(l)))
      case org.apache.spark.sql.sources.IsNotNull(c) => on(c)(true)
      case _ => false
    }
    if (empty) { lo = 1L; hi = 0L } // canonical empty range
    if (ok && col != null && bounds > 0) Some((col, lo, hi)) else None
  }
}

/** The SQL write path: rows are written by Spark's OWN parquet DSv2
  * writer into a hidden scratch dir under the table (so every executor-
  * side concern — codegen'd row writers, compression, task-level commit
  * coordination, speculative-attempt dedup — is the battle-tested stock
  * path), and only the JOB-level commit touches the table: move the
  * finalized part files in under unique `sql-<tag>-pN.parquet` names,
  * then CAS-commit the next manifest version. A failed or aborted query
  * never publishes — the scratch dir is dropped and [[graft.ops
  * .TableManifest.vacuum]] reclaims any crash leftovers (`.inflight-*`
  * scratch by age; unlisted `sql-*` files past the in-flight floor).
  *
  * `truncate()` (SQL `INSERT OVERWRITE`, `DataFrameWriter.mode
  * ("overwrite")`) flips the final commit from CAS-append to
  * snapshot-replace — publish semantics: old files stay on disk for
  * in-flight readers until vacuumed, and the streaming high-water mark
  * survives (it records which stream epochs were applied; an overwrite
  * does not un-apply them). */
private final class ManifestWriteBuilder(info: LogicalWriteInfo, dir: String,
    tableOptions: CaseInsensitiveStringMap)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = {
    val spark = SparkSession.active
    val scratch = s"$dir/.inflight-sql-${util.UUID.randomUUID()}"
    val m = new util.HashMap[String, String]()
    m.put("path", scratch)
    val opts = new CaseInsensitiveStringMap(m)
    val delegate = ParquetTable(s"graft-manifest-write:$dir", spark, opts,
      Seq(scratch), Some(info.schema), classOf[ParquetFileFormat])
      .newWriteBuilder(info).build()
    new ManifestWrite(delegate, dir, scratch, overwrite, info,
      tableOptions)
  }
}

private final class ManifestWrite(delegate: Write, dir: String,
    scratch: String, overwrite: Boolean, info: LogicalWriteInfo,
    tableOptions: CaseInsensitiveStringMap)
    extends Write {
  override def description(): String =
    s"graft-manifest:$dir${if (overwrite) " (overwrite)" else ""}"
  override def toBatch: BatchWrite =
    new ManifestBatchWrite(delegate.toBatch, dir, scratch, overwrite,
      info.schema)
  /** `writeStream.format("graft-manifest")` — the native exactly-once
    * append ([[ManifestStreamingWrite]]). Complete/update output modes
    * would snapshot-replace per epoch; that pattern belongs to
    * [[graft.streaming.UpsertSink]]'s foreachBatch surface, so a
    * truncating streaming write is rejected at planning instead of
    * silently appending. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    if (overwrite)
      sys.error("graft-manifest: streaming writes are append-only " +
        "(outputMode=append); per-epoch snapshot replacement belongs to " +
        "UpsertSink/foreachBatch")
    val statsCols = Option(tableOptions.get("statsCols")).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    new ManifestStreamingWrite(dir, info, statsCols)
  }
}

/** The streaming face of the SQL write path — `writeStream
  * .format("graft-manifest").option("checkpointLocation", …).start(dir)`
  * — riding the SAME hwm protocol as [[graft.streaming
  * .ManifestAppendSink]], so the exactly-once append no longer requires
  * foreachBatch:
  *
  *  - the engine wraps this StreamingWrite in a fresh per-epoch
  *    MicroBatchWrite, so [[createStreamingWriterFactory]] runs once per
  *    micro-batch: it opens a fresh hidden scratch dir and delegates the
  *    executor-side row writing to Spark's own parquet DSv2 writer
  *    (codegen'd writers, compression, speculative-attempt dedup — the
  *    stock battle-tested path, exactly like the batch INSERT);
  *  - `commit(epochId, …)` finalizes the scratch through the delegate's
  *    job-level commit, then moves the part files in under
  *    `b<epochId>-…` names and CAS-commits them with `hwm = epochId`
  *    ([[graft.streaming.ManifestAppendSink.commitScratch]]) — one new
  *    manifest version per micro-batch, readers see the whole batch or
  *    none of it;
  *  - exactly-once over restart: a replayed epoch (crash after commit,
  *    before the checkpoint advanced) finds `hwm >= epochId` and drops
  *    its scratch instead of re-appending — the manifest itself is the
  *    commit record, no side marker to crash between;
  *  - a crash BEFORE the commit leaves only `.inflight-*` scratch that
  *    no manifest lists — invisible to readers, reclaimed by
  *    [[graft.ops.TableManifest.vacuum]].
  *
  * `option("statsCols", "ts,k")` commits footer min/max for those
  * columns WITH each batch, so appended files are born prunable (the
  * [[graft.streaming.ManifestAppendSink.applyBatch]] contract).
  *
  * The per-epoch (scratch, delegate) pair is held in a single slot: the
  * engine plans and commits epochs strictly sequentially on one query
  * thread (the same contract [[ManifestMicroBatchStream]]'s `planned`
  * slot relies on). */
private final class ManifestStreamingWrite(dir: String,
    info: LogicalWriteInfo, statsCols: Seq[String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  @volatile private var current: (String, BatchWrite) = _

  /** OFF, like the file source's own `FileBatchWrite`: the delegate's
    * FileCommitProtocol coordinates task commits itself (through
    * `SparkHadoopMapRedUtil` with its fabricated Hadoop attempt ids) —
    * leaving the v2 coordinator on makes it authorize the REAL task
    * attempt and then deny the protocol's differently-numbered second
    * ask, failing every task with CommitDeniedException. */
  override def useCommitCoordinator(): Boolean = false

  override def createStreamingWriterFactory(pinfo: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val scratch = s"$dir/.inflight-stream-${util.UUID.randomUUID()}"
    val m = new util.HashMap[String, String]()
    m.put("path", scratch)
    val delegate = ParquetTable(s"graft-manifest-stream-write:$dir", spark,
      new CaseInsensitiveStringMap(m), Seq(scratch), Some(info.schema),
      classOf[ParquetFileFormat]).newWriteBuilder(info).build().toBatch
    current = (scratch, delegate)
    new ManifestStreamingWriterFactory(delegate.createBatchWriterFactory(pinfo))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val (scratch, delegate) = current
    delegate.commit(messages) // finalize the scratch files (stock protocol)
    graft.streaming.ManifestAppendSink.commitScratch(SparkSession.active,
      dir, new Path(scratch), epochId, Some(info.schema), statsCols)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val snapshot = current
    if (snapshot != null) {
      val (scratch, delegate) = snapshot
      try delegate.abort(messages)
      finally {
        val sp = new Path(scratch)
        val fs = sp.getFileSystem(
          SparkSession.active.sparkContext.hadoopConfiguration)
        fs.delete(sp, true)
      }
    }
  }
}

/** Bridges the delegate parquet BATCH writer factory into the streaming
  * factory shape (top-level and serializable — it ships to executors).
  * The epoch id is already encoded in the driver-chosen scratch dir, so
  * the task writer doesn't need it. */
private final class ManifestStreamingWriterFactory(
    delegate: DataWriterFactory)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] =
    delegate.createWriter(partitionId, taskId)
}

private final class ManifestBatchWrite(delegate: BatchWrite, dir: String,
    scratch: String, overwrite: Boolean, writeSchema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    delegate.createBatchWriterFactory(info)
  override def useCommitCoordinator(): Boolean =
    delegate.useCommitCoordinator()
  override def onDataWriterCommit(message: WriterCommitMessage): Unit =
    delegate.onDataWriterCommit(message)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    delegate.commit(messages) // finalize the scratch files (stock protocol)
    val spark = SparkSession.active
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sp = new Path(scratch)
    val parts =
      if (!fs.exists(sp)) Seq.empty
      else fs.listStatus(sp).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
    // an INSERT into an untracked dir holding pre-existing data (flat OR
    // hive-partitioned) converts it in place FIRST, so the layout read
    // below sees the real table and the first manifest never shadows
    // rows a plain-dir reader was already seeing
    if (!overwrite) TableManifest.convertIfPlainData(spark, dir)
    // HIVE-PARTITIONED target: the scratch holds FLAT part files whose
    // rows carry the partition columns as data (the stock DSv2 file
    // writer cannot write dynamic partitions), so the batch is re-laid
    // out k=v/-nested before the move-in — one extra read+write of the
    // BATCH (the just-written scratch, hot), never of the table. The
    // nested basenames keep the sql-<tag>- shape, so vacuum's in-flight
    // floor protects the rename→commit window exactly like flat inserts.
    val partCols = TableManifest.layoutPartitionCols(spark, dir)
    val (moved, committedSchema) =
      if (partCols.isEmpty) {
        val tag = util.UUID.randomUUID().toString.take(8)
        val flat = parts.zipWithIndex.map { case (s, i) =>
          val name = s"sql-$tag-p$i.parquet"
          require(fs.rename(s.getPath, new Path(p, name)),
            s"graft-manifest: move of ${s.getPath} to $name failed")
          name
        }
        (flat, writeSchema)
      } else {
        partCols.foreach(c =>
          require(writeSchema.fieldNames.exists(_.equalsIgnoreCase(c)),
            s"graft-manifest: INSERT into the partitioned table $dir " +
              s"must carry its partition column `$c`"))
        // carried schema stays DATA columns only — partition values live
        // in the names (the init/publishPartitioned convention)
        val dataSchema = StructType(writeSchema.fields.filterNot(f =>
          partCols.exists(_.equalsIgnoreCase(f.name))))
        // same opt-in small-file policy as the streaming append (see
        // ManifestAppendSink.commitScratch): shuffle the batch by the
        // partition columns so a many-task INSERT lands ≤ one file per
        // live partition value instead of tasks×partitions
        val repartition = spark.conf
          .getOption("spark.graft.manifest.appendRepartition")
          .exists(_.trim.equalsIgnoreCase("true"))
        val nested =
          if (parts.isEmpty) Seq.empty[String]
          else {
            val batch = spark.read.schema(writeSchema)
              .parquet(parts.map(_.getPath.toString): _*)
            val laid =
              if (repartition && parts.size > 1)
                batch.repartition(partCols.map(
                  org.apache.spark.sql.functions.col): _*)
              else batch
            TableManifest.writeAndMoveInPartitioned(laid, "sql", dir,
              partCols)
          }
        (nested, dataSchema)
      }
    // an empty-plan insert can finalize zero files (or only 0-row task
    // files): appending zero files is a no-op (no manifest version
    // burned), while an overwrite always commits — truncating to an
    // empty (possibly zero-file) table that stays readable because the
    // commit carries the write schema
    if (overwrite)
      TableManifest.replaceFiles(spark, dir, moved, Some(committedSchema))
    else if (moved.nonEmpty)
      TableManifest.appendFiles(spark, dir, moved, Some(committedSchema))
    fs.delete(sp, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    try delegate.abort(messages)
    finally {
      val spark = SparkSession.active
      val sp = new Path(scratch)
      val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(sp, true)
    }
  }
}

/** Library-facing entry to the zero-FS-call scan path: a DataFrame over an
  * explicit manifest snapshot slice (names + schema + filestat inventory,
  * all from ONE manifest body), planned through [[ManifestFileIndex]] —
  * what [[graft.ops.TableManifest.readTable]]/`readTableAt`/`addedBetween`
  * use so EVERY library consumer gets the flat planning cost, not just
  * SQL/provider reads. The relation is the same DSv2 table the provider
  * serves, so scan features and plan shapes match the SQL surface
  * exactly. */
private[graft] object ManifestScans {
  def scanSnapshot(spark: SparkSession, dir: String, names: Seq[String],
      schema: StructType,
      fstat: Map[String, (Long, Long)]): org.apache.spark.sql.DataFrame = {
    val m = new util.HashMap[String, String]()
    m.put("path", dir)
    val opts = new CaseInsensitiveStringMap(m)
    val delegate = new ParquetTable(s"graft-manifest:$dir", spark, opts,
      names.map(f => s"$dir/$f"), Some(schema), classOf[ParquetFileFormat])
    // partSchema None: scanSnapshot is only called for non-empty slices
    // (scanListed's empty branch serves the declared columns itself)
    val table = new ManifestReadTable(spark, delegate, dir, opts,
      Some((names, Some(schema), fstat, None, Seq.empty, Map.empty)))
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark,
      org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        .create(table, None, None))
  }
}

/** Expansion of a RENAMED table's relation into per-physical-name group
  * scans — the read-side half of metadata-only `ALTER TABLE … RENAME
  * COLUMN` ([[graft.ops.TableManifest.renameColumn]]). A renamed table's
  * pre-rename data files still physically store the OLD column name
  * (the manifest's column-mapping entries record exactly which), so one
  * parquet scan under the logical schema would serve NULLs for them.
  * Instead the relation becomes a UNION of one relation per
  * physical-name group (carrier sets of successive renames are nested,
  * so there are at most #renames + 1 groups), each group scanning its
  * files under the physical names it actually carries and PROJECTing
  * aliases back to the logical schema. Filters pushed through the
  * aliases arrive at each group scan in that group's OWN physical names
  * — parquet pushdown, manifest stat/bloom pruning, and partition
  * pruning all survive the rename at full strength, per group. The
  * first branch's aliases reuse the original relation's exprIds, so the
  * Union's output binds wherever the original relation's did. Invoked
  * by the post-hoc resolution rule GraftExtensions injects; the
  * un-expanded scan path refuses to run ([[ManifestReadTable
  * .newScanBuilder]]'s guard), so a session without the extensions is
  * loud, never wrong. */
private[graft] object RenameReads {
  import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Union}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  /** Union-of-groups plan for `rel` when its table is a graft manifest
    * table with live carrier files; None when no expansion is needed.
    * A snapshot with live DELETION VECTORS is left to [[DvReads]] (the
    * library scan path it splices in handles renames AND dvs together —
    * group tables minted here carry no dv info, so expanding would
    * silently serve deleted rows). */
  def expandIfRenamed(rel: DataSourceV2Relation): Option[LogicalPlan] =
    rel.table match {
      case t: ManifestReadTable
          if t.liveRenames.nonEmpty && t.liveDvs.isEmpty =>
        t.trackedSnapshot.flatMap {
          case (names, Some(carried), fstat, partSchema, _, _) =>
            val groups = TableManifest.renameGroups(t.liveRenames, names)
            val branches = groups.zipWithIndex.map { case ((gNames, subst), b) =>
              val gSet = gNames.toSet
              val phys = StructType(carried.fields.map(f =>
                subst.get(f.name.toLowerCase)
                  .map(p => f.copy(name = p)).getOrElse(f)))
              val gTable = new ManifestReadTable(t.sessionOf,
                new ParquetTable(s"graft-manifest:${t.tableDir}",
                  t.sessionOf, t.tableOpts,
                  gNames.map(f => s"${t.tableDir}/$f"), Some(phys),
                  classOf[ParquetFileFormat]),
                t.tableDir, t.tableOpts,
                Some((gNames, Some(phys), fstat.filter(kv => gSet(kv._1)),
                  partSchema, Seq.empty, Map.empty)))
              val gRel = DataSourceV2Relation.create(gTable, None, None,
                t.tableOpts)
              require(gRel.output.length == rel.output.length,
                s"rename expansion of ${t.tableDir}: group $b serves " +
                  s"${gRel.output.length} columns, relation has " +
                  s"${rel.output.length}")
              // positional: the physical schema preserves field order and
              // every group shares the snapshot's partition spec
              val aliases: Seq[NamedExpression] =
                rel.output.zip(gRel.output).map { case (orig, child) =>
                  if (b == 0)
                    Alias(child, orig.name)(exprId = orig.exprId,
                      qualifier = orig.qualifier)
                  else Alias(child, orig.name)()
                }
              Project(aliases, gRel): LogicalPlan
            }
            Some(if (branches.length == 1) branches.head
              else Union(branches))
          case _ => None // pre-schema snapshot: the scan guard stays loud
        }
      case _ => None
    }
}

/** Expansion of a relation over a table with live DELETION VECTORS —
  * the read-side half of merge-on-read DML. A plain scan would serve
  * DELETED rows, so the post-hoc rule splices in the LIBRARY scan plan
  * ([[graft.ops.TableManifest.scanListed]]): the clean-file majority
  * keeps its zero-FS-call DSv2 scan, the DV'd minority reads through
  * the V1 parquet path with the codegen'd position filter
  * ([[graft.ops.Dv.applyToScan]]), and renames compose (the library
  * path groups carriers itself — which is why [[RenameReads]] defers to
  * this one whenever dvs are live). Output attributes are re-bound to
  * the original relation's exprIds by NAME, so the spliced plan serves
  * wherever the relation did. Idempotent: the relations the splice
  * mints carry no dv entries. */
private[graft] object DvReads {
  import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  def expandIfDv(rel: DataSourceV2Relation): Option[LogicalPlan] =
    rel.table match {
      case t: ManifestReadTable if t.liveDvs.nonEmpty =>
        t.trackedSnapshot.map {
          case (names, schema, fstat, partSchema, renames, dvs) =>
            val df = TableManifest.scanListed(t.sessionOf, t.tableDir,
              names, schema, fstat, partSchema, renames, dvs)
            val plan = org.apache.spark.sql.graft.DatasetBridge.analyzed(df)
            val byName = plan.output.map(a => a.name.toLowerCase -> a).toMap
            val aliases: Seq[NamedExpression] = rel.output.map { orig =>
              val child = byName.getOrElse(orig.name.toLowerCase,
                sys.error(s"dv expansion of ${t.tableDir}: column " +
                  s"${orig.name} not served by the library scan " +
                  s"(has ${plan.output.map(_.name).mkString(", ")})"))
              Alias(child, orig.name)(exprId = orig.exprId,
                qualifier = orig.qualifier)
            }
            Project(aliases, plan): LogicalPlan
        }
      case _ => None
    }
}
