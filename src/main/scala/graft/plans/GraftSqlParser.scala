package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** SQL entry points for the manifest table format beyond what Spark's own
  * grammar plans natively — the statements a SQL-only operator needs to
  * run a table's whole lifecycle without touching the library:
  *
  * {{{
  *   -- maintenance (quoted path, or the NAME of a catalog table created
  *   -- with USING `graft-manifest`):
  *   VACUUM '/wh/events'                -- reclaim past the 168h default grace
  *   VACUUM events RETAIN 24 HOURS      -- explicit reader grace window
  *   VACUUM events RETAIN 0 HOURS       -- immediate reclamation (opt-in)
  *   OPTIMIZE events                    -- small-file compaction (CAS)
  *   DESCRIBE HISTORY events            -- the commit ledger
  *   RESTORE TABLE events TO VERSION AS OF 3   -- metadata-only rollback
  *   RESTORE TABLE events TO TIMESTAMP AS OF '2024-01-10T00:00:00Z'
  *
  *   -- row-level DML and time travel (parsed by Spark's own grammar,
  *   -- rewritten here onto the manifest primitives):
  *   UPDATE events SET v = v + 1 WHERE k <= 100
  *   MERGE INTO events USING updates ON events.k = updates.k
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *   SELECT * FROM events VERSION AS OF 3
  *   SELECT * FROM events TIMESTAMP AS OF '2024-01-10 00:00:00'
  * }}}
  *
  * Implemented as a DELEGATING parser injected through
  * [[GraftExtensions]]: three anchored maintenance statement shapes are
  * matched first (the table is a quoted PATH or an identifier resolved
  * through the session catalog at run time — no ambiguity with catalog
  * `DESCRIBE t`, whose grammar has no HISTORY token); everything else
  * goes verbatim to Spark's own parser, and the RESULT is post-passed by
  * [[GraftDmlRewrite]] so `UPDATE` / `MERGE INTO` / `VERSION AS OF` /
  * `TIMESTAMP AS OF` on graft-manifest targets plan onto
  * [[graft.ops.TableManifest]] instead of dying in Spark's
  * v1-unsupported paths — while the same statements on non-graft tables
  * keep Spark's stock behavior bit-identical. Each maintenance/DML
  * statement plans as a `LeafRunnableCommand` — driver-side metadata
  * work, exactly like Spark's own DDL — and returns its result as rows
  * (deleted names, compaction stats, the history ledger, the committed
  * version). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // a table reference: quoted path | back-ticked identifier | identifier
  private val Ref = """(?:'([^']+)'|`([^`]+)`|([A-Za-z_][\w.]*))"""
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + Ref +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""").r
  private val Optimize = ("""(?is)\s*OPTIMIZE\s+""" + Ref +
    """(?:\s+PARTITION\s*\(\s*([^)]+?)\s*\))?""" +
    """(?:\s+ZORDER\s+BY\s*\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s*\))?""" +
    """\s*;?\s*""").r
  private val History =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + Ref + """\s*;?\s*""").r
  private val Detail =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + Ref + """\s*;?\s*""").r
  private val RestoreVersion =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ref +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreTimestamp =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ref +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+(?:'([^']+)'|(\d+))\s*;?\s*""").r

  /** A quoted path is a path; a back-ticked identifier is a path when it
    * looks like one (the `` `/wh/events` `` escape hatch), else a name;
    * a bare identifier is a catalog name (resolved at RUN time, so the
    * command sees execution-time catalog state). */
  private def ref(path: String, tick: String, ident: String): GraftTableRef =
    (Option(path), Option(tick), Option(ident)) match {
      case (Some(p), _, _) => GraftTableRef(p, isPath = true)
      case (_, Some(t), _) => GraftTableRef(t, isPath = t.startsWith("/"))
      case (_, _, Some(i)) => GraftTableRef(i, isPath = false)
      case _ => sys.error("unreachable: empty table reference")
    }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(path, tick, ident, hours) =>
      VacuumCommand(ref(path, tick, ident),
        Option(hours).map(_.toLong * 3600L * 1000L)
          .getOrElse(GraftSqlParser.DefaultVacuumGraceMillis))
    case Optimize(path, tick, ident, part, za, zb) =>
      OptimizeCommand(ref(path, tick, ident),
        Option(part).map(GraftSqlParser.normalizePartitionSpec),
        (Option(za), Option(zb)) match {
          case (Some(a), Some(b)) => Some((a, b))
          case _ => None
        })
    case History(path, tick, ident) => HistoryCommand(ref(path, tick, ident))
    case Detail(path, tick, ident) => DetailCommand(ref(path, tick, ident))
    case RestoreVersion(path, tick, ident, v) =>
      RestoreCommand(ref(path, tick, ident), Some(v.toLong), None)
    case RestoreTimestamp(path, tick, ident, ts, millis) =>
      RestoreCommand(ref(path, tick, ident), None,
        Some(Option(ts).getOrElse(millis)))
    case _ =>
      val plan = delegate.parsePlan(sqlText)
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
        case None => plan // no session (tooling): nothing to resolve against
        case Some(spark) =>
          // time-travel first, so a DML statement READING a pinned
          // snapshot (e.g. MERGE USING src VERSION AS OF 3) resolves its
          // source before the statement itself is routed
          GraftDmlRewrite.rewriteTimeTravel(spark, plan) match {
            case u: UpdateTable => GraftDmlRewrite.rewriteUpdate(spark, u)
            case m: MergeIntoTable => GraftDmlRewrite.rewriteMerge(spark, m)
            case ac: org.apache.spark.sql.catalyst.plans.logical.AddColumns =>
              GraftDmlRewrite.rewriteAddColumns(spark, ac)
            case dc: org.apache.spark.sql.catalyst.plans.logical.DropColumns =>
              GraftDmlRewrite.rewriteDropColumns(spark, dc)
            case sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions =>
              GraftDmlRewrite.rewriteShowPartitions(spark, sp)
            case other => other
          }
      }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {
  /** Bare `VACUUM t` keeps files the head no longer lists for 7 days —
    * the lakehouse convention the grammar advertises compatibility with
    * (Delta's default), so an operator running the statement by muscle
    * memory cannot silently destroy time travel or fail a concurrent
    * reader still scanning a pre-compaction snapshot. Immediate
    * reclamation is an explicit opt-in: `RETAIN 0 HOURS` (the library's
    * [[graft.ops.TableManifest.vacuum]] keeps its own grace=0 default —
    * code callers state what they mean; the SQL surface is where a
    * conservative default earns its keep). */
  val DefaultVacuumGraceMillis: Long = 168L * 3600L * 1000L

  /** `PARTITION (k = 1, k2 = 'a b')` → the directory form `k=1/k2=a b`
    * with hive path-escaping on values — so the SQL spelling matches the
    * manifest names however the operator spaces or quotes it, and a
    * non-matching spec fails LOUDLY in compactPartition instead of
    * silently compacting nothing. Values are tokenized QUOTE-AWARE
    * before the comma split (a value like `'a,b'` is one segment, never
    * two bogus ones), and an unbalanced / mixed-quote value is rejected
    * with the offending text named. */
  def normalizePartitionSpec(raw: String): String = {
    // split on top-level commas only (commas inside '…'/"…" stay put)
    val segs = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    raw.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else if (ch == '\'' || ch == '"') { cur += ch; quote = ch }
      else if (ch == ',') { segs += cur.result(); cur.clear() }
      else cur += ch
    }
    if (quote != 0) sys.error(
      s"PARTITION spec has an unterminated quote: ($raw)")
    segs += cur.result()
    segs.map { seg0 =>
      val seg = seg0.trim
      seg.split("=", 2) match {
        case Array(k, v0) =>
          val v = v0.trim
          val value =
            if (v.length >= 2 && (v.head == '\'' || v.head == '"')) {
              if (v.last != v.head) sys.error(
                s"PARTITION spec value has mismatched quotes: $seg")
              v.substring(1, v.length - 1)
            } else v
          k.trim + "=" + org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.escapePathName(value)
        case _ => seg
      }
    }.mkString("/")
  }
}

/** A maintenance statement's table reference: a literal path, or a
  * catalog name resolved to the table's path option at RUN time
  * ([[GraftTables.requireGraftPath]]). */
case class GraftTableRef(raw: String, isPath: Boolean) {
  def path(spark: SparkSession): String =
    if (isPath) raw else GraftTables.requireGraftPath(spark, raw)
}

/** `VACUUM <t> [RETAIN n HOURS]` → [[graft.ops.TableManifest.vacuum]].
  * Returns one row per reclaimed file/scratch entry. RETAIN is the
  * reader/time-travel grace window; omitted it defaults to 168 hours
  * ([[GraftSqlParser.DefaultVacuumGraceMillis]]), and `RETAIN 0 HOURS`
  * is the explicit immediate form. */
case class VacuumCommand(table: GraftTableRef, graceMillis: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.ops.TableManifest.vacuum(spark, table.path(spark), graceMillis)
      .map(Row(_))
}

/** `RESTORE TABLE <t> TO VERSION AS OF n` (or `TO TIMESTAMP AS OF
  * '<instant>'` / epoch millis) → [[graft.ops.TableManifest.restore]]:
  * one metadata commit re-listing the prior version's files — nothing
  * copied, history preserved, hwm carried, vacuumed versions loud.
  * Returns the NEW head version as one row. */
case class RestoreCommand(table: GraftTableRef, version: Option[Long],
    timestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = table.path(spark)
    val v = version.getOrElse {
      val ts = timestamp.get
      val millis = ts.trim.toLongOption.getOrElse(
        scala.util.Try(java.time.Instant.parse(ts.trim).toEpochMilli)
          .getOrElse(sys.error("RESTORE TABLE … TO TIMESTAMP AS OF takes " +
            s"epoch millis or an ISO-8601 instant: '$ts'")))
      graft.ops.TableManifest.versionAsOfTime(spark, path, millis)
        .getOrElse(sys.error(
          s"RESTORE: no version of $path existed at $ts " +
            "(before the first surviving commit)"))
    }
    Seq(Row(graft.ops.TableManifest.restore(spark, path, v)))
  }
}

/** `OPTIMIZE <t>` → [[graft.ops.Compaction.compactTracked]] (CAS
  * manifest swap; on a hive-partitioned table one compactPartition per
  * LEAF — per-leaf isolation, untouched leaves byte-identical);
  * `OPTIMIZE <t> PARTITION (k=v)` →
  * [[graft.ops.Compaction.compactPartition]] for the one addressed leaf.
  * With `ZORDER BY (a, b)` the rewrite is a Morton re-cluster instead
  * of a small-file compaction ([[graft.ops.Compaction.zorderTracked]]:
  * whole flat table, every leaf, or the one addressed leaf — rewritten
  * files carry fresh (a, b) stats, born prunable). One stats row. */
case class OptimizeCommand(table: GraftTableRef,
    partition: Option[String] = None,
    zorder: Option[(String, String)] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)(),
    AttributeReference("bytes_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = table.path(spark)
    val s = (partition, zorder) match {
      case (part, Some((a, b))) =>
        graft.ops.Compaction.zorderTracked(spark, path, part, a, b)
      case (Some(part), None) =>
        graft.ops.Compaction.compactPartition(spark, path, part)
      case (None, None) => graft.ops.Compaction.compactTracked(spark, path)
    }
    Seq(Row(s.filesBefore.toLong, s.filesAfter.toLong, s.bytesRewritten))
  }
}

/** `DESCRIBE DETAIL <t>` — the at-a-glance operational snapshot Delta's
  * statement of the same name serves, from ONE head-manifest read (plus
  * one `_manifest/` listing for the version count): current version,
  * live file count, total bytes (from the committed filestat inventory;
  * NULL when a pre-inventory manifest leaves gaps — honest, never a
  * partial sum), streaming hwm, declared column count (NULL on
  * pre-schema manifests), whether the layout is hive-partitioned, how
  * many manifest versions retention currently keeps, and the partition
  * column chain (NULL for flat layouts). */
case class DetailCommand(table: GraftTableRef) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = true)(),
    AttributeReference("hwm", LongType, nullable = true)(),
    AttributeReference("n_columns", LongType, nullable = true)(),
    AttributeReference("partitioned",
      org.apache.spark.sql.types.BooleanType, nullable = false)(),
    AttributeReference("n_versions", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.ops.TableManifest
    val path = table.path(spark)
    val (v, files, hwm) = TableManifest.readHead(spark, path).getOrElse(
      sys.error(s"DESCRIBE DETAIL: $path is not manifest-tracked"))
    val fstat = TableManifest.readFileStat(spark, path)
    val size: Option[Long] =
      if (files.forall(fstat.contains))
        Some(files.iterator.map(f => fstat(f)._1).sum)
      else None
    val nCols = TableManifest.readSchema(spark, path)
      .map(_.fields.length.toLong)
    val nVersions = TableManifest.versionCount(spark, path)
    // the layout flag comes from the same source the WRITE paths consult
    // (live k=v names, else the DECLARED partition schema) — not from
    // name shape alone, which would mislabel any future non-hive nesting
    // and forget the layout of an emptied partitioned table
    val partCols = TableManifest.layoutPartitionCols(spark, path)
    Seq(Row(path, v, files.size.toLong, size.orNull, hwm.orNull,
      nCols.orNull, partCols.nonEmpty, nVersions,
      if (partCols.isEmpty) null else partCols.mkString(",")))
  }
}

/** `DESCRIBE HISTORY <t>` → [[graft.ops.TableManifest.history]]'s
  * ledger, newest first (the convention operators expect). */
case class HistoryCommand(table: GraftTableRef) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("commit_ts",
      org.apache.spark.sql.types.TimestampType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = true)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)(),
    AttributeReference("hwm", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    graft.ops.TableManifest.history(spark, table.path(spark))
      .orderBy(col("version").desc).collect().toSeq
  }
}
