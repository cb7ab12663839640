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
  private val Ref = GraftSqlParser.Ref
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + Ref +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""").r
  private val Optimize = ("""(?is)\s*OPTIMIZE\s+""" + Ref +
    """(?:\s+PARTITION\s*\(\s*([^)]+?)\s*\))?""" +
    """(?:\s+ZORDER\s+BY\s*\(\s*([^)]*?)\s*\))?""" +
    """\s*;?\s*""").r

  /** A `CREATE TABLE … USING graft-manifest … PARTITIONED BY (…)`
    * statement is claimed HERE (coarse pre-match; the precise clause
    * parse happens in [[GraftSqlParser.parseCreatePartitioned]]): stock
    * Spark would register the partitioning only as catalog metadata the
    * path-addressed provider never sees, silently creating a FLAT table.
    * Plain graft CREATE TABLE (no PARTITIONED BY) keeps delegating. */
  private val CreatePartitionedProbe =
    """(?is)\s*CREATE\s+TABLE\s.*\sUSING\s+`?graft-manifest`?\s.*PARTITIONED\s+BY\s*\(.*""".r
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
    case Optimize(path, tick, ident, part, zcols) =>
      OptimizeCommand(ref(path, tick, ident),
        Option(part).map(GraftSqlParser.normalizePartitionSpec),
        Option(zcols).map(GraftSqlParser.parseZOrderColumns))
    case stmt @ CreatePartitionedProbe() =>
      GraftSqlParser.parseCreatePartitioned(stmt, delegate)
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
            case alc: org.apache.spark.sql.catalyst.plans.logical.AlterColumns =>
              GraftDmlRewrite.rewriteAlterColumns(spark, alc)
            case rc: org.apache.spark.sql.catalyst.plans.logical.RenameColumn =>
              GraftDmlRewrite.rewriteRenameColumn(spark, rc)
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
  /** A table reference: quoted path | back-ticked identifier |
    * identifier (three regex groups). */
  private[plans] val Ref = """(?:'([^']+)'|`([^`]+)`|([A-Za-z_][\w.]*))"""

  private def refOf(path: String, tick: String,
      ident: String): GraftTableRef =
    (Option(path), Option(tick), Option(ident)) match {
      case (Some(p), _, _) => GraftTableRef(p, isPath = true)
      case (_, Some(t), _) => GraftTableRef(t, isPath = t.startsWith("/"))
      case (_, _, Some(i)) => GraftTableRef(i, isPath = false)
      case _ => sys.error("unreachable: empty table reference")
    }

  /** `ZORDER BY (<cols>)` takes two to four plain data columns (the
    * Morton interleave ladders exist per arity — Delta/Iceberg's n-D
    * convention); one/five-plus/odd spellings land HERE with a
    * graft-named message instead of falling through to Spark's delegate
    * parser and dying with a generic parse error. Back-quoted plain
    * identifiers are accepted (unwrapped); anything else is named. */
  private[plans] def parseZOrderColumns(raw: String): Seq[String] = {
    val cols = raw.split(',').map(_.trim).filter(_.nonEmpty)
      .map(c => if (c.length > 2 && c.head == '`' && c.last == '`')
        c.substring(1, c.length - 1) else c)
    cols.find(!_.matches("[A-Za-z_]\\w*")).foreach(bad => sys.error(
      s"OPTIMIZE … ZORDER BY: unsupported column reference '$bad' — " +
        "plain (optionally back-quoted) top-level identifiers only"))
    if (cols.length < 2 || cols.length > 4) sys.error(
      "OPTIMIZE … ZORDER BY takes two to four data columns (the Morton " +
        s"interleave is 2-D to 4-D), got ${cols.length}" +
        (if (cols.isEmpty) "" else s": ${cols.mkString(", ")}"))
    cols.toSeq
  }

  /** Precise clause parse of a pre-matched `CREATE TABLE … USING
    * graft-manifest … PARTITIONED BY` statement (see the probe regex):
    * the clauses accepted are the lakehouse-conventional subset —
    * `[IF NOT EXISTS]`, an optional column list, `USING graft-manifest`,
    * `OPTIONS (path '…')` / `LOCATION '…'` and `PARTITIONED BY (…)` in
    * either order, and an optional `AS <query>` tail (partitioned CTAS).
    * Everything out of shape fails HERE with the supported grammar named
    * — never silently as a flat table. */
  private[plans] def parseCreatePartitioned(stmt: String,
      delegate: ParserInterface): LogicalPlan = {
    def fail(why: String): Nothing = sys.error(
      "graft-manifest CREATE TABLE … PARTITIONED BY supports exactly:\n" +
        "  CREATE TABLE [IF NOT EXISTS] <name|'/path'> [(col type, …)]\n" +
        "    USING `graft-manifest` [OPTIONS (path '<dir>')]\n" +
        "    PARTITIONED BY (c1[, c2 …]) [LOCATION '<dir>'] [AS <query>]\n" +
        s"— $why")
    // the probe regex is a coarse SUBSTRING match ('PARTITIONED BY ('
    // anywhere after USING graft-manifest), so a statement can land here
    // whose only 'PARTITIONED BY' lives inside a string literal of its
    // AS-query. Every shape mismatch BEFORE a top-level PARTITIONED BY
    // clause is confirmed therefore delegates back to the stock parser
    // (which owns the statement it actually is) instead of failing;
    // only a confirmed partitioned statement earns the loud grammar.
    def notMine(): LogicalPlan = delegate.parsePlan(stmt)
    val Head = ("""(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      Ref + """\s*(.*)$""").r
    val (ifNotExists, table, afterRef) = stmt match {
      case Head(ine, p, t, i, rest) =>
        (ine != null, refOf(p, t, i), rest)
      case _ => return notMine()
    }
    // optional column list: balanced-paren scan (types like DECIMAL(10,2)
    // nest parens, so a lazy regex would split the list short)
    def splitParen(s: String): Option[(String, String)] = {
      var depth = 0
      var i = 0
      var quote: Char = 0
      while (i < s.length) {
        val ch = s(i)
        if (quote != 0) {
          // backslash escapes inside '…'/"…' literals (Spark default);
          // backquoted identifiers escape only by doubling
          if (ch == '\\' && quote != '`') i += 1
          else if (ch == quote) quote = 0
        }
        else ch match {
          case '\'' | '"' | '`' => quote = ch
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return Some((s.substring(1, i), s.substring(i + 1)))
          case _ => ()
        }
        i += 1
      }
      None
    }
    val (schemaDdl, afterSchema) =
      if (afterRef.trim.startsWith("(")) {
        val (inner, rest) = splitParen(afterRef.trim)
          .getOrElse(return notMine())
        (Some(inner), rest)
      } else (None, afterRef)
    val Using = """(?is)^\s*USING\s+`?graft-manifest`?\s*(.*)$""".r
    var rest = afterSchema match {
      case Using(r) => r
      case _ => return notMine()
    }
    val OptionsP =
      """(?is)^\s*OPTIONS\s*\(\s*`?path`?\s*=?\s*'([^']+)'\s*\)\s*(.*)$""".r
    // the clause body is taken by BALANCED scan, not a lazy regex: a
    // transform spelling like PARTITIONED BY (days(b)) must reach the
    // identifier validation below (with its precise message), not split
    // at the inner ')' and die as an unrecognized trailing clause
    val Part = """(?is)^\s*PARTITIONED\s+BY\s*(\(.*)$""".r
    val Loc = """(?is)^\s*LOCATION\s+'([^']+)'\s*(.*)$""".r
    var path: Option[String] = None
    var partColsRaw: Option[String] = None
    var progressing = true
    while (progressing) rest match {
      case OptionsP(p, r) =>
        if (path.nonEmpty) fail("duplicate table directory clause")
        path = Some(p); rest = r
      case Loc(p, r) =>
        if (path.nonEmpty) fail("duplicate table directory clause")
        path = Some(p); rest = r
      case Part(tail) =>
        if (partColsRaw.nonEmpty) fail("duplicate PARTITIONED BY clause")
        // a confirmed PARTITIONED BY clause with unbalanced parens IS
        // this grammar's statement — loud, not delegated
        val (cols, r) = splitParen(tail).getOrElse(
          fail("unbalanced parentheses in PARTITIONED BY"))
        partColsRaw = Some(cols.trim); rest = r
      case _ => progressing = false
    }
    // no top-level PARTITIONED BY clause reached. If the UNCONSUMED text
    // still holds one outside quotes (an out-of-shape clause is hiding
    // it), stay loud — delegating would let stock Spark register the
    // partitioning as catalog-only metadata and silently create a FLAT
    // table. Otherwise the probed text was inside a string literal and
    // the stock parser owns the statement.
    if (partColsRaw.isEmpty) {
      def unquotedPartitionedBy(s: String): Boolean = {
        val lower = s.toLowerCase
        var i = 0
        var quote: Char = 0
        while (i < lower.length) {
          val ch = lower(i)
          if (quote != 0) {
            // inside a '…'/"…" literal a backslash escapes the next
            // char (Spark's default string escaping — `'it\'s'` must
            // not flip quote parity); backquoted identifiers have no
            // backslash escaping, only doubling
            if (ch == '\\' && quote != '`') i += 1
            else if (ch == quote) quote = 0
          }
          else if (ch == '\'' || ch == '"' || ch == '`') quote = ch
          else if (ch == 'p' && lower.startsWith("partitioned", i)) {
            val after = lower.substring(i + 11)
            if (after.matches("(?s)\\s+by\\s*\\(.*")) return true
          }
          i += 1
        }
        false
      }
      if (unquotedPartitionedBy(rest))
        fail(s"unrecognized clause before PARTITIONED BY: " +
          s"'${rest.trim.take(60)}'")
      return notMine()
    }
    val As = """(?is)^\s*AS\s+(.+?)\s*;?\s*$""".r
    val select = rest match {
      case As(q) => Some(q)
      case r if r.trim.stripSuffix(";").trim.isEmpty => None
      case other => fail(s"unrecognized clause: '${other.trim.take(60)}'")
    }
    val partCols = partColsRaw.get
      .split(',').map(_.trim).filter(_.nonEmpty)
      .map(c => if (c.length > 2 && c.head == '`' && c.last == '`')
        c.substring(1, c.length - 1) else c).toSeq
    partCols.find(!_.matches("[A-Za-z_]\\w*")).foreach(bad =>
      fail(s"unsupported partition column reference '$bad' — plain " +
        "top-level identifiers only (no expressions/transforms; bucket " +
        "the data yourself and partition by the bucket column)"))
    if (partCols.map(_.toLowerCase).distinct.size != partCols.size)
      fail(s"duplicate partition column in (${partCols.mkString(", ")})")
    if (schemaDdl.nonEmpty && select.nonEmpty)
      fail("a column list and AS <query> are mutually exclusive " +
        "(CTAS derives the schema from the query)")
    if (schemaDdl.isEmpty && select.isEmpty)
      fail("declare a column list or provide AS <query>")
    val schema = schemaDdl.map { ddl =>
      scala.util.Try(delegate.parseTableSchema(ddl)).getOrElse(
        fail(s"could not parse the column list: ($ddl)"))
    }
    GraftCreateTableCommand(table, ifNotExists, schema, partCols, path,
      select)
  }

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
    zorder: Option[Seq[String]] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)(),
    AttributeReference("bytes_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = table.path(spark)
    val s = (partition, zorder) match {
      case (part, Some(cols)) =>
        graft.ops.Compaction.zorderTracked(spark, path, part, cols)
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
  * many manifest versions retention currently keeps, the partition
  * column chain (NULL for flat layouts), and the deletion-vector
  * health triple an operator sizes maintenance by: how many live files
  * carry a dv, the total deleted-row count across them, and the WORST
  * deleted fraction (dv cardinality over the file's footer row count —
  * one footer read per dv'd file, paid only when dvs exist and fanned
  * out as a Spark job past `spark.graft.detail.distributeThreshold`
  * (default 32) dv'd files; NULL on a dv-free table). A dv_max_density
  * creeping toward
  * `spark.graft.dv.materializeThreshold` (default 0.5) means the next
  * dv write on that file materializes it locally; a high n_dv_files
  * with low density is the signal to schedule an OPTIMIZE. */
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
    AttributeReference("partition_columns", StringType, nullable = true)(),
    AttributeReference("n_dv_files", LongType, nullable = false)(),
    AttributeReference("dv_deleted_rows", LongType, nullable = false)(),
    AttributeReference("dv_max_density",
      org.apache.spark.sql.types.DoubleType, nullable = true)())
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
    val dvs = TableManifest.readDvs(spark, path)
    // One footer read per dv'd file — sequentially on the driver that is
    // fine for a handful of dvs but turns DESCRIBE into a many-minute FS
    // crawl on a table where thousands of files carry one (the exact
    // state n_dv_files exists to surface). Past a small threshold the
    // reads fan out as a Spark job: each executor opens its share of
    // footers, only the per-file density doubles come back.
    val dvMaxDensity: Option[Double] =
      if (dvs.isEmpty) None
      else {
        val work = dvs.toSeq.map { case (f, (_, card)) => (f, card) }
        val tableRoot = path
        def density(f: String, card: Long,
                    conf: org.apache.hadoop.conf.Configuration): Double = {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(tableRoot, f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val rows = try r.getRecordCount finally r.close()
          if (rows <= 0L) 1.0 else card.toDouble / rows
        }
        val threshold = spark.conf
          .getOption("spark.graft.detail.distributeThreshold")
          .flatMap(_.toIntOption).getOrElse(32)
        if (work.size < threshold) {
          val conf = spark.sessionState.newHadoopConf()
          Some(work.map { case (f, card) => density(f, card, conf) }.max)
        } else {
          val bc = graft.ops.Dv.confBroadcast(spark)
          val slices = math.min(work.size,
            spark.sparkContext.defaultParallelism).max(1)
          Some(spark.sparkContext.parallelize(work, slices)
            .map { case (f, card) => density(f, card, bc.value.value) }
            .max())
        }
      }
    Seq(Row(path, v, files.size.toLong, size.orNull, hwm.orNull,
      nCols.orNull, partCols.nonEmpty, nVersions,
      if (partCols.isEmpty) null else partCols.mkString(","),
      dvs.size.toLong, dvs.values.map(_._2).sum,
      dvMaxDensity.orNull))
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

/** `CREATE TABLE … USING graft-manifest PARTITIONED BY (…)` — the one
  * table-lifecycle step that previously existed only as the library
  * call `TableManifest.publishPartitioned`. Two shapes:
  *
  *  - with a COLUMN LIST: commit an EMPTY v1 that DECLARES both the data
  *    schema and the partition schema (`partschemab64`), so the very
  *    first `INSERT INTO` lays its batch out `k=v/`-nested and every
  *    partitioned-read feature applies from version 1;
  *  - with `AS <query>` (partitioned CTAS): route the query's result
  *    through [[graft.ops.TableManifest.publishPartitioned]].
  *
  * A NAME-addressed table also registers the catalog entry (provider
  * `graft-manifest`, the table dir as path + location, the FULL served
  * schema — data columns then partition columns, the provider's serving
  * order). Creating over an already-tracked dir verifies the layouts
  * AGREE (same partition chain) instead of silently re-declaring;
  * `IF NOT EXISTS` downgrades every already-exists case to a no-op.
  * Partition column types are restricted to what hive-style directory
  * names round-trip exactly (string / integral / date / boolean).
  * Returns the committed (or current) version. */
case class GraftCreateTableCommand(table: GraftTableRef,
    ifNotExists: Boolean,
    declaredSchema: Option[StructType], partCols: Seq[String],
    location: Option[String], select: Option[String])
    extends LeafRunnableCommand {
  import graft.ops.TableManifest
  import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType, IntegerType, ShortType, StructField}

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  private def partitionable(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         DateType | BooleanType => true
    case _ => false
  }

  /** Whether the target dir holds ANY non-hidden data (recursing into
    * `k=v` layouts) — the CREATE-semantics guard for path-addressed
    * targets, which have no catalog entry to consult. */
  private def dirHoldsData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def any(at: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(at) && fs.listStatus(at).exists { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") &&
          (s.isFile || any(s.getPath))
      }
    any(p)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    def fail(why: String): Nothing =
      sys.error(s"graft-manifest CREATE TABLE … PARTITIONED BY: $why")
    val path = location.getOrElse {
      if (table.isPath) table.raw
      else fail("a table directory is required — OPTIONS (path '…'), " +
        "LOCATION '…', or a '/path' table reference")
    }
    val catalog = spark.sessionState.catalog
    val identOpt =
      if (table.isPath) None
      else Some(spark.sessionState.sqlParser.parseTableIdentifier(table.raw))
    identOpt.filter(catalog.tableExists) match {
      case Some(_) if ifNotExists =>
        return Seq(Row(TableManifest.read(spark, path)
          .map(_._1).getOrElse(0L)))
      case Some(id) => fail(s"table $id already exists")
      case None => ()
    }

    val (version, dataFields, partFields) = select match {
      case Some(q) =>
        // partitioned CTAS: CREATE semantics first — publishPartitioned
        // is a last-writer-wins snapshot REPLACE, so a target dir that
        // already holds data (tracked or plain) must be loud (or a no-op
        // under IF NOT EXISTS), never silently overwritten; path-only
        // targets have no catalog entry, so the check must be on the DIR
        if (TableManifest.read(spark, path).nonEmpty ||
            dirHoldsData(spark, path)) {
          if (ifNotExists)
            return Seq(Row(TableManifest.read(spark, path)
              .map(_._1).getOrElse(0L)))
          fail(s"$path already holds data — CREATE TABLE … AS never " +
            "overwrites (INSERT OVERWRITE or publishPartitioned are the " +
            "sanctioned replaces); use IF NOT EXISTS for an idempotent " +
            "create")
        }
        val df = spark.sql(q)
        partCols.foreach { c =>
          val f = df.schema.fields.find(_.name.equalsIgnoreCase(c))
            .getOrElse(fail(s"partition column `$c` is not in the " +
              s"query's output (${df.columns.sorted.mkString(", ")})"))
          if (!partitionable(f.dataType)) fail(
            s"partition column `$c` has type ${f.dataType.simpleString}; " +
              "hive-style directory names round-trip only string / " +
              "integral / date / boolean values exactly")
        }
        val v = TableManifest.publishPartitioned(df, path, partCols)
        val parts = partCols.map(c =>
          df.schema.fields.find(_.name.equalsIgnoreCase(c)).get
            .copy(nullable = true))
        val data = df.schema.fields.filterNot(f =>
          partCols.exists(_.equalsIgnoreCase(f.name))).toSeq
        (v, data, parts)
      case None =>
        val s = declaredSchema.get // the parser guaranteed exactly one of the two
        val parts: Seq[StructField] = partCols.map { c =>
          val f = s.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
            fail(s"partition column `$c` is not in the column list " +
              s"(${s.fieldNames.sorted.mkString(", ")})"))
          if (!partitionable(f.dataType)) fail(
            s"partition column `$c` has type ${f.dataType.simpleString}; " +
              "hive-style directory names round-trip only string / " +
              "integral / date / boolean values exactly")
          f.copy(nullable = true)
        }
        val data = s.fields.filterNot(f =>
          partCols.exists(_.equalsIgnoreCase(f.name))).toSeq
        if (data.isEmpty) fail("every column is a partition column — at " +
          "least one data column must remain")
        val v = TableManifest.read(spark, path) match {
          case Some((head, _)) =>
            // already tracked (CREATE over an existing table dir): the
            // declared chain must AGREE with the live layout — silently
            // re-declaring would make writers lay out batches the scan
            // cannot serve — and the declared COLUMN TYPES must agree
            // with the manifest-served schema, or the catalog entry
            // registered below would permanently disagree with what the
            // scan serves
            val live = TableManifest.layoutPartitionCols(spark, path)
            if (live != partCols.map(_.toLowerCase)) {
              // IF NOT EXISTS over a DISAGREEING live table is a no-op
              // that must ALSO skip the catalog registration below —
              // registering the mismatching declaration would create a
              // catalog entry permanently contradicting what the table
              // actually serves
              if (ifNotExists) return Seq(Row(head))
              else fail(s"$path is already a tracked table whose " +
                s"partition layout (${if (live.isEmpty) "flat"
                  else live.mkString("/")}) does not match PARTITIONED " +
                s"BY (${partCols.mkString(", ")})")
            } else {
              val servedTypes = TableManifest.readSchema(spark, path)
                .map(_.fields.map(f => f.name.toLowerCase -> f.dataType)
                  .toMap).getOrElse(Map.empty)
              val drift = data.flatMap(f =>
                servedTypes.get(f.name.toLowerCase)
                  .filter(_ != f.dataType)
                  .map(dt => s"`${f.name}` declared " +
                    s"${f.dataType.simpleString} but the table serves " +
                    dt.simpleString))
              if (drift.nonEmpty) {
                if (!ifNotExists) fail(s"$path is already a tracked " +
                  s"table and the column list disagrees with its " +
                  s"schema: ${drift.mkString("; ")}")
                // same skip: the declaration's TYPES disagree with the
                // served schema — no-op without a catalog entry
                return Seq(Row(head))
              }
              head
            }
          case None =>
            // an UNTRACKED dir holding plain data converts in place first
            // (the INSERT posture), then the same layout agreement check
            TableManifest.convertIfPlainData(spark, path)
            TableManifest.read(spark, path) match {
              case Some((head, _)) =>
                val live = TableManifest.layoutPartitionCols(spark, path)
                if (live != partCols.map(_.toLowerCase))
                  fail(s"$path holds pre-existing data whose layout (${
                    if (live.isEmpty) "flat" else live.mkString("/")
                  }) does not match PARTITIONED BY (${
                    partCols.mkString(", ")})")
                head
              case None =>
                // fresh dir: EMPTY v1 declaring both schemas — the commit
                // that makes the first INSERT partition-aware
                TableManifest.commit(spark, path, Seq.empty,
                  schema = Some(StructType(data)), replaceSchema = true,
                  partSchema = Some(StructType(parts)))
            }
        }
        (v, data, parts)
    }

    identOpt.foreach { ident =>
      val storage = org.apache.spark.sql.catalyst.catalog
        .CatalogStorageFormat.empty.copy(
          locationUri = Some(new org.apache.hadoop.fs.Path(path).toUri),
          properties = Map("path" -> path))
      val entry = org.apache.spark.sql.catalyst.catalog.CatalogTable(
        identifier = ident,
        tableType =
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
        storage = storage,
        schema = StructType(dataFields ++ partFields),
        provider = Some("graft-manifest"))
      catalog.createTable(entry, ignoreIfExists = ifNotExists)
    }
    Seq(Row(version))
  }
}
