package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** SQL entry points for table MAINTENANCE — the statements a SQL-only
  * operator needs to run a manifest table's lifecycle without touching
  * the library, grammar-compatible with the lakehouse convention:
  *
  * {{{
  *   VACUUM '/wh/events'                      -- reclaim past the 168h default grace
  *   VACUUM '/wh/events' RETAIN 24 HOURS      -- explicit reader grace window
  *   VACUUM '/wh/events' RETAIN 0 HOURS       -- immediate reclamation (opt-in)
  *   OPTIMIZE '/wh/events'                    -- small-file compaction (CAS)
  *   DESCRIBE HISTORY '/wh/events'            -- the commit ledger
  * }}}
  *
  * Implemented as a DELEGATING parser injected through
  * [[GraftExtensions]]: three anchored statement shapes (the table is a
  * quoted PATH — no ambiguity with catalog `DESCRIBE t`, which is
  * unquoted and falls through) are matched first, everything else goes
  * verbatim to Spark's own parser, so the entire standard SQL surface is
  * untouched. Each statement plans as a `LeafRunnableCommand` — driver-
  * side metadata work, exactly like Spark's own DDL — and returns its
  * result as rows (deleted names, compaction stats, the history
  * ledger). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Vacuum =
    """(?is)\s*VACUUM\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r
  private val Optimize = """(?is)\s*OPTIMIZE\s+'([^']+)'\s*;?\s*""".r
  private val History = """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(path, hours) =>
      VacuumCommand(path,
        Option(hours).map(_.toLong * 3600L * 1000L)
          .getOrElse(GraftSqlParser.DefaultVacuumGraceMillis))
    case Optimize(path) => OptimizeCommand(path)
    case History(path) => HistoryCommand(path)
    case _ => delegate.parsePlan(sqlText)
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
  /** Bare `VACUUM '<path>'` keeps files the head no longer lists for 7
    * days — the lakehouse convention the grammar advertises compatibility
    * with (Delta's default), so an operator running the statement by
    * muscle memory cannot silently destroy time travel or fail a
    * concurrent reader still scanning a pre-compaction snapshot.
    * Immediate reclamation is an explicit opt-in: `RETAIN 0 HOURS`
    * (the library's [[graft.ops.TableManifest.vacuum]] keeps its own
    * grace=0 default — code callers state what they mean; the SQL
    * surface is where a conservative default earns its keep). */
  val DefaultVacuumGraceMillis: Long = 168L * 3600L * 1000L
}

/** `VACUUM '<path>' [RETAIN n HOURS]` → [[graft.ops.TableManifest
  * .vacuum]]. Returns one row per reclaimed file/scratch entry. RETAIN
  * is the reader/time-travel grace window; omitted it defaults to 168
  * hours ([[GraftSqlParser.DefaultVacuumGraceMillis]]), and `RETAIN 0
  * HOURS` is the explicit immediate form. */
case class VacuumCommand(path: String, graceMillis: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.ops.TableManifest.vacuum(spark, path, graceMillis).map(Row(_))
}

/** `OPTIMIZE '<path>'` → [[graft.ops.Compaction.compactInPlace]] (CAS
  * manifest swap on tracked dirs). One stats row. */
case class OptimizeCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)(),
    AttributeReference("bytes_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val s = graft.ops.Compaction.compactInPlace(spark, path)
    Seq(Row(s.filesBefore.toLong, s.filesAfter.toLong, s.bytesRewritten))
  }
}

/** `DESCRIBE HISTORY '<path>'` → [[graft.ops.TableManifest.history]]'s
  * ledger, newest first (the convention operators expect). */
case class HistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = true)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)(),
    AttributeReference("hwm", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    graft.ops.TableManifest.history(spark, path)
      .orderBy(col("version").desc).collect().toSeq
  }
}
