package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

import graft.ops.TableManifest

/** TABLE-VALUED functions over the manifest protocol — the CDC and
  * audit surfaces as relations SQL can compose over (join against,
  * filter, aggregate, INSERT elsewhere), registered through
  * `SparkSessionExtensions.injectTableFunction`:
  *
  * {{{
  *   SELECT * FROM graft_table_changes('events', 1, 3)  -- rows ADDED in (v1, v3]
  *   SELECT * FROM graft_row_diff('events', 2, 5)       -- exact multiset delta
  *   SELECT * FROM graft_history('/wh/events')          -- the commit ledger
  * }}}
  *
  * The table reference is a string literal: a quoted '/path', or the
  * NAME of a catalog table created `USING graft-manifest` (resolved
  * through the session catalog — the [[GraftTables]] convention every
  * maintenance statement uses). Version arguments must be integer
  * LITERALS: a TVF resolves to a concrete relation at analysis, so a
  * non-literal version has nothing to resolve against — rejected with
  * the expected shape named. Each builder returns the library
  * relation's own logical plan, so the scan inherits the zero-FS-call
  * planning and schema-as-of-version semantics of the underlying calls
  * ([[TableManifest.addedBetween]] / [[TableManifest.diffRows]] /
  * [[TableManifest.history]]). */
private[plans] object GraftTableFunctions {

  private def stringArg(fn: String, pos: Int, e: Expression): String =
    e match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        l.value.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a string literal " +
          "(a '/path' or a graft-manifest catalog table name)")
    }

  private def longArg(fn: String, pos: Int, e: Expression): Long =
    e match {
      case l: Literal if l.value != null => l.dataType match {
        case ByteType => l.value.asInstanceOf[Byte].toLong
        case ShortType => l.value.asInstanceOf[Short].toLong
        case IntegerType => l.value.asInstanceOf[Int].toLong
        case LongType => l.value.asInstanceOf[Long]
        case _ => throw new IllegalArgumentException(
          s"$fn: argument ${pos + 1} must be an integer version literal")
      }
      case _ => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer version literal")
    }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")

  private def session(fn: String): SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        s"$fn: no active SparkSession to resolve the table against"))

  private def pathOf(spark: SparkSession, ref: String): String =
    if (ref.startsWith("/")) ref
    else GraftTables.requireGraftPath(spark, ref)

  /** (name, usage, builder) triples [[GraftExtensions]] registers. */
  val all: Seq[(String, String,
      Seq[Expression] => LogicalPlan)] = Seq(
    ("graft_table_changes",
      "graft_table_changes(table, fromVersion, toVersion) - rows ADDED " +
        "between fromVersion (exclusive) and toVersion (inclusive); " +
        "file-granularity CDC, exact for append-only writers",
      (args: Seq[Expression]) => {
        val fn = "graft_table_changes"
        arity(fn, 3, args)
        val spark = session(fn)
        val dir = pathOf(spark, stringArg(fn, 0, args.head))
        TableManifest.addedBetween(spark, dir,
          longArg(fn, 1, args(1)), longArg(fn, 2, args(2)))
          .queryExecution.logical
      }),
    ("graft_row_diff",
      "graft_row_diff(table, vOld, vNew) - exact per-row multiset delta " +
        "between two committed versions (positive delta = copies added)",
      (args: Seq[Expression]) => {
        val fn = "graft_row_diff"
        arity(fn, 3, args)
        val spark = session(fn)
        val dir = pathOf(spark, stringArg(fn, 0, args.head))
        TableManifest.diffRows(spark, dir,
          longArg(fn, 1, args(1)), longArg(fn, 2, args(2)))
          .queryExecution.logical
      }),
    ("graft_history",
      "graft_history(table) - the commit ledger as a relation " +
        "(version, commit_ts, n_files, bytes, n_added, n_removed, hwm)",
      (args: Seq[Expression]) => {
        val fn = "graft_history"
        arity(fn, 1, args)
        val spark = session(fn)
        val dir = pathOf(spark, stringArg(fn, 0, args.head))
        TableManifest.history(spark, dir).queryExecution.logical
      }))
}
