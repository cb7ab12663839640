package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

/** Round-17 ADVICE pin: the CREATE TABLE clause scanner must honor
  * BACKSLASH escapes inside '…'/"…" string literals (Spark's default
  * string escaping). Before the fix, a literal like `'it\'s partitioned
  * by (x)'` flipped quote parity at the escaped quote, so the
  * delegation probe saw a bare `partitioned by (` and loudly failed a
  * VALID statement (or, mirrored, could miss a real top-level clause
  * hidden after such a literal). */
class GraftDdlRound17Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSessions.withExtensions
  private def withActive[A](f: => A): A =
    graft.TestSessions.withExtensionsActive(_ => f)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gm-ddl17-$tag").toString

  private def freshName(tag: String): String =
    s"gddl17_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("a backslash-escaped quote inside a literal does not flip the probe's quote parity") {
    withActive {
      val dir = tmp("esc")
      val tbl = freshName("esc")
      // the literal holds an ESCAPED quote followed by 'partitioned by ('
      // — with correct escape handling the whole thing stays inside the
      // literal and the statement delegates to stock Spark cleanly
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir') " +
        "AS SELECT id AS k, 'it\\'s partitioned by (oops)' AS s " +
        "FROM range(5)")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 5L)
      assert(TableManifest.read(spark, dir).get._2.forall(!_.contains("/")),
        "the table is flat — the literal never became a layout")
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("a REAL top-level PARTITIONED BY coexists with escaped-quote literals in the AS query") {
    withActive {
      import spark.implicits._
      val dir = tmp("escpart")
      val tbl = freshName("escpart")
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir') PARTITIONED BY (b) " +
        "AS SELECT id AS k, 'it\\'s fine' AS s, id % 2 AS b FROM range(4)")
      val files = TableManifest.read(spark, dir).get._2
      assert(files.forall(_.startsWith("b=")),
        s"the REAL clause made a partitioned layout: $files")
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE b = 1")
        .head().getLong(0) == 2L)
      spark.sql(s"DROP TABLE $tbl")
    }
  }
}
