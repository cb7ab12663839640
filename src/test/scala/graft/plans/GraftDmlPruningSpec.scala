package graft.plans

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.spark.sql.functions.{col, lit, to_date}

/** Round-14 pruning-soundness drills:
  *
  *  - [[GraftDmlRewrite.pruneRanges]] emits a bound ONLY when the
  *    literal's unit kind matches the target column's declared type — a
  *    cross-type predicate (`dateCol = TIMESTAMP '…'`: literal micros vs
  *    day-unit stats) must not prune, or the UPDATE silently skips files
  *    whose rows Spark's cast semantics would match;
  *  - the end-to-end shape: a stats-analyzed DATE column updated through
  *    a TIMESTAMP literal still updates every matching row;
  *  - [[GraftSqlParser.normalizePartitionSpec]] tokenizes quote-aware
  *    (a value containing a comma is one segment) and rejects
  *    mismatched / unterminated quotes loudly. */
class GraftDmlPruningSpec extends SparkSpec {

  import spark.implicits._

  private def rangesOf(sql: String,
      schema: org.apache.spark.sql.types.StructType)
      : Seq[(String, Long, Long)] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val cond = plan.collectFirst {
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        u.condition.get
    }.get
    GraftDmlRewrite.pruneRanges(cond, schema)
  }

  test("pruneRanges: only kind-matched literals prune; cross-type conjuncts are ignored") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("d", DateType),
      StructField("ts", TimestampType), StructField("s", StringType)))
    // matched kinds prune (integral, date in epoch days, ts in micros)
    assert(rangesOf("UPDATE t SET s = 'x' WHERE k <= 100", schema) ==
      Seq(("k", Long.MinValue, 100L)))
    assert(rangesOf("UPDATE t SET s = 'x' WHERE d = DATE '1970-01-03'",
      schema) == Seq(("d", 2L, 2L)))
    // a TIMESTAMP literal against the DATE column: literal folds in
    // MICROS, the column's stats are in DAYS — no bound may be emitted
    assert(rangesOf(
      "UPDATE t SET s = 'x' WHERE d = TIMESTAMP '2024-01-01 00:00:00'",
      schema).isEmpty, "cross-type conjunct must not prune")
    // ...and vice versa (date literal against the timestamp column)
    assert(rangesOf("UPDATE t SET s = 'x' WHERE ts > DATE '2024-01-01'",
      schema).isEmpty)
    // unknown columns and non-unit types never prune
    assert(rangesOf("UPDATE t SET s = 'x' WHERE nosuch = 5", schema).isEmpty)
    assert(rangesOf("UPDATE t SET k = 0 WHERE s = 'a'", schema).isEmpty)
    // a cross-type conjunct beside a matched one: only the match prunes
    assert(rangesOf(
      "UPDATE t SET s = 'x' WHERE k <= 10 AND d = TIMESTAMP '2024-01-01 00:00:00'",
      schema) == Seq(("k", Long.MinValue, 10L)))
  }

  test("UPDATE through a cross-type literal still updates every matching row (no silent skip)") {
    val dir = java.nio.file.Files.createTempDirectory("gm-xtype").toString
    Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-03-05", 3L))
      .toDF("ds", "v")
      .select(to_date(col("ds")).as("d"), col("v"))
      .repartition(3, col("v"))
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.analyze(spark, dir, Seq("d")) // day-unit stats committed
    graft.TestSessions.withExtensionsActive { s =>
      val tbl = s"gxt_${java.util.UUID.randomUUID().toString.take(8)}"
      s.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      // the literal is a TIMESTAMP; Spark's comparison casts the DATE
      // column up, so the 2024-01-01 row MATCHES — with micros-vs-days
      // pruning this statement used to skip every stats-carrying file
      try s.sql(
        s"UPDATE $tbl SET v = 99 WHERE d = TIMESTAMP '2024-01-01 00:00:00'")
      finally s.sql(s"DROP TABLE $tbl")
    }
    val got = TableManifest.readTable(spark, dir)
      .select(col("d").cast("string"), col("v"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("2024-01-01", 99L), ("2024-01-02", 2L),
      ("2024-03-05", 3L)), s"cross-type update applied exactly: $got")
  }

  test("normalizePartitionSpec: quote-aware commas, mismatched quotes loud") {
    import GraftSqlParser.normalizePartitionSpec
    assert(normalizePartitionSpec("k = 1, k2 = 'a b'") == "k=1/k2=a b")
    // a comma INSIDE a quoted value is one segment, hive-escaped
    assert(normalizePartitionSpec("k = 'a,b'") == "k=a,b")
    assert(normalizePartitionSpec("k = 'a,b', j = 2") == "k=a,b/j=2")
    // double quotes work the same
    assert(normalizePartitionSpec("k = \"x,y\"") == "k=x,y")
    // mismatched / unterminated quotes are loud, never silently mangled
    assert(intercept[Exception] { normalizePartitionSpec("k = 'a\"") }
      .getMessage.contains("quote"))
    assert(intercept[Exception] { normalizePartitionSpec("k = 'abc") }
      .getMessage.contains("unterminated"))
  }

  test("prune ranges derive at EXECUTION, so a retype between parse and run never prunes in stale units") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gm-prune-race").toString
    graft.TestSessions.withExtensionsActive { s =>
      // a TIMESTAMP-keyed table with committed micros-unit stats: at
      // parse the condition's TIMESTAMP literal kind-matches and WOULD
      // derive micros prune ranges
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
          (java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 20L))
        .toDF("k", "v").repartitionByRange(2, col("k"))
        .write.mode("overwrite").parquet(dir)
      TableManifest.init(s, dir)
      TableManifest.analyze(s, dir, Seq("k"))
      val plan = s.sessionState.sqlParser.parsePlan(
        s"UPDATE `$dir` SET v = v + 100 " +
          "WHERE k <= TIMESTAMP '2024-01-02 00:00:00'")
      // a full-snapshot replace RETYPES k to DATE before the command
      // runs — the round-15 advice scenario: parse-time derivation baked
      // the literal's MICROS bound into the command, and executing it
      // against the retyped head pruned committed DAY-unit stats in the
      // wrong units. Derivation at run() reads the head the update
      // executes on, sees the cross-kind pair (DATE column, TIMESTAMP
      // literal), and prunes NOTHING — the exact victim scan owns
      // correctness.
      TableManifest.publish(
        Seq((java.sql.Date.valueOf("2024-01-01"), 10L),
            (java.sql.Date.valueOf("2024-01-05"), 20L))
          .toDF("k", "v").repartitionByRange(2, col("k")), dir)
      TableManifest.analyze(s, dir, Seq("k")) // epoch-DAY stats now
      val cmd = plan.asInstanceOf[GraftUpdateCommand]
      cmd.run(s)
      // DATE <= TIMESTAMP coerces through Spark's own comparison: the
      // 2024-01-01 row matches, the 2024-01-05 row does not
      val rows = TableManifest.readTable(s, dir)
        .orderBy("k").select("v").as[Long].collect().toSeq
      assert(rows == Seq(110L, 20L),
        s"retype + run must update exactly the matching row: $rows")
      // and pin the mechanism: against the CURRENT (retyped) schema the
      // cross-kind conjunct derives NO prune range at all
      val declared = org.apache.spark.sql.types.StructType(
        TableManifest.readSchema(s, dir).map(_.fields).getOrElse(Array.empty))
      val derived = GraftDmlRewrite.pruneRanges(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          cmd.condition.get), declared)
      assert(derived.isEmpty,
        s"cross-kind literal must not prune post-retype: $derived")
    }
  }
}
