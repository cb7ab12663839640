package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  test("upsert: updates replace on key, inserts add, untouched rows survive") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val updates = Seq((2L, "b2", 99.0), (9L, "new", 1.0))
      .toDF("id", "name", "bal")
    val out = Merge.upsert(target, updates, Seq("id")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out == Map(
      1L -> ("a", 10.0), 2L -> ("b2", 99.0), 3L -> ("c", 30.0),
      9L -> ("new", 1.0)))
  }

  test("upsert result has exactly one row per key even with a duplicate-free update set") {
    import spark.implicits._
    val target = (0L until 100L).map(i => (i, i.toString)).toDF("id", "v")
    val updates = (0L until 100L by 5).map(i => (i, s"u$i")).toDF("id", "v")
    val merged = Merge.upsert(target, updates, Seq("id"))
    assert(merged.count() == 100)
    assert(merged.groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("null keys upsert and maintain like any other key (null-safe joins)") {
    import spark.implicits._
    // upsert: a null-key update must REPLACE the null-key target row —
    // a plain equi-anti-join never matches null and keeps both
    val target = Seq((Some(1L), "a"), (None, "n0")).toDF("id", "v")
    val updates = Seq((Option.empty[Long], "n1")).toDF("id", "v")
    val out = Merge.upsert(target, updates, Seq("id")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
      .toMap
    assert(out == Map(Some(1L) -> "a", None -> "n1"), s"upsert: $out")

    // maintainAgg: a null-key delta must merge INTO the null-key state,
    // not fork a second null-key row
    val state = Seq((Option.empty[Long], 2L, 10L)).toDF("k", "cnt", "sum_v")
    val changes = Seq((Option.empty[Long], 1, 5L)).toDF("k", "op", "v")
    val m = Merge.maintainAgg(state, changes, Seq("k"), Seq("v")).collect()
    assert(m.length == 1, s"one row for the null key: ${m.toSeq}")
    assert(m(0).getLong(1) == 3L && m(0).getLong(2) == 15L, s"${m.toSeq}")
  }

  test("scd2 breaks (key, ts) ties deterministically by payload hash") {
    import spark.implicits._
    val changes = Seq(("a", 100L, "p1"), ("a", 100L, "p2"), ("a", 200L, "p3"))
      .toDF("k", "ts", "payload")
    def winnerAt(df: org.apache.spark.sql.DataFrame, at: Long) =
      Merge.asOfSnapshot(Merge.scd2(df, Seq("k"), "ts"), lit(at))
        .select("payload").as[String].collect().toSeq
    val w1 = winnerAt(changes, 150L)
    assert(w1.size == 1, s"one effective version at 150: $w1")
    // identical input in any row order / partitioning picks the SAME winner
    (1 to 3).foreach { p =>
      assert(winnerAt(changes.orderBy(desc("payload")).repartition(p), 150L)
        == w1, s"tie winner changed under repartition($p)")
    }
  }

  test("scd2 tie hash separates null-placement payload twins") {
    import spark.implicits._
    // (null,"x") vs ("x",null): concat_ws SKIPS nulls, so without the
    // null sentinel both would hash identical bytes and the tie order
    // would be unspecified — the winner must be stable under any layout
    val changes = Seq(
      ("a", 100L, Option.empty[String], Option("x")),
      ("a", 100L, Option("x"), Option.empty[String]),
      ("a", 200L, Option("z"), Option("z")))
      .toDF("k", "ts", "p1", "p2")
    def winnerAt(df: org.apache.spark.sql.DataFrame, at: Long) =
      Merge.asOfSnapshot(Merge.scd2(df, Seq("k"), "ts"), lit(at))
        .select("p1", "p2").collect().toSeq
    val w1 = winnerAt(changes, 150L)
    assert(w1.size == 1, s"one effective version at 150: $w1")
    (1 to 3).foreach { p =>
      assert(winnerAt(changes.orderBy(desc("p1")).repartition(p), 150L) == w1,
        s"null-twin tie winner changed under repartition($p)")
    }
  }

  test("dedupLatest: the whole max-version row survives as a unit") {
    import spark.implicits._
    val upd = Seq(
      (1L, 1L, "old", 10.0),
      (1L, 3L, "new", 30.0),
      (1L, 2L, "mid", 20.0),
      (2L, 7L, "only", 70.0))
      .toDF("id", "ver", "name", "bal")
    val out = Merge.dedupLatest(upd, Seq("id"), "ver").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3))))
      .toMap
    // name and bal come from the SAME row as the max version — no
    // per-column mixing
    assert(out == Map(1L -> (3L, "new", 30.0), 2L -> (7L, "only", 70.0)))
  }

  test("scd2 intervals partition each key's timeline; snapshot picks the effective version") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // three versions
      (2L, 25L, "x")) // single (current) version
      .toDF("id", "ts", "payload")
    val hist = Merge.scd2(changes, Seq("id"), "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getString(2)))
      .toSet
    // adjacent, gap-free, open-ended last interval per key
    assert(hist == Set(
      (1L, 10L, Some(20L), "a"), (1L, 20L, Some(30L), "b"), (1L, 30L, None, "c"),
      (2L, 25L, None, "x")), s"got $hist")

    def snapAt(at: Long): Map[Long, String] =
      Merge.asOfSnapshot(Merge.scd2(changes, Seq("id"), "ts"), lit(at))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(snapAt(15L) == Map(1L -> "a")) // key 2 not yet born
    assert(snapAt(25L) == Map(1L -> "b", 2L -> "x"))
    assert(snapAt(20L) == Map(1L -> "b")) // boundary: valid_from inclusive
    assert(snapAt(999L) == Map(1L -> "c", 2L -> "x")) // open versions match forever
  }

  test("upsert plans as anti join + union — no nested loop, aggregate-free") {
    import spark.implicits._
    val target = (0L until 100L).map(i => (i, i.toString)).toDF("id", "v")
    val updates = (0L until 10L).map(i => (i, s"u$i")).toDF("id", "v")
    val plan = Merge.upsert(target, updates, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("Union"),
      s"expected anti join + union:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in upsert:\n$plan")
  }
}
