package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("matches latest preceding right row; equal ts matches; none -> null") {
    import spark.implicits._
    val purchases = Seq(
      (100L, 1L, 50L), // after views 10,20 → matches view 2
      (101L, 1L, 20L), // exactly at view 2's ts → matches view 2
      (102L, 1L, 5L),  // before any view → null
      (103L, 2L, 99L)) // user with no views → null
      .toDF("event_id", "user_id", "ts_us")
    val views = Seq(
      (1L, 1L, 10L),
      (2L, 1L, 20L))
      .toDF("event_id", "user_id", "ts_us")
    val out = AsOfJoin.latestPreceding(
      purchases, views, "user_id", "ts_us", "event_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(out == Map(
      100L -> Some(2L), 101L -> Some(2L), 102L -> None, 103L -> None))
  }

  test("left columns survive untouched") {
    import spark.implicits._
    val left = Seq((1L, 7L, 100L, "payload")).toDF("event_id", "user_id", "ts_us", "extra")
    val right = Seq((9L, 7L, 50L)).toDF("event_id", "user_id", "ts_us")
    val out = AsOfJoin.latestPreceding(left, right, "user_id", "ts_us", "event_id")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts_us", "extra", "asof_id"))
    val r = out.collect()(0)
    assert(r.getString(3) == "payload" && r.getLong(4) == 9L)
  }
}
