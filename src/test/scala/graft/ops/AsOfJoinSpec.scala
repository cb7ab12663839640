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

  test("earliestFollowing: next right at-or-after, equal ts matches") {
    import spark.implicits._
    val left = Seq((100L, 7L, 10L), (101L, 7L, 20L), (102L, 7L, 31L),
      (103L, 8L, 5L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq((1L, 7L, 20L), (2L, 7L, 30L)).toDF("event_id", "user_id", "ts_us")
    val out = AsOfJoin.earliestFollowing(left, right, "user_id", "ts_us", "event_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    // 10 -> next is 20 (id 1); 20 -> equal-ts right matches (id 1);
    // 31 -> nothing follows; user 8 has no rights
    assert(out == Map(100L -> Some(1L), 101L -> Some(1L),
      102L -> None, 103L -> None))
  }

  test("nearestWithin: closer side wins, tie to preceding, tolerance gates") {
    import spark.implicits._
    val right = Seq((1L, 7L, 10L), (2L, 7L, 20L)).toDF("event_id", "user_id", "ts_us")
    val left = Seq(
      (100L, 7L, 13L),  // d(back 10)=3 < d(fwd 20)=7 -> 1
      (101L, 7L, 17L),  // d=7/3 -> 2
      (102L, 7L, 15L),  // tie 5/5 -> preceding (1)
      (103L, 7L, 20L),  // exact hit -> 2
      (104L, 7L, 27L),  // only back in range at tol 5: d(20)=7 > 5 -> None
      (105L, 8L, 10L))  // no rights for user 8
      .toDF("event_id", "user_id", "ts_us")
    val out = AsOfJoin.nearestWithin(left, right, "user_id", "ts_us",
      "event_id", tolerance = 5L)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(out == Map(100L -> Some(1L), 101L -> Some(2L), 102L -> Some(1L),
      103L -> Some(2L), 104L -> None, 105L -> None))
    // a NULL-id right row never desynchronizes the (id, ts) carry
    val rightWithNull = Seq[(java.lang.Long, Long, Long)](
      (1L, 7L, 10L), (null, 7L, 100L)).toDF("event_id", "user_id", "ts_us")
    val near = AsOfJoin.nearestWithin(
      Seq((200L, 7L, 101L)).toDF("event_id", "user_id", "ts_us"),
      rightWithNull, "user_id", "ts_us", "event_id", tolerance = 5L)
      .head()
    assert(near.isNullAt(3),
      "id=1 is 91 away; the null-id row's ts must not lend it a match")

    // non-integral ts fails loudly
    intercept[IllegalArgumentException] {
      AsOfJoin.nearestWithin(
        left.withColumn("ts_us", org.apache.spark.sql.functions.col("ts_us").cast("double")),
        right, "user_id", "ts_us", "event_id", 5L)
    }
  }

  test("null timestamps never match: right null-ts dropped, left null-ts unmatched") {
    import spark.implicits._
    // right null-ts sorts FIRST (asc nulls first) — without the drop its
    // __rid is carried as a spurious "preceding" match for left rows that
    // in truth have nothing before them
    val rightNullTs = Seq[(Long, Long, java.lang.Long)](
      (9L, 7L, null), (1L, 7L, 60L)).toDF("event_id", "user_id", "ts_us")
    val leftEarly = Seq((100L, 7L, 50L)).toDF("event_id", "user_id", "ts_us")
    val prec = AsOfJoin.latestPreceding(
      leftEarly, rightNullTs, "user_id", "ts_us", "event_id").head()
    assert(prec.isNullAt(3),
      "a null-ts right row must not be a 'preceding' match")

    // left null-ts in the FORWARD variant sorts before every real ts —
    // unguarded, the carry hands it the key's earliest right row
    val leftNullTs = Seq[(Long, Long, java.lang.Long)](
      (200L, 7L, null), (201L, 7L, 10L)).toDF("event_id", "user_id", "ts_us")
    val rightReal = Seq((1L, 7L, 20L)).toDF("event_id", "user_id", "ts_us")
    val fwd = AsOfJoin.earliestFollowing(
      leftNullTs, rightReal, "user_id", "ts_us", "event_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(fwd == Map(200L -> None, 201L -> Some(1L)),
      "null-ts left matches nothing; real-ts left still matches")

    // nearestWithin: null ts on either side yields no match, and a null-ts
    // right row cannot desynchronize the (id, ts) carry pair
    val near = AsOfJoin.nearestWithin(
      leftNullTs, rightNullTs, "user_id", "ts_us", "event_id", tolerance = 100L)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(near == Map(200L -> None, 201L -> Some(1L)),
      "null-ts left unmatched; real-ts left matches the real-ts right only")
  }
}
