package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("salted aggregation matches plain aggregation exactly") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toString)).toSet

    val salted = Scale.saltedAggregate(
      li, col("l_returnflag"), salts = 7,
      partials = Seq(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q")),
      merges = Seq(c => sum(c), c => sum(c)))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toString)).toSet

    assert(salted == plain)
  }

  test("skew join matches plain join exactly (including multiplicity)") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val orders = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy().agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,2)")))
      .collect()(0)
    val skewed = Scale.skewJoin(li, orders, "l_orderkey", "o_orderkey", salts = 5)
      .groupBy().agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,2)")))
      .collect()(0)
    assert(plain.getLong(0) == skewed.getLong(0))
    assert(plain.getDecimal(1) == skewed.getDecimal(1))
  }

  test("prefixSum equals the single-partition window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("n", col("n_chars"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs.withColumn("cum", sum(col("n")).over(w))
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = Scale.prefixSum(docs, "doc_id", "n", "cum", buckets = 7)
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual == expected)
  }

  test("groupedRank == window row_number on skewed groups with ties") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7L)
    // one huge group, two small ones; heavy duplicate scores force
    // tie-breaking through tieCol inside and across buckets
    val rows = (0L until 3000L).map(i =>
      (i, if (i % 10 == 0) "small" + (i % 20) else "big", rnd.nextInt(40).toLong))
    val df = rows.toDF("id", "grp", "score")
    val expected = df.withColumn("rnk",
      row_number().over(Window.partitionBy("grp").orderBy("score", "id"))
        .cast("long"))
      .select("id", "rnk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = Scale.groupedRank(df, "grp", "score", "id", "rnk", buckets = 8)
      .select("id", "rnk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual == expected)
    // degenerate group: constant order values still rank correctly
    val const = Seq((1L, "g", 5L), (2L, "g", 5L), (3L, "g", 5L)).toDF("id", "grp", "score")
    val got = Scale.groupedRank(const, "grp", "score", "id", "r", buckets = 4)
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("groupedRank keeps null group and null order keys, matching the window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // null group = its own partition; null scores rank first (ASC NULLS
    // FIRST) — both previously fell out of the inner equi-joins entirely
    val df = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "a", 30L), (2L, "a", null), (3L, "a", 10L),
      (4L, null, 7L), (5L, null, null), (6L, null, 9L),
      (7L, "b", 5L))
      .toDF("id", "grp", "score")
    val expected = df.withColumn("rnk",
      row_number().over(Window.partitionBy("grp").orderBy("score", "id"))
        .cast("long"))
      .select("id", "rnk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = Scale.groupedRank(df, "grp", "score", "id", "rnk", buckets = 4)
      .select("id", "rnk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual == expected, s"null-key divergence: $actual vs $expected")
    assert(actual.size == 7, "a null-keyed row was dropped")
  }

  test("groupedPrefixSum == window running sum, incl. null keys and ties") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11L)
    val rows = (0L until 2000L).map(i =>
      (i, if (i % 7 == 0) "small" + (i % 3) else "big",
        rnd.nextInt(30).toLong, rnd.nextInt(100).toLong + 1L))
    val df = rows.toDF("id", "grp", "score", "w")
    val expected = df.withColumn("cum",
      sum(col("w")).over(Window.partitionBy("grp").orderBy("score", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = Scale.groupedPrefixSum(df, "grp", "score", "id", "w", "cum",
        buckets = 8)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual == expected)
    // null group key and null order values follow the window's semantics
    val nulls = Seq[(java.lang.Long, String, java.lang.Long, java.lang.Long)](
      (1L, "a", 30L, 2L), (2L, "a", null, 3L), (3L, "a", 10L, 5L),
      (4L, null, 7L, 1L), (5L, null, null, 9L), (7L, "b", 5L, 4L))
      .toDF("id", "grp", "score", "w")
    val expN = nulls.withColumn("cum",
      sum(col("w")).over(Window.partitionBy("grp").orderBy("score", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actN = Scale.groupedPrefixSum(nulls, "grp", "score", "id", "w", "cum",
        buckets = 4)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actN == expN, s"null-key divergence: $actN vs $expN")
    // non-integral weights are rejected loudly (double partials would make
    // the prefix merge-order dependent)
    val dbl = Seq((1L, "g", 1L, 1.5)).toDF("id", "grp", "score", "w")
    val err = intercept[IllegalArgumentException](
      Scale.groupedPrefixSum(dbl, "grp", "score", "id", "w", "cum"))
    assert(err.getMessage.contains("integral"))
  }

  // the bucketed co-located-join invariant lives in BucketedJoinSpec
  // (Layout.writeBucketed helper, shuffling-plain-join contrast, bucket
  // pruning) — a second pair of bucketed table writes here pinned the
  // same plan and only added suite I/O

  test("skewReport: hand-computed concentration on a known-skew fixture") {
    import spark.implicits._
    // key 1: 6 rows, key 2: 2 rows, keys 3..4: 1 row → 10 rows, 4 keys
    val df = (Seq.fill(6)(1) ++ Seq.fill(2)(2) ++ Seq(3, 4)).toDF("k")
    val r = Scale.skewReport(df, "k", topK = 2)
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    // max 6/10 = 600000 ppm; top-2 (6+2)/10 = 800000 ppm
    assert(r === ((10L, 4L, 6L, 600000L, 800000L)))
    // ties at cnt=1 break toward the smaller key: top-3 adds key 3 only
    val r3 = Scale.skewReport(df, "k", topK = 3)
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(r3._5 === 900000L)
  }
}
