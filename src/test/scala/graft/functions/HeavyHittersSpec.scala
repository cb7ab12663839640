package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  // Skewed synthetic stream: "hot1" 30%, "hot2" 20%, 50% spread over 100
  // distinct cold keys (~0.5% each — only residues 5..9 mod 10 of id % 200
  // occur). n = 20,000.
  private def stream = {
    import spark.implicits._
    spark.range(20000).select(
      when(col("id") % 10 < 3, "hot1")
        .when(col("id") % 10 < 5, "hot2")
        .otherwise(concat(lit("cold"), (col("id") % 200).cast("string")))
        .as("item"))
      .as[String]
  }

  test("misra-gries keeps every >n/(k+1) item with bounded undercount, any partitioning") {
    import spark.implicits._
    val exact = stream.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 10
    for (parts <- Seq(1, 8, 32)) {
      val hits = stream.repartition(parts)
        .select(new HeavyHitters(k).toColumn)
        .head()
      val est = hits.map(h => h.item -> h.count).toMap
      assert(est.size <= k)
      // guarantee 1: all guaranteed-heavy items survive
      exact.filter(_._2 > n / (k + 1)).keys.foreach { item =>
        assert(est.contains(item), s"heavy item $item missing at parts=$parts")
      }
      // guarantee 2: never overestimates, undercounts by at most n/(k+1)
      est.foreach { case (item, c) =>
        val t = exact.getOrElse(item, 0L)
        assert(c <= t, s"$item overestimated: $c > $t")
        assert(t - c <= n / (k + 1), s"$item undercount ${t - c} > ${n / (k + 1)}")
      }
      // and the two hot keys rank first in the sketch output
      assert(hits.take(2).map(_.item).toSet == Set("hot1", "hot2"))
    }
  }

  test("the sketch is SQL-callable as a registered UDAF") {
    spark.udf.register("heavy_hitters10",
      org.apache.spark.sql.functions.udaf(new HeavyHitters(10)))
    stream.toDF("item").createOrReplaceTempView("hh_stream")
    val hits = spark.sql(
      "SELECT heavy_hitters10(item) AS hits FROM hh_stream")
      .selectExpr("inline(hits)")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hits.take(2).map(_._1).toSet == Set("hot1", "hot2"))
    assert(hits.length <= 10)
  }

  test("misra-gries buffers stay bounded at k counters under adversarial merge") {
    val agg = new HeavyHitters(3)
    // merging two full disjoint summaries must re-bound to k
    val a = Map("a" -> 10L, "b" -> 7L, "c" -> 2L)
    val b = Map("d" -> 9L, "e" -> 5L, "f" -> 1L)
    val m = agg.merge(a, b)
    assert(m.size <= 3)
    // the (k+1)-th largest (5) is subtracted: a=5, d=4, b=2 survive
    assert(m == Map("a" -> 5L, "d" -> 4L, "b" -> 2L))
  }

  test("null items are skipped, never reported as heavy hitters") {
    // a null-heavy column through the SQL-registered udaf — the path
    // where nulls actually reach reduce (the typed .toColumn path
    // null-skips upstream). Unguarded, the null becomes a Map KEY and
    // buffer serialization dies mid-query with EXPRESSION_ENCODING_FAILED
    // (Catalyst map keys are non-nullable) — a null user-id column would
    // kill the whole top-talkers job, not just skew its output.
    spark.udf.register("hh5_nulls",
      org.apache.spark.sql.functions.udaf(new HeavyHitters(5)))
    spark.range(20000).select(
      when(col("id") % 10 < 6, lit(null).cast("string"))
        .when(col("id") % 10 < 8, "hot1")
        .otherwise(concat(lit("cold"), (col("id") % 100).cast("string")))
        .as("item"))
      .repartition(8)
      .createOrReplaceTempView("hh_nulls")
    val hits = spark.sql("SELECT hh5_nulls(item) AS hits FROM hh_nulls")
      .selectExpr("inline(hits)")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hits.nonEmpty && hits.forall(_._1 != null),
      s"null must never be a reported item: ${hits.toSeq}")
    assert(hits.head._1 == "hot1")
  }
}
