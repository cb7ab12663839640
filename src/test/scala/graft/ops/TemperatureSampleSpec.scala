package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temperature sampling (τ=2): hand-computed rates, the 10000 bp cap on
  * tail strata, determinism under repartitioning, and gate/rate
  * consistency. */
class TemperatureSampleSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(ns: (String, Int)*) =
    ns.flatMap { case (s, n) => (1 to n).map(i => (s"$s-$i".hashCode.toLong
      .abs + i.toLong * 1000003, s)) }
      .toDF("id", "s")

  test("a null stratum is a real stratum: counted, rated, and sampled") {
    // 100 null-stratum rows next to 400 en: the null group must get its
    // own rate and its rows must survive the gate — an equi-join would
    // both drop them silently AND depress en's share via the normalizer
    val withNull = corpus("en" -> 400)
      .unionByName((1 to 100).map(i => (900000L + i, null: String)).toDF("id", "s"))
    val out = Sampling.temperatureSample(withNull, col("id"), col("s"), 150L)
    val byS = out.groupBy("s").agg(count(lit(1)).as("n"), min("rate_bp").as("r"))
      .collect().map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // z = √400 + √100 = 30 → identical rates to the en/fr fixture
    assert(byS(Some("en"))._2 == 2500L && byS(None)._2 == 5000L, s"$byS")
    assert(byS(None)._1 > 0L, "null-stratum rows must survive the gate")
  }

  test("sqrt flattening: 4:1 corpus gets 2:1 rates, computed exactly") {
    // n = 400/100 → √n = 20/10, z = 30, budget 150:
    // rate_en = 10000·20·150/30/400 = 2500 bp, rate_fr = 5000 bp
    val df = corpus("en" -> 400, "fr" -> 100)
    val rates = Sampling.temperatureSample(df, col("id"), col("s"), 150L)
      .groupBy("s").agg(min("rate_bp").as("r"), max("rate_bp").as("r2"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rates("en") == ((2500L, 2500L)), s"got $rates")
    assert(rates("fr") == ((5000L, 5000L)), s"got $rates")
  }

  test("a tail stratum whose fair share exceeds its size caps at 10000 bp") {
    val df = corpus("big" -> 500, "rare" -> 2)
    val kept = Sampling.temperatureSample(df, col("id"), col("s"), 400L)
    val rare = kept.filter(col("s") === "rare")
      .select("rate_bp").distinct().collect().map(_.getLong(0))
    assert(rare.sameElements(Array(10000L)), s"got ${rare.toSeq}")
    assert(kept.filter(col("s") === "rare").count() == 2L,
      "capped stratum keeps everything")
  }

  test("selection is deterministic and partition-independent") {
    val df = corpus("en" -> 300, "fr" -> 80, "zh" -> 40)
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureSample(d, col("id"), col("s"), 200L)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(df) == ids(df.repartition(17)), "hash gate ignores layout")
    assert(ids(df).nonEmpty)
  }
}
