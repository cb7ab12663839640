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

  // ---- temperatureResample (replication side) -----------------------

  test("resample: exact uncapped factors, whole copies + gated remainder") {
    // n = 400/100 → √n = 20/10, z = 30, budget 600:
    // f_en = 10000·20·600/30/400 = 10000 bp (exactly 1 copy, rem 0)
    // f_fr = 10000·10·600/30/100 = 20000 bp (exactly 2 copies, rem 0)
    val df = corpus("en" -> 400, "fr" -> 100)
    val out = Sampling.temperatureResample(df, col("id"), col("s"), 600L)
    val byS = out.groupBy("s").agg(
        count(lit(1)).as("n_out"), countDistinct(col("id")).as("n_base"),
        max("copy").as("mc"), min("f_bp").as("f"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // zero remainder → every row gets its exact whole-copy count
    assert(byS("en") == ((400L, 400L, 1L, 10000L)), s"$byS")
    assert(byS("fr") == ((200L, 100L, 2L, 20000L)), s"$byS")
  }

  test("resample: fractional remainder emits the expected extra copies " +
    "and a sub-1 factor degrades to gate sampling") {
    // big: f < 10000 → pure sampling (0 whole copies, gate only);
    // rare: f > 10000 with a fractional part → 1+ copies, gated extras
    val df = corpus("big" -> 500, "rare" -> 50)
    val out = Sampling.temperatureResample(df, col("id"), col("s"), 400L)
    val f = out.select("s", "f_bp").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // z = √500+√50 ≈ 29.433; f_big = 10000·√500·400/z/500 ≈ 6078,
    // f_rare = 10000·√50·400/z/50 ≈ 19222 (guard: recompute, don't pin)
    val z = math.sqrt(500) + math.sqrt(50)
    assert(f("big") == math.round(10000.0 * math.sqrt(500) * 400 / z / 500))
    assert(f("rare") == math.round(10000.0 * math.sqrt(50) * 400 / z / 50))
    val big = out.filter(col("s") === "big")
    assert(big.agg(max("copy")).head.getLong(0) == 1L,
      "sub-1 factor must never replicate")
    assert(big.count() < 500L, "sub-1 factor must subsample")
    val rare = out.filter(col("s") === "rare")
    val whole = f("rare") / 10000L
    assert(rare.select(countDistinct(col("id"))).head.getLong(0) == 50L,
      "factor > 1 keeps every base row")
    val extras = rare.count() - 50L * whole
    assert(extras > 0L && extras < 50L,
      s"fractional remainder must gate extra copies: $extras")
  }

  test("resample: (id, copy) unique, partition-independent, copy contiguous") {
    val df = corpus("en" -> 300, "fr" -> 40)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureResample(d, col("id"), col("s"), 500L)
        .select("id", "copy").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = pairs(df)
    assert(p == pairs(df.repartition(13)), "replication ignores layout")
    assert(p.size == p.toSeq.distinct.size)
    // copies are 1..k per id with no gaps: max == count per id
    p.groupBy(_._1).foreach { case (id, cs) =>
      assert(cs.map(_._2) == (1L to cs.size).toSet, s"gapped copies for $id")
    }
  }
}
