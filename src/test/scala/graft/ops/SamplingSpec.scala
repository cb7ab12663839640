package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hash sample is deterministic, partition-independent, and rate-accurate") {
    val docs = Tables.load(spark, sfDir, "documents")
    val s1 = Sampling.hashSample(docs, col("doc_id"), 3000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs.repartition(13), col("doc_id"), 3000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample changed under repartitioning")
    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.3) < 0.1, s"rate off: ${s1.size / n}")
    // monotone: a higher rate strictly contains a lower one (same gate)
    val s3 = Sampling.hashSample(docs, col("doc_id"), 6000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("bottomKPerKey: exactly k per key, partition-independent, equals the window form") {
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id")
    val k = 7
    val s1 = Sampling.bottomKPerKey(events, Seq("event_type"), "event_id", k)
    val rows = s1.collect()
    val perKey = rows.groupBy(_.getString(1)).map { case (t, rs) => t -> rs.length }
    val groupSizes = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perKey.foreach { case (t, n) =>
      assert(n == math.min(k.toLong, groupSizes(t)), s"$t: got $n rows")
    }
    // ranks are 1..n and dense within each key
    rows.groupBy(_.getString(1)).foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rs.length),
        s"$t ranks not dense")
    }
    // stable under repartitioning (the point of hash-ordered sampling)
    val s2 = Sampling.bottomKPerKey(
      events.repartition(13), Seq("event_type"), "event_id", k)
      .select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s2 == rows.map(r => (r.getString(1), r.getLong(0))).toSet,
      "sample membership changed under repartitioning")
    // equals the declarative window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .orderBy(graft.functions.H60.of(col("event_id").cast("string")),
        col("event_id"))
    val viaWindow = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("event_type", "event_id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaWindow == rows.map(r =>
      (r.getString(1), r.getLong(0), r.getAs[Int]("rn"))).toSet)
  }

  test("weightedSample: deterministic, partition-independent, weight-biased, hash-exact") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("CAST(1 + LEAST(4, n_chars DIV 500) AS BIGINT)").as("w"))
    val k = 100
    val s1 = Sampling.weightedSample(docs, col("doc_id"), col("w"), k).collect()
    val s2 = Sampling.weightedSample(
      docs.repartition(13), col("doc_id"), col("w"), k)
      .collect()
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq,
      "selection changed under repartitioning")
    assert(s1.length == k)
    // priorities are exactly min over the hashed unit draws (hash-exact)
    val h = graft.functions.H60Util
    s1.take(20).foreach { r =>
      val (id, w, p) = (r.getLong(0), r.getLong(1), r.getAs[Long]("priority"))
      val expected = (1L to w).map(i =>
        h.hash(org.apache.spark.unsafe.types.UTF8String.fromString(s"$id#$i"))).min
      assert(p == expected, s"doc $id priority $p != $expected")
    }
    // weight bias: the sampled mean weight exceeds the population mean
    val popMean = docs.agg(avg("w")).collect().head.getDouble(0)
    val sampleMean = s1.map(_.getLong(1)).sum.toDouble / k
    assert(sampleMean > popMean,
      s"no weight bias: sample mean $sampleMean vs population $popMean")
    // weight 0 = drop, null = drop — without the guard, sequence(1, 0)
    // counts DOWN and a null priority would sort ahead of every real row
    import spark.implicits._
    val tricky = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 0L), (3L, null), (4L, 1L))
      .toDF("doc_id", "w")
    val sel = Sampling.weightedSample(tricky, col("doc_id"), col("w"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel == Set(1L, 4L), s"weight<1/null rows must be excluded: $sel")
  }

  test("weightedSample: a weight past Int.MaxValue fails loudly, never wraps") {
    import spark.implicits._
    val huge = Seq((1L, 4294967296L)).toDF("doc_id", "w") // 2^32 wraps to 0
    val e = intercept[Exception] {
      Sampling.weightedSample(huge, col("doc_id"), col("w"), 1).collect()
    }
    assert(e.getMessage.contains("weight exceeds Int.MaxValue"),
      s"wrong failure: ${e.getMessage}")
  }

  test("stratified rates apply per stratum; 0 and 10000 are exact") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = Sampling.stratifiedHashSample(
      docs, col("doc_id"), col("lang"),
      Map("en" -> 10000, "de" -> 0), defaultBp = 5000)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == totals("en")) // keep-all stratum is untouched
    assert(!byLang.contains("de")) // zero-rate stratum vanishes
    totals.keys.filterNot(Set("en", "de")).foreach { l =>
      assert(byLang(l) < totals(l), s"default rate kept everything for $l")
    }
  }

  test("rebalanceToShares: quotas filled best-first, capped by availability, whitelist keys") {
    import spark.implicits._
    // scores chosen so best-first selection is unambiguous; "xx" has only
    // 2 rows against a quota of 5; "zz" is not in the mixture at all
    val rows =
      (1L to 20L).map(i => (i, "en", 1000L - i)) ++ // en: best = lowest ids
      (21L to 22L).map(i => (i, "xx", 500L)) ++
      (31L to 40L).map(i => (i, "zz", 999L))
    val df = rows.toDF("doc_id", "key", "score").withColumn("neg", -col("score"))
    val out = Sampling.rebalanceToShares(df, "key", "neg", "doc_id",
      budget = 10, sharesBp = Map("en" -> 5000, "xx" -> 5000))
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("mix_rank")))
    val en = out.filter(_._1 == "en").sortBy(_._3)
    assert(en.map(_._2).toSeq == (1L to 5L).toSeq,
      s"en quota 5 filled with the 5 best (highest-score) docs: ${en.toSeq}")
    assert(en.map(_._3).toSeq == (1L to 5L).toSeq, "ranks are 1..quota")
    val xx = out.filter(_._1 == "xx")
    assert(xx.map(_._2).toSet == Set(21L, 22L),
      "under-quota key contributes everything it has")
    assert(!out.exists(_._1 == "zz"), "keys outside the mixture are excluded")
    // equivalence with the naive window form on the en group
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("score").desc, col("doc_id"))
    val naive = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("key").isin("en", "xx"))
      .select("key", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.map(t => (t._1, t._2)).toSet == naive,
      "groupedRank-based selection must equal the row_number form")
  }

  test("weightedSamplePerKey == per-key window form, repartition-stable, excludes sub-1 weights") {
    import spark.implicits._
    val rows = (1L to 300L).map(i =>
      (i, "k" + (i % 3), if (i % 7 == 0) 0L else 1L + (i % 4)))
    val df = rows.toDF("doc_id", "key", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSamplePerKey(d, Seq("key"), "doc_id", col("w"), k = 5)
        .select("key", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = run(df)
    assert(got.size == 15, s"5 per key x 3 keys: ${got.size}")
    assert(run(df.repartition(13)) == got, "partitioning changed the sample")
    assert(!got.exists { case (_, id) => id % 7 == 0 },
      "weight-0 rows must be excluded")
    // equivalence with the naive window over the same priority expression
    val naive = df.filter(col("w") >= 1)
      .withColumn("priority", array_min(transform(
        sequence(lit(1), col("w").cast("int")),
        i => graft.functions.H60.of(
          concat(col("doc_id").cast("string"), lit("#"), i.cast("string"))))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy("priority", "doc_id")))
      .filter(col("rn") <= 5)
      .select("key", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == naive, "TopKPerKey selection must equal the window form")
  }

  test("budgetSelect: prefix of score order until the weight budget, per group") {
    import spark.implicits._
    // weights chosen so the greedy prefix is unambiguous: group a fills
    // 10+9+8=27 of 30 and the next row (7) would overshoot; b's first row
    // alone overshoots nothing after it can recover (prefix semantics —
    // no knapsack backfill); c fits entirely
    val rows = Seq(
      (1L, "a", 1L, 10L), (2L, "a", 2L, 9L), (3L, "a", 3L, 8L),
      (4L, "a", 4L, 7L), (5L, "a", 5L, 1L),
      (6L, "b", 1L, 31L), (7L, "b", 2L, 2L),
      (8L, "c", 1L, 5L), (9L, "c", 2L, 5L))
      .toDF("doc_id", "grp", "score", "w")
    val out = Sampling.budgetSelect(rows, "grp", "score", "doc_id", "w",
        budget = 30L, buckets = 4)
      .select("doc_id", "cum_weight").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 10L, 2L -> 19L, 3L -> 27L, 8L -> 5L, 9L -> 10L),
      s"greedy prefix per group: $out")
    val err = intercept[IllegalArgumentException](
      Sampling.budgetSelect(rows, "grp", "score", "doc_id", "w", budget = -1L))
    assert(err.getMessage.contains("budget"))
  }
}
