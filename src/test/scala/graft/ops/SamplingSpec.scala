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
}
