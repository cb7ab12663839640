package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("bloomClean equals the plain exact anti-join (no false negatives survive)") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val isEval = col("doc_id") % 7 === 0
    val train = docs.filter(!isEval)
    val evalDocs = docs.filter(isEval)

    val viaBloom = Dedup.bloomClean(train, evalDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // ground truth: anti-join against the exact overlap set
    val contaminated = Dedup.shingleOverlap(train, evalDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = train.select("doc_id").collect().map(_.getLong(0)).toSet
      .diff(contaminated)
    assert(viaBloom == expected,
      s"bloom path diverged: extra=${viaBloom.diff(expected).take(5)} " +
        s"missing=${expected.diff(viaBloom).take(5)}")
  }

  test("BloomMightContain: members always hit; disjoint keys mostly miss at the set fpp") {
    import spark.implicits._
    val members = spark.range(0, 2000).select(col("id").as("h"))
    val bloom = members.stat.bloomFilter("h", 2000, 0.03)
    val memberHits = members
      .filter(graft.functions.BloomMightContain.of(bloom, col("h"))).count()
    assert(memberHits == 2000, "bloom produced a false negative")
    // disjoint probe range: only false positives pass, bounded near fpp
    val fp = spark.range(1000000, 1010000).select(col("id").as("h"))
      .filter(graft.functions.BloomMightContain.of(bloom, col("h"))).count()
    assert(fp < 10000 * 0.03 * 4, s"false-positive rate far above fpp: $fp/10000")
  }

  test("CMS estimates: est >= exact for every key, within eps*N on a skewed column") {
    val events = Tables.load(spark, sfDir, "events")
    val eps = 1e-4
    val cms = events.stat.countMinSketch("user_id", eps, 0.99, 42)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val rows = events.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .withColumn("est", graft.functions.CmsEstimate.of(cms, col("user_id")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted ${r.getLong(0)}: $est < $exact")
      assert(est <= exact + slack,
        s"CMS overshoot beyond eps*N for ${r.getLong(0)}: $est > $exact + $slack")
    }
  }

  test("cmsTopKeys rejects a non-bigint key up front (probe is long-only)") {
    import spark.implicits._
    val strs = Seq("a", "b", "a").toDF("s")
    val e = intercept[IllegalArgumentException] {
      Sketch.cmsTopKeys(strs, "s", 2)
    }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }

  test("cmsTopKeys output: within_tol all true, exact counts match a plain groupBy") {
    val events = Tables.load(spark, sfDir, "events").select("user_id")
    val out = Sketch.cmsTopKeys(events, "user_id", k = 5).collect()
    assert(out.length == 5)
    assert(out.forall(_.getBoolean(2)), "a CMS probe left its tolerance band")
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toSeq == exact.toSeq)
  }
}
