package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** DSIR importance weighting: target-like raw documents must outweigh
  * alien ones, weights are exact integers stable under repartitioning,
  * and selection is a deterministic bounded top-k. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val target = df(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat on the rug",
    3L -> "a cat and a dog sat down")

  private val raw = df(
    10L -> "the cat sat on the rug today",   // shares target bigrams
    11L -> "a dog sat on the mat quietly",   // shares target bigrams
    12L -> "777 888 999 000 111 222",        // alien
    13L -> "zzz yyy xxx www vvv uuu")        // alien

  test("featureless (short) docs score a neutral 0, not silent exclusion") {
    val withShort = raw.unionByName(df(20L -> "solo"))
    val w = Dsir.importanceWeights(withShort, target)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set(10L, 11L, 12L, 13L, 20L),
      s"short doc must still be scored: ${w.keySet}")
    assert(w(20L) == 0L, s"zero evidence = neutral weight: ${w(20L)}")
    // and it outranks negative-evidence docs in selection
    val sel = Dsir.select(Dsir.importanceWeights(withShort, target), 3)
      .collect().map(_.getLong(0)).toSet
    assert(sel.contains(20L), s"neutral doc beats alien docs: $sel")
  }

  test("target-like documents outweigh alien ones") {
    val w = Dsir.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set(10L, 11L, 12L, 13L))
    assert(w(10L) > w(12L) && w(10L) > w(13L), s"weights: $w")
    assert(w(11L) > w(12L) && w(11L) > w(13L), s"weights: $w")
  }

  test("weights are partition-independent exact integers") {
    val once = Dsir.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = Dsir.importanceWeights(raw.repartition(13), target.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once == again, "fixed-point weights must not depend on partitioning")
  }

  test("select keeps the k most target-like docs, ties resolved by doc_id") {
    val w = Seq((1L, 100L), (2L, 100L), (3L, 50L), (4L, 200L))
      .toDF("doc_id", "logw")
    val got = Dsir.select(w, 2).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(4L, 1L), s"got $got")
  }

  test("feature buckets stay inside the hashed vocabulary") {
    val f = Dsir.features(raw, vocab = 64)
    val bounds = f.agg(
      org.apache.spark.sql.functions.min("b"),
      org.apache.spark.sql.functions.max("b")).head()
    assert(bounds.getLong(0) >= 0L && bounds.getLong(1) < 64L)
  }
}
