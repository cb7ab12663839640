package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Vocabulary growth curve: the min-bucket formulation must equal the
  * naive per-threshold distinct count, the curve is monotone, and the
  * final point is the whole corpus's distinct-bigram count. */
class VocabGrowthSpec extends SparkSpec {

  import spark.implicits._

  private def docs = (1L to 120L).map { i =>
    // overlapping vocabulary so prefixes share bigrams
    (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11} tok${i % 2}")
  }.toDF("doc_id", "text")

  test("curve equals the naive per-threshold distinct count") {
    val got = TextStats.vocabGrowth(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = docs.withColumn("b",
      pmod(TextOps.h60(col("doc_id").cast("string")), lit(100L)))
    val naive = (10 to 100 by 10).map { pct =>
      pct.toLong -> bucketed.filter(col("b") < pct)
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(explode(graft.functions.NgramHashes.of(col("toks"), 2)).as("h"))
        .agg(countDistinct(col("h"))).head().getLong(0)
    }.toMap
    assert(got == naive, s"min-bucket curve $got != naive $naive")
  }

  test("curve is monotone and ends at the full distinct-bigram count") {
    val rows = TextStats.vocabGrowth(docs)
      .orderBy("pct").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == (10L to 100L by 10L).toSeq)
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 <= b._2 },
      s"monotone: ${rows.toSeq}")
    val full = docs
      .select(explode(graft.functions.NgramHashes.of(
        TextOps.tokens(col("text")), 2)).as("h"))
      .agg(countDistinct(col("h"))).head().getLong(0)
    assert(rows.last._2 == full, "100% point is the whole corpus")
  }
}
