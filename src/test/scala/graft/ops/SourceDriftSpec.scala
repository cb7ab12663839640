package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KL drift monitor ([[TextStats.sourceDrift]]) — hand-computable fixture
  * plus conservation invariants on the real corpus slice. */
class SourceDriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical sources show zero drift; a skewed source shows ln2-scaled drift") {
    val docs = Seq(
      ("a", "x y"), ("b", "x y"),          // identical distributions
      ("c", "x x x x"), ("d", "y y y y")   // fully skewed pair
    ).toDF("source", "text")

    val even = TextStats.sourceDrift(docs.filter(col("source") < "c"))
      .as[(String, Long, Long, Long)].collect()
    // p_s = p for both sources → every term is exactly ln(4)-ln(2)-ln(2)=0
    assert(even.map(r => (r._1, r._2, r._3, r._4)) ===
      Array(("a", 2L, 2L, 0L), ("b", 2L, 2L, 0L)))

    val skew = TextStats.sourceDrift(docs.filter(col("source") >= "c"))
      .as[(String, Long, Long, Long)].collect()
    // each source: c=4, N=8, Ct=4, Ns=4 → 4·ln2·1e4 = round(27725.887) per
    // source = N_s·KL·1e4 with KL = ln 2
    assert(skew.map(_._4) === Array(27726L, 27726L))
  }

  test("token totals conserve and drift is near-non-negative on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text")
    val out = TextStats.sourceDrift(docs)
      .as[(String, Long, Long, Long)].collect()
    val corpusTokens = docs
      .select(explode(TextOps.tokens(col("text")))).count()
    assert(out.map(_._2).sum === corpusTokens)
    // true KL >= 0 per source; fixed-point rounding can dip a hair below
    out.foreach { case (s, _, types, kl) =>
      assert(kl >= -types, s"source $s drift $kl below rounding floor")
    }
  }
}
