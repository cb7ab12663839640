package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch frequency estimation.
  *
  * Companion to the exact-count paths (q2/q7) and the Misra-Gries heavy
  * hitters ([[graft.functions.HeavyHitters]]): a Count-Min sketch is a few
  * MB regardless of key cardinality and merges associatively across
  * partitions, so at 100 TB it answers "how often does key x appear" with a
  * single narrow pass where an exact group-by would shuffle every distinct
  * key. Cf. Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications" (J. Algorithms 55, 2005).
  */
object Sketch {

  /** Exact counts of the top-`k` keys by frequency, each annotated with
    * whether the CMS estimate respects its guarantees: `estimate >= exact`
    * (always, by construction) and `estimate <= exact + eps·N` (with
    * probability `confidence` per probe).
    *
    * The output's value columns are engine-agnostic (exact counts + the
    * boolean bound check), so it oracle-verifies even though the sketch
    * itself is Spark-specific. The sketch build is one `treeAggregate` pass
    * (`df.stat.countMinSketch`); probing the k surviving rows is a codegen'd
    * reference-object lookup, not a join.
    */
  def cmsTopKeys(df: DataFrame, key: String, k: Int,
      eps: Double = 1e-4, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    // CmsEstimate probes are bigint-only (codegen calls estimateCount on a
    // long; the interpreted path casts) — a string/int key would build a
    // sketch fine and then crash or miscount at probe time. Fail loudly
    // with the cast hint instead.
    require(df.schema(key).dataType ==
      org.apache.spark.sql.types.LongType,
      s"cmsTopKeys needs a BIGINT key column, got " +
        s"${df.schema(key).dataType.simpleString} for `$key` — cast first " +
        "(hash strings through h60)")
    val cms = df.stat.countMinSketch(key, eps, confidence, seed)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    df.groupBy(key)
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col(key))
      .limit(k)
      .withColumn("est", graft.functions.CmsEstimate.of(cms, col(key)))
      .select(
        col(key),
        col("exact_n"),
        (col("est") >= col("exact_n") &&
          col("est") <= col("exact_n") + slack).as("within_tol"))
  }
}
