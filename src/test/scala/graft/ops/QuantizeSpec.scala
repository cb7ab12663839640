package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {

  private def vecs = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("quantize: integral components in [-127,127], max-abs component saturates") {
    val q = Similarity.quantize(vecs)
    val checks = q.select(
      max(array_max(transform(col("qv"), x => abs(x)))).as("max_abs"),
      min(array_min(transform(col("qv"), x => abs(x - round(x))))).as("frac"),
      min(array_max(transform(col("qv"), x => abs(x)))).as("min_of_max"))
      .collect()(0)
    assert(checks.getAs[Double]("max_abs") <= 127.0)
    assert(checks.getAs[Double]("frac") == 0.0) // all components integral
    assert(checks.getAs[Double]("min_of_max") == 127.0) // scale saturates every vector
  }

  test("quantized top-k closely agrees with exact brute-force ranking") {
    val probes = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val exact = Similarity.bruteTopK(vecs, probes, k = 3)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedTopK(vecs, col("vec_id") < 5, k = 3)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall too low: $recall (exact=$exact quant=$quant)")
  }
}
