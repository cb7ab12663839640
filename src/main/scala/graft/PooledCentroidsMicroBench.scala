package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Confirm-or-clear profile for q60 (`Similarity.pooledQuantizedCentroids`),
  * the round-10 verdict's watch item: is the posexplode shape (n×dim rows
  * into a codegen'd partial hash aggregate) structurally slower than a
  * one-pass typed vector Aggregator (no explode, but object hashing and
  * per-row encoder work instead of whole-stage codegen)?
  *
  * Both shapes shuffle the same O(groups × dim) partial state after
  * map-side combine; the difference is purely the pre-aggregation row
  * path. The verdict's hypothesis was that the 64× row multiplication
  * might warrant the Aggregator; this measures both on the real q60
  * workload (sf0.1 embeddings, 8 groups) plus a high-cardinality variant
  * (4096 groups) where per-group state stops being broadcast-trivial.
  * Results go to COVERAGE.md — the swap only lands if the Aggregator wins
  * structurally (≥1.5×), because it costs fixed-dim strictness (the
  * explode shape tolerates ragged vectors; CentroidAgg fails loudly). */
object PooledCentroidsMicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    // sf0.1's embeddings table is only 2k vectors — pure scheduling
    // overhead at bench scale. Replicate 64× with offset ids (the
    // ScaleDrill construction) so the per-row costs being compared
    // (codegen'd explode+hashAgg vs encoder+object hashing) dominate.
    val base = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val copies = spark.range(64).select(col("id").as("copy"))
    val vecs = base.crossJoin(copies)
      .select((col("vec_id") + col("copy") * 1000000L).as("vec_id"), col("v"))
      .repartition(32)
      .cache()
    val n = vecs.count()
    println(s"vectors: $n")

    def timeIt(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val rows = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
      }

    for (groups <- Seq(8L, 4096L)) {
      // the PRE-swap shape, inlined for the record: posexplode to
      // (grp, component) rows, codegen'd partial hash aggregate
      timeIt(s"explode+hashAgg g=$groups") {
        graft.ops.Similarity.quantize(vecs)
          .select((col("vec_id") % groups).as("grp"),
            posexplode(col("qv")).as(Seq("i", "qc")))
          .groupBy("grp", "i")
          .agg(count(lit(1)).as("n"), sum(col("qc")).as("qsum"))
          .select(col("grp"), (col("i") + 1).cast("long").as("i"),
            round(col("qsum") / col("n"), 6).as("mean_q"))
          .count()
      }
      // the shipped shape: whole-vector CentroidAgg UDAF, no row
      // multiplication before the aggregate
      timeIt(s"CentroidAgg udaf g=$groups") {
        graft.ops.Similarity
          .pooledQuantizedCentroids(vecs, col("vec_id") % groups, dim = 64)
          .count()
      }
    }
    // sanity: both shapes agree cell-for-cell at g=8 (exact integer sums)
    val a = graft.ops.Similarity
      .pooledQuantizedCentroids(vecs, col("vec_id") % 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b = graft.ops.Similarity.quantize(vecs)
      .select((col("vec_id") % 8).as("grp"),
        posexplode(col("qv")).as(Seq("i", "qc")))
      .groupBy("grp", "i")
      .agg(count(lit(1)).as("n"), sum(col("qc")).as("qsum"))
      .select(col("grp"), (col("i") + 1).cast("long").as("i"),
        round(col("qsum") / col("n"), 6).as("mean_q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    println(s"shapes agree: ${a == b} (${a.size} cells)")
    spark.stop()
  }
}
