package graft.streaming

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.spark.sql.functions._

/** Round 15 write-path policies on the partitioned APPEND paths:
  * the opt-in small-file repartition (a T-task micro-batch spanning P
  * partitions lands ≤ P files per epoch instead of up to T×P) and the
  * schema-less sink's type-drift guard (a batch whose footers retype a
  * declared column is LOUD, never silently merged into the carried
  * schema). */
class AppendPolicyRound15Spec extends SparkSpec {
  import spark.implicits._

  private def newPartitioned(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"gm-pol-$tag").toString
    TableManifest.publishPartitioned(
      spark.range(16).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("s"),
        (col("id") % 8).as("bucket")),
      dir, Seq("bucket"))
    dir
  }

  private def batchFilesOf(dir: String, batchId: Long): Seq[String] =
    TableManifest.read(spark, dir).get._2
      .filter(_.split('/').last.startsWith(s"b$batchId-"))

  test("opt-in appendRepartition bounds a many-partition micro-batch to one file per live partition") {
    val dir = newPartitioned("fanout")
    // 8 input tasks × 8 partition values: the default (shuffle-free)
    // layout writes one file per (task, value) pair it holds
    def batch = spark.range(64).repartition(8)
      .select(col("id").as("k"), concat(lit("n"), col("id")).as("s"),
        (col("id") % 8).as("bucket"))
    ManifestAppendSink.applyBatch(batch, 1L, dir)
    val unbounded = batchFilesOf(dir, 1L)
    assert(unbounded.size > 8,
      s"fixture: the default layout must actually fan out, got ${unbounded.size}")
    // with the policy on, the batch shuffles BY the partition columns
    // first: at most one file per live partition value per epoch
    spark.conf.set("spark.graft.manifest.appendRepartition", "true")
    try {
      ManifestAppendSink.applyBatch(batch, 2L, dir)
      val bounded = batchFilesOf(dir, 2L)
      assert(bounded.size <= 8,
        s"policy must bound the epoch to <= live partitions: $bounded")
      assert(bounded.forall(_.matches("bucket=\\d+/.*")),
        s"policy output stays k=v-nested: $bounded")
    } finally spark.conf.unset("spark.graft.manifest.appendRepartition")
    // rows identical either way
    assert(TableManifest.readTable(spark, dir).count() == 16L + 64L + 64L)
  }

  test("a schema-less sink refuses a type-drifting batch instead of silently merging") {
    val dir = newPartitioned("drift")
    // scratch holding DOUBLE k where the table declares BIGINT — a
    // NON-widenable drift (lossy both ways) the old mergeSchema branch
    // would have silently committed as a merged carried schema
    val scratch = new org.apache.hadoop.fs.Path(dir, ".inflight-b7-test")
    Seq((1.5d, "x", 3L)).toDF("k", "s", "bucket").coalesce(1)
      .write.parquet(scratch.toString)
    val e = intercept[RuntimeException](
      ManifestAppendSink.commitScratch(spark, dir, scratch, 7L,
        schema = None, statsCols = Seq.empty))
    assert(e.getMessage.contains("never retypes a column"),
      s"got: ${e.getMessage}")
    // NEW columns keep the append-widens posture (only retypes are loud)
    val scratch2 = new org.apache.hadoop.fs.Path(dir, ".inflight-b8-test")
    Seq((99L, "y", 3L, 0.5)).toDF("k", "s", "bucket", "extra").coalesce(1)
      .write.parquet(scratch2.toString)
    ManifestAppendSink.commitScratch(spark, dir, scratch2, 8L,
      schema = None, statsCols = Seq.empty)
    val served = TableManifest.readTable(spark, dir)
    assert(served.columns.contains("extra"))
    assert(served.filter(col("k") === 99L).count() == 1L)
  }

  test("a schema-less NARROW batch into a widened column up-casts instead of failing (flat and partitioned)") {
    // the old-producer flow ALTER COLUMN TYPE exists for: the table
    // declares s BIGINT, a schema-less batch still writes INT — the sink
    // must admit it (reading and RE-WRITING it wide), not wedge the
    // epoch on an exact-type check, and never silently merge types
    val flat = java.nio.file.Files
      .createTempDirectory("gm-pol-widen-flat").toString
    TableManifest.publish(
      Seq((1L, 10L)).toDF("k", "c").coalesce(1), flat) // k, c BIGINT
    val s1 = new org.apache.hadoop.fs.Path(flat, ".inflight-b1-test")
    Seq((2, 20)).toDF("k", "c").coalesce(1).write.parquet(s1.toString) // INT
    ManifestAppendSink.commitScratch(spark, flat, s1, 1L,
      schema = None, statsCols = Seq.empty)
    val got = TableManifest.readTable(spark, flat)
    assert(got.schema("k").dataType ==
      org.apache.spark.sql.types.LongType, "carried schema stays BIGINT")
    assert(got.select(org.apache.spark.sql.functions.sum("c"))
      .head().getLong(0) == 30L, "narrow rows up-cast and land")
    // partitioned twin
    val part = newPartitioned("widen")
    val s2 = new org.apache.hadoop.fs.Path(part, ".inflight-b9-test")
    Seq((123, "n", 2L)).toDF("k", "s", "bucket").coalesce(1)
      .write.parquet(s2.toString) // k INT vs declared BIGINT
    ManifestAppendSink.commitScratch(spark, part, s2, 9L,
      schema = None, statsCols = Seq.empty)
    assert(TableManifest.readTable(spark, part)
      .filter(col("k") === 123L).count() == 1L)
    assert(TableManifest.readSchema(spark, part).get("k").dataType ==
      org.apache.spark.sql.types.LongType)
  }
}
