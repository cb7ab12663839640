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
    // scratch holding INT k where the table declares BIGINT — the shape
    // the old mergeSchema branch would have silently committed as a
    // merged (widened) carried schema
    val scratch = new org.apache.hadoop.fs.Path(dir, ".inflight-b7-test")
    Seq((1, "x", 3L)).toDF("k", "s", "bucket").coalesce(1)
      .write.parquet(scratch.toString)
    val e = intercept[IllegalArgumentException](
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
}
