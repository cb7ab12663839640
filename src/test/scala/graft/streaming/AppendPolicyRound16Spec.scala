package graft.streaming

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.spark.sql.functions._

/** Round 16: the MEASURED append fan-out policy (closing the round-14/15
  * "thresholded, not boolean" ask). Default behavior, no conf:
  *  - an epoch whose task×live-partition bound stays under the cap keeps
  *    the shuffle-free layout (round-15's spec pins that side);
  *  - a many-partition epoch over the cap is shuffled and lands ≤ cap
  *    files;
  *  - a SKEWED epoch keeps parallelism on the hot partition (salted
  *    shuffle: multiple files for the hot value, never one giant task)
  *    while staying ≤ cap files. */
class AppendPolicyRound16Spec extends SparkSpec {

  private def newPartitioned(tag: String, buckets: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"gm-pol16-$tag").toString
    TableManifest.publishPartitioned(
      spark.range(buckets.toLong).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("s"),
        (col("id") % buckets).as("bucket")),
      dir, Seq("bucket"))
    dir
  }

  private def batchFilesOf(dir: String, batchId: Long): Seq[String] =
    TableManifest.read(spark, dir).get._2
      .filter(_.split('/').last.startsWith(s"b$batchId-"))

  test("a many-partition epoch over the cap is bounded WITHOUT any conf") {
    val dir = newPartitioned("cap", 16)
    // 16 tasks × 16 live values = 256 potential files > default cap 64
    val batch = spark.range(512).repartition(16)
      .select(col("id").as("k"), concat(lit("n"), col("id")).as("s"),
        (col("id") % 16).as("bucket"))
    ManifestAppendSink.applyBatch(batch, 1L, dir)
    val files = batchFilesOf(dir, 1L)
    assert(files.size <= 64,
      s"measured policy must bound the epoch to <= cap files, " +
        s"got ${files.size}")
    assert(files.forall(_.matches("bucket=\\d+/.*")),
      s"policy output stays k=v-nested: $files")
    assert(TableManifest.readTable(spark, dir)
      .filter(col("s").startsWith("n")).count() == 512L)
  }

  test("a skewed epoch keeps parallelism on the hot partition (salted, multiple files)") {
    val dir = newPartitioned("skew", 2)
    // 32 tasks, 2 live values, 97% of rows in bucket 0: T×P = 64... use
    // 64 tasks so the bound (128) exceeds the cap and the policy engages
    val batch = spark.range(4096).repartition(64)
      .select(col("id").as("k"), concat(lit("n"), col("id")).as("s"),
        when(col("id") % 32 === 0, 1L).otherwise(0L).as("bucket"))
    ManifestAppendSink.applyBatch(batch, 1L, dir)
    val files = batchFilesOf(dir, 1L)
    assert(files.size <= 64, s"stays under the cap: ${files.size}")
    val hot = files.filter(_.startsWith("bucket=0/"))
    assert(hot.size > 1,
      s"the hot partition must NOT serialize into one task/file " +
        s"(salted shuffle keeps parallelism), got ${hot.size} file(s)")
    assert(TableManifest.readTable(spark, dir)
      .filter(col("k") < 4096 && col("s").startsWith("n")).count() == 4096L)
  }

  test("the legacy boolean still forces strict one-file-per-live-partition") {
    val dir = newPartitioned("legacy", 8)
    val batch = spark.range(256).repartition(16)
      .select(col("id").as("k"), concat(lit("n"), col("id")).as("s"),
        (col("id") % 8).as("bucket"))
    spark.conf.set("spark.graft.manifest.appendRepartition", "true")
    try {
      ManifestAppendSink.applyBatch(batch, 1L, dir)
      assert(batchFilesOf(dir, 1L).size <= 8)
    } finally spark.conf.unset("spark.graft.manifest.appendRepartition")
  }
}
