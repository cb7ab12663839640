package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-shard export ([[Export.shards]]): deterministic membership,
  * statistical balance, manifest-pinned atomic visibility. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("a null id fails loudly instead of landing in an unreadable null shard") {
    val out = java.nio.file.Files.createTempDirectory("export-null").toString + "/t"
    val docs = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val e = intercept[Exception] {
      Export.shards(docs, "doc_id", out, n = 4)
    }
    def mentions(t: Throwable): Boolean =
      t != null && (t.getMessage != null && t.getMessage.contains("null doc_id")
        || mentions(t.getCause))
    assert(mentions(e), s"expected the loud null-id guard, got: ${e.getMessage}")
  }

  test("hash-sharded export: balanced, deterministic, manifest-read round-trips") {
    val out = java.nio.file.Files.createTempDirectory("export").toString + "/t"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val report = Export.shards(docs, "doc_id", out, n = 8)
      .as[(Long, Long)].collect().toMap

    assert(report.keySet === (0L until 8L).toSet)
    assert(report.values.sum === docs.count())
    // statistical balance: every shard within 3·sqrt(expected) of expected
    val exp = docs.count() / 8.0
    report.values.foreach(v =>
      assert(math.abs(v - exp) <= 3 * math.sqrt(exp) + 1,
        s"shard size $v too far from expected $exp"))

    // membership is a pure function of the id — recompute and compare
    val back = Export.read(spark, out)
    assert(back.count() === docs.count())
    val wrong = back.filter(
      pmod(graft.functions.H60.of(col("doc_id").cast("string")), lit(8L))
        =!= col("shard")).count()
    assert(wrong === 0L, "shard column must equal the id-hash assignment")

    // the manifest pins the files: a stray non-manifest parquet file in
    // the dir is invisible through Export.read
    docs.limit(5).withColumn("shard", lit(99L))
      .coalesce(1).write.mode("append").parquet(out + "_stray")
    val stray = new java.io.File(out + "_stray").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(stray.toPath,
      new java.io.File(out, "zz-stray.parquet").toPath)
    assert(Export.read(spark, out).count() === docs.count(),
      "manifest read must ignore files outside the pinned set")

    // re-export publishes a NEW snapshot atomically: the manifest head
    // flips to the smaller corpus, and the previous snapshot's files stay
    // on disk for in-flight readers until a vacuum
    val filesBefore = new java.io.File(out).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val half = docs.filter(col("doc_id") % 2 === 0)
    Export.shards(half, "doc_id", out, n = 4)
    assert(Export.read(spark, out).count() === half.count())
    val filesAfter = new java.io.File(out).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(filesAfter > filesBefore,
      "old snapshot files must survive a re-export until vacuum")
  }
}
