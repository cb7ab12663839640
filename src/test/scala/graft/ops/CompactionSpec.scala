package graft.ops

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.load(spark, sfDir, "documents").select("doc_id", "lang", "text")

  private def fingerprint(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(crc32(concat_ws("", col("doc_id"), col("lang"), col("text"))))
        .as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("in-place compaction merges small files and preserves content exactly") {
    val dir = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    docs.repartition(64).write.mode("overwrite").parquet(dir)
    assert(partFiles(dir).size == 64)
    val expected = fingerprint(docs)

    val stats = Compaction.compactInPlace(spark, dir,
      targetBytes = 1L << 30, minFileBytes = 1L << 30)
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter == 1, s"expected one output file: $stats")
    assert(partFiles(dir).size == 1)
    assert(stats.bytesRewritten > 0)
    assert(fingerprint(spark.read.parquet(dir)) == expected)
  }

  test("right-sized files are left in place; only fragments are rewritten") {
    val dir = Files.createTempDirectory("graft-compact-inc").toFile.getAbsolutePath
    // one "big" consolidated file, then a burst of 32 fragments lands next to it
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val big = partFiles(dir) match { case Seq(f) => f }
    val bigLen = big.length()
    val frag = Files.createTempDirectory("graft-frag").toFile.getAbsolutePath
    docs.limit(50).repartition(32).write.mode("overwrite").parquet(frag)
    partFiles(frag).zipWithIndex.foreach { case (f, i) =>
      Files.copy(f.toPath, new java.io.File(dir, s"frag-$i.parquet").toPath)
    }
    assert(partFiles(dir).size == 33)

    // threshold sits between fragment size and the consolidated file's size
    val stats = Compaction.compactInPlace(spark, dir,
      targetBytes = 1L << 30, minFileBytes = bigLen)
    assert(stats.filesAfter == 2, s"big file + one compacted fragment file: $stats")
    val after = partFiles(dir)
    assert(after.exists(f => f.getName == big.getName && f.length() == bigLen),
      "the right-sized file must be byte-identical and untouched")
    // 50 fragment rows rewritten into the one compacted file, nothing lost
    assert(spark.read.parquet(dir).count() == docs.count() + 50)
  }

  test("no-op when nothing is fragmented") {
    val dir = Files.createTempDirectory("graft-compact-noop").toFile.getAbsolutePath
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val stats = Compaction.compactInPlace(spark, dir,
      targetBytes = 1L << 30, minFileBytes = 16)
    assert(stats == Compaction.Stats(1, 1, 0L))
  }

  test("plan sizes output count from input bytes, not file count") {
    val dir = Files.createTempDirectory("graft-compact-plan").toFile.getAbsolutePath
    docs.repartition(16).write.mode("overwrite").parquet(dir)
    val bytes = partFiles(dir).map(_.length()).sum
    val pl = Compaction.plan(spark, dir,
      targetBytes = bytes / 3 + 1, minFileBytes = Long.MaxValue)
    assert(pl.small.size == 16 && pl.large.isEmpty)
    assert(pl.targetFiles == 3, s"ceil(bytes / (bytes/3+1)) = 3, got $pl")
  }

  test("multi-level hive partitioning: compaction reaches the deepest leaves") {
    val dir = Files.createTempDirectory("graft-compact-deep").toFile.getAbsolutePath
    docs.withColumn("bucket", col("doc_id") % 2)
      .repartition(4).write.mode("overwrite")
      .partitionBy("lang", "bucket").parquet(dir)
    val stats = Compaction.compactPartitioned(spark, dir,
      targetBytes = 1L << 30, minFileBytes = 1L << 30)
    assert(stats.nonEmpty,
      "two-level layout must not silently no-op at the top level")
    assert(stats.keys.forall(_.matches("lang=[^/]+/bucket=[0-9]")),
      s"keys must be leaf-relative paths: ${stats.keys}")
    assert(stats.values.exists(s => s.filesAfter < s.filesBefore))
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("compactTo sizes output from nested bytes of a partitioned source") {
    val src = Files.createTempDirectory("graft-compactto-src").toFile.getAbsolutePath
    val dest = Files.createTempDirectory("graft-compactto-dst").toFile.getAbsolutePath
    docs.repartition(8).write.mode("overwrite").partitionBy("lang").parquet(src)
    val nestedBytes = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f) else f.listFiles.toSeq.flatMap(walk)
      walk(new java.io.File(src))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.length()).sum
    }
    val stats = Compaction.compactTo(spark, src, dest,
      targetBytes = nestedBytes / 3 + 1)
    assert(stats.bytesRewritten == nestedBytes,
      s"sizing must see bytes below partition dirs: $stats")
    assert(stats.filesBefore > 0 && stats.filesAfter == 3, s"$stats")
    // partition-dir column is materialized as a data column in dest
    val (n, _) = fingerprint(spark.read.parquet(dest)
      .select("doc_id", "lang", "text"))
    assert(n == docs.count())
  }

  test("partitioned compaction treats each hive partition independently") {
    val dir = Files.createTempDirectory("graft-compact-part").toFile.getAbsolutePath
    docs.repartition(8).write.mode("overwrite")
      .partitionBy("lang").parquet(dir)
    val stats = Compaction.compactPartitioned(spark, dir,
      targetBytes = 1L << 30, minFileBytes = 1L << 30)
    assert(stats.nonEmpty && stats.keys.forall(_.startsWith("lang=")))
    stats.values.foreach(s => assert(s.filesAfter <= s.filesBefore))
    assert(stats.values.exists(s => s.filesAfter < s.filesBefore),
      s"at least one partition had fragments to merge: $stats")
    // partition column survives the per-leaf rewrite (read via base dir)
    val (n, _) = fingerprint(spark.read.parquet(dir)
      .select("doc_id", "lang", "text"))
    assert(n == docs.count())
  }

  test("tracked partitioned compaction runs leaves concurrently and " +
      "converges: every leaf compacted, no rows lost, dvs honored") {
    // compactTracked now overlaps leaf compactions from a driver pool;
    // their manifest commits race each other on purpose and must
    // converge through the cheap re-CAS (victims untouched by a sibling
    // leaf's commit re-commit WITHOUT re-rewriting)
    val dir = Files.createTempDirectory("graft-ctrack").toFile.getAbsolutePath
    val src = (1L to 4000L).map(i => (i, i % 8, i * 3L))
    import spark.implicits._
    TableManifest.publishPartitioned(
      src.toDF("k", "bucket", "v").repartition(6), dir, Seq("bucket"))
    // a merge-on-read delete BEFORE compaction: the rewrite must
    // materialize it, never resurrect the row, even on the re-CAS path
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    try TableManifest.eraseWhereEq(spark, dir, "k", Seq(17L))
    finally spark.conf.unset("spark.graft.dml.deletionVectors")
    val before = TableManifest.read(spark, dir).get._2
    assert(before.count(_.contains("/")) > 8, s"fixture wants fragments: $before")
    val stats = Compaction.compactTracked(spark, dir,
      targetBytes = 1L << 30, minFileBytes = 1L << 30)
    assert(stats.filesAfter == 8,
      s"one compacted file per leaf partition: $stats")
    val rows = TableManifest.readTable(spark, dir)
      .agg(count(lit(1)), sum(col("v"))).head()
    val live = src.filterNot(_._1 == 17L)
    assert(rows.getLong(0) == live.size &&
      rows.getLong(1) == live.map(_._3).sum,
      "concurrent leaf compaction must keep exactly the live rows")
    assert(TableManifest.readDvs(spark, dir).isEmpty,
      "compaction materializes deletions; no dv survives the rewrite")
  }
}
