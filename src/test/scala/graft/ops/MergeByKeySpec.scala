package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TableManifest.mergeByKey]] — key-based batch upsert (the Delta
  * `MERGE INTO … UPDATE SET * / INSERT *` core): whole-row replacement of
  * matched keys, insert of the rest, copy-on-write confined to the files
  * that actually HOLD a matched key, idempotent retry, loud contract
  * violations. */
class MergeByKeySpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-merge-$tag").toFile.getAbsolutePath

  /** Tracked 3-file table: keys 1-3 / 4-6 / 7-9, range-clustered so the
    * committed stats make files genuinely prunable. */
  private def newTable(analyze: Boolean = true): String = {
    val dir = tmpDir("t")
    (1L to 9L).map(k => (k, s"v$k", k * 10L)).toDF("k", "s", "w")
      .repartitionByRange(3, col("k"))
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    if (analyze) TableManifest.analyze(spark, dir, Seq("k"))
    dir
  }

  private def rows(dir: String): Seq[(Long, String, Long)] =
    TableManifest.readTable(spark, dir).as[(Long, String, Long)]
      .collect().toSeq.sorted

  test("matched keys replaced whole-row, unmatched inserted, rest untouched") {
    val dir = newTable()
    val src = Seq((2L, "U2", 222L), (5L, "U5", 555L), (11L, "N11", 1100L))
      .toDF("k", "s", "w")
    val v = TableManifest.mergeByKey(spark, dir, "k", src)
    assert(v >= 3L, "merge commits a new version")
    assert(rows(dir) == Seq(
      (1L, "v1", 10L), (2L, "U2", 222L), (3L, "v3", 30L),
      (4L, "v4", 40L), (5L, "U5", 555L), (6L, "v6", 60L),
      (7L, "v7", 70L), (8L, "v8", 80L), (9L, "v9", 90L),
      (11L, "N11", 1100L)))
  }

  test("copy-on-write is file-granular: files without a matched key keep their names") {
    val dir = newTable()
    val before = TableManifest.read(spark, dir).get._2.toSet
    // keys 1-3 live in exactly one range-clustered file
    TableManifest.mergeByKey(spark, dir, "k",
      Seq((1L, "U1", 111L)).toDF("k", "s", "w"))
    val after = TableManifest.read(spark, dir).get._2.toSet
    val untouched = before.intersect(after)
    assert(untouched.size == 2,
      s"only the file holding key 1 is rewritten: $before -> $after")
    assert((after -- before).size == 1, "one replacement file spliced in")
  }

  test("insert-only merge appends without rewriting anything") {
    val dir = newTable()
    val before = TableManifest.read(spark, dir).get._2.toSet
    TableManifest.mergeByKey(spark, dir, "k",
      Seq((100L, "N", 1L)).toDF("k", "s", "w"))
    val after = TableManifest.read(spark, dir).get._2.toSet
    assert(before.subsetOf(after), "no victim: pure append")
    assert((after -- before).size == 1)
    assert(rows(dir).length == 10)
  }

  test("re-running the same merge converges (idempotent crash retry)") {
    val dir = newTable()
    val src = Seq((2L, "U2", 222L), (11L, "N11", 1100L)).toDF("k", "s", "w")
    TableManifest.mergeByKey(spark, dir, "k", src)
    val once = rows(dir)
    TableManifest.mergeByKey(spark, dir, "k", src)
    assert(rows(dir) == once, "second identical merge changes nothing")
  }

  test("NULL-key target rows match nothing and survive every merge") {
    val dir = tmpDir("nulls")
    Seq((Some(1L), "a"), (None, "orphan"), (Some(2L), "b"))
      .toDF("k", "s").write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.mergeByKey(spark, dir, "k",
      Seq((Some(1L), "A"), (Some(3L), "C")).toDF("k", "s"))
    val got = TableManifest.readTable(spark, dir).as[(Option[Long], String)]
      .collect().toSeq.sortBy(r => (r._1.getOrElse(Long.MaxValue), r._2))
    assert(got == Seq((Some(1L), "A"), (Some(2L), "b"), (Some(3L), "C"),
      (None, "orphan")))
  }

  test("works without committed stats (conservative candidates, exact victims)") {
    val dir = newTable(analyze = false)
    val before = TableManifest.read(spark, dir).get._2.toSet
    TableManifest.mergeByKey(spark, dir, "k",
      Seq((9L, "U9", 999L)).toDF("k", "s", "w"))
    val after = TableManifest.read(spark, dir).get._2.toSet
    // no stats -> every file is a candidate, but the victim JOIN still
    // confines the rewrite to the one file holding key 9
    assert(before.intersect(after).size == 2,
      s"victim join prunes without stats: $before -> $after")
    assert(rows(dir).contains((9L, "U9", 999L)))
  }

  test("STRING keys merge correctly (no stats fast path, victim join still exact)") {
    val dir = tmpDir("strkey")
    Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "w")
      .repartition(2).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val v0 = TableManifest.read(spark, dir).get._1
    TableManifest.mergeByKey(spark, dir, "id",
      Seq(("b", 222L), ("d", 4L)).toDF("id", "w"))
    assert(TableManifest.read(spark, dir).get._1 > v0,
      "a string-keyed merge must COMMIT, not silently no-op")
    val got = TableManifest.readTable(spark, dir).as[(String, Long)]
      .collect().toSeq.sorted
    assert(got == Seq(("a", 1L), ("b", 222L), ("c", 3L), ("d", 4L)))
  }

  test("empty source is a no-op: head version unchanged") {
    val dir = newTable()
    val v0 = TableManifest.read(spark, dir).get._1
    TableManifest.mergeByKey(spark, dir, "k",
      Seq.empty[(Long, String, Long)].toDF("k", "s", "w"))
    assert(TableManifest.read(spark, dir).get._1 == v0)
  }

  test("contract violations are loud: dup keys, null keys, schema drift, untracked dir") {
    val dir = newTable()
    val dup = intercept[IllegalArgumentException] {
      TableManifest.mergeByKey(spark, dir, "k",
        Seq((2L, "a", 1L), (2L, "b", 2L)).toDF("k", "s", "w"))
    }
    assert(dup.getMessage.contains("duplicate"))
    val nul = intercept[IllegalArgumentException] {
      TableManifest.mergeByKey(spark, dir, "k",
        Seq((Some(2L), "a", 1L), (None, "b", 2L)).toDF("k", "s", "w"))
    }
    assert(nul.getMessage.contains("NULL"))
    val schema = intercept[IllegalArgumentException] {
      TableManifest.mergeByKey(spark, dir, "k",
        Seq((2L, "a")).toDF("k", "s"))
    }
    assert(schema.getMessage.contains("schema"))
    intercept[RuntimeException] {
      TableManifest.mergeByKey(spark, tmpDir("untracked"), "k",
        Seq((1L, "a", 1L)).toDF("k", "s", "w"))
    }
  }

  test("merged files are born prunable: fresh key stats ride the same commit") {
    val dir = newTable()
    TableManifest.mergeByKey(spark, dir, "k",
      Seq((5L, "U5", 555L)).toDF("k", "s", "w"))
    // a pruned read for the merged key opens files and still answers right
    val got = TableManifest.readTableRange(spark, dir, "k", 5L, 5L)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((5L, "U5", 555L)))
    // and the rewritten file's stats exclude foreign ranges: a read of
    // 1..3 must not open the 4-6 replacement (same answer either way,
    // but the stats row must exist - readStats carries the new file)
    val stats = TableManifest.readStats(spark, dir)
    val (_, files) = TableManifest.read(spark, dir).get
    assert(files.forall(f => stats.get(f).exists(_.contains("k"))),
      "every live file, including the replacement, carries k stats")
  }
}
