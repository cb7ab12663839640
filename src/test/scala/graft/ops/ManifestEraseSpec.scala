package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Targeted erase ([[TableManifest.eraseWhereEq]]/[[TableManifest.eraseWhereIn]]):
  * only files whose committed metadata can hold a target key are rewritten,
  * untouched files keep their identity (name AND bytes), NULL keys survive,
  * the streaming hwm survives, prior versions still time-travel to the
  * erased rows, and vacuum completes the physical purge.
  */
class ManifestEraseSpec extends SparkSpec {
  import spark.implicits._

  /** Tracked table of one single-file commit per range of `k`. */
  private def rangedTable(ranges: Seq[(Long, Long)]): (String, Seq[String]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-erase").toString
    ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
      graft.streaming.ManifestAppendSink.applyBatch(
        (lo to hi).toDF("k").coalesce(1), i.toLong, dir)
    }
    (dir, TableManifest.read(spark, dir).get._2.sorted)
  }

  test("eraseWhereEq rewrites only stat-candidate files; identity, hwm, " +
    "and time travel preserved") {
    val (dir, files) = rangedTable(Seq((1L, 100L), (101L, 200L), (201L, 300L)))
    TableManifest.analyze(spark, dir, Seq("k"))
    val (v0, files0, hwm0) = TableManifest.readHead(spark, dir).get

    val v1 = TableManifest.eraseWhereEq(spark, dir, "k", Seq(150L, 160L))
    assert(v1 > v0)
    val (_, files1, hwm1) = TableManifest.readHead(spark, dir).get
    assert(hwm1 == hwm0, "streaming high-water must survive an erase")

    // exactly the one file whose [101,200] range admits the keys rewritten
    val untouched = files.filter(f => !f.isEmpty) // all three original names
    val survivors = files1.toSet.intersect(untouched.toSet)
    assert(survivors == Set(files.head, files.last),
      s"files 1 and 3 must keep their identity: $files1")
    assert(files1.size == 3, "one replacement file spliced in")

    val got = TableManifest.readTable(spark, dir)
    assert(got.count() == 298)
    assert(got.filter(col("k").isin(150L, 160L)).count() == 0)

    // rewritten file carries fresh min/max in the SAME commit
    val newFile = (files1.toSet -- survivors).head
    assert(TableManifest.readStats(spark, dir)(newFile)("k") == ((101L, 200L)))

    // prior version still lists the old bytes — logical erase only
    assert(TableManifest.readTableAt(spark, dir, v0).count() == 300)

    // vacuum completes the physical purge of the delisted victim
    val victim = (files0.toSet -- files1.toSet).head
    val deleted = TableManifest.vacuum(spark, dir)
    assert(deleted.contains(victim), s"vacuum must reclaim $victim: $deleted")
  }

  test("bloom narrows victims past overlapping ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-erase-b").toString
    // two files with FULLY overlapping [1,200] ranges: range stats cannot
    // discriminate, the bloom can
    graft.streaming.ManifestAppendSink.applyBatch(
      (1L to 200L by 2).toDF("k").coalesce(1), 0L, dir) // odds
    graft.streaming.ManifestAppendSink.applyBatch(
      (2L to 200L by 2).toDF("k").coalesce(1), 1L, dir) // evens
    TableManifest.analyze(spark, dir, Seq("k"))
    TableManifest.analyzeBloom(spark, dir, "k")
    val before = TableManifest.read(spark, dir).get._2.toSet

    TableManifest.eraseWhereEq(spark, dir, "k", Seq(2L))
    val after = TableManifest.read(spark, dir).get._2.toSet
    // the odds file survives untouched: its bloom rejects key 2
    val oddsFile = before.find(_.startsWith("b0-")).get
    assert(after.contains(oddsFile),
      s"bloom must spare the odds file: before=$before after=$after")
    val got = TableManifest.readTable(spark, dir)
    assert(got.count() == 199 &&
      got.filter(col("k") === 2L).count() == 0)
  }

  test("NULL keys survive; no-candidate erase is a version no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-erase-n").toString
    val rows = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "keep-null"), (3L, "c"))
    graft.streaming.ManifestAppendSink.applyBatch(
      rows.toDF("k", "v").coalesce(1), 0L, dir)
    TableManifest.analyze(spark, dir, Seq("k"))

    TableManifest.eraseWhereEq(spark, dir, "k", Seq(2L))
    val got = TableManifest.readTable(spark, dir).orderBy("v")
      .select("v").as[String].collect().toSeq
    assert(got == Seq("a", "c", "keep-null"))

    // min/max [1,3] excludes 999 — zero victims, head version unchanged
    val v = TableManifest.read(spark, dir).get._1
    assert(TableManifest.eraseWhereEq(spark, dir, "k", Seq(999L)) == v)
  }

  test("replaceWhereEq: backfill swaps the slice, preserves co-located " +
    "rows, idempotent on re-run, appends when no file holds the value") {
    val dir = java.nio.file.Files.createTempDirectory("graft-repl").toString
    // file 0 holds days 1 and 2 interleaved; file 1 holds day 3
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((1L, 10L), (2L, 20L), (1L, 11L), (2L, 21L))
        .toDF("day", "v").coalesce(1), 0L, dir)
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((3L, 30L)).toDF("day", "v").coalesce(1), 1L, dir)
    TableManifest.analyze(spark, dir, Seq("day"))
    val before = TableManifest.read(spark, dir).get._2.toSet

    val fixed = Seq((1L, 110L), (1L, 111L), (1L, 112L)).toDF("day", "v")
    TableManifest.replaceWhereEq(spark, dir, "day", 1L, fixed)
    val after1 = TableManifest.read(spark, dir).get._2.toSet
    // the day-3 file's range excludes 1 — identity preserved
    val day3File = before.find(_.startsWith("b1-")).get
    assert(after1.contains(day3File), s"day-3 file must survive: $after1")
    def rows() = TableManifest.readTable(spark, dir)
      .orderBy("v").select("day", "v").as[(Long, Long)].collect().toSeq
    val want = Seq((2L, 20L), (2L, 21L), (3L, 30L),
      (1L, 110L), (1L, 111L), (1L, 112L))
    assert(rows() == want, s"slice swapped, day-2 rows preserved: ${rows()}")

    // idempotent: the same backfill re-run converges to the same contents
    TableManifest.replaceWhereEq(spark, dir, "day", 1L, fixed)
    assert(rows() == want, s"re-run must converge: ${rows()}")

    // fresh value no file can hold: pure append
    TableManifest.replaceWhereEq(spark, dir, "day", 9L,
      Seq((9L, 90L)).toDF("day", "v"))
    assert(rows() == Seq((2L, 20L), (2L, 21L), (3L, 30L), (9L, 90L),
      (1L, 110L), (1L, 111L), (1L, 112L)))

    // stray rows outside the slice fail loudly before any write
    intercept[IllegalArgumentException] {
      TableManifest.replaceWhereEq(spark, dir, "day", 1L,
        Seq((1L, 1L), (2L, 2L)).toDF("day", "v"))
    }

    // a misspelled data column fails loudly instead of silently NULLing
    // the real one and leaking a stray column
    intercept[IllegalArgumentException] {
      TableManifest.replaceWhereEq(spark, dir, "day", 1L,
        Seq((1L, 1L)).toDF("day", "vv"))
    }
  }

  test("diffRows/diffVersions: multiset deltas, identical versions empty, " +
    "schema evolution NULL-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-diff").toString
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((1L, 10L), (1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), 0L, dir)
    val v1 = TableManifest.read(spark, dir).get._1
    // v2: one copy of (1,10) dropped, (3,30) added under an EVOLVED schema
    TableManifest.publish(
      Seq[(Long, Long, java.lang.Long)]((1L, 10L, null), (2L, 20L, null),
        (3L, 30L, 5L)).toDF("k", "v", "extra"), dir)
    val v2 = TableManifest.read(spark, dir).get._1

    val d = TableManifest.diffRows(spark, dir, v1, v2)
      .orderBy("k", "delta").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"),
        Option(r.getAs[java.lang.Long]("extra")), r.getAs[Long]("delta")))
    assert(d.toSeq == Seq((1L, 10L, None, -1L), (3L, 30L, Some(5L), 1L)),
      s"got ${d.toSeq}")
    val sum = TableManifest.diffVersions(spark, dir, v1, v2).head()
    assert((sum.getLong(0), sum.getLong(1), sum.getLong(2)) == ((1L, 1L, 2L)))

    // identical versions (v2 vs itself): empty diff, zero summary
    assert(TableManifest.diffRows(spark, dir, v2, v2).count() == 0)
    val z = TableManifest.diffVersions(spark, dir, v2, v2).head()
    assert((z.getLong(0), z.getLong(1), z.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("diffRows prunes to the delta file set: appends diff exactly and a " +
    "dv change on a COMMON file is never cancelled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-diffprune").toString
    // v1: two files, carried schema (publish commits it); enough rows per
    // file that a one-row erase stays UNDER the dv materialize threshold
    TableManifest.publish(
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "v").repartition(2), dir)
    val v1 = TableManifest.read(spark, dir).get._1
    // v2: append-only commit — both v1 files survive untouched, so the
    // pruned diff scans ONLY the appended file on the new side and an
    // empty list on the old side
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((40L, 400L)).toDF("k", "v").coalesce(1), 0L, dir)
    val v2 = TableManifest.read(spark, dir).get._1
    val d12 = TableManifest.diffRows(spark, dir, v1, v2)
      .orderBy("k").select("k", "v", "delta").as[(Long, Long, Long)]
      .collect().toSeq
    assert(d12 == Seq((40L, 400L, 1L)), s"append-only delta: $d12")

    // v3: a merge-on-read DELETE — the victim file stays LISTED at both
    // versions but carries a dv at v3, so it must not cancel: the diff
    // sees the deleted row leave
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    try TableManifest.eraseWhereEq(spark, dir, "k", Seq(2L))
    finally spark.conf.unset("spark.graft.dml.deletionVectors")
    val v3 = TableManifest.read(spark, dir).get._1
    assert(TableManifest.readDvs(spark, dir).nonEmpty,
      "fixture: the erase must have taken the dv route")
    val d23 = TableManifest.diffRows(spark, dir, v2, v3)
      .orderBy("k").select("k", "v", "delta").as[(Long, Long, Long)]
      .collect().toSeq
    assert(d23 == Seq((2L, 20L, -1L)), s"dv'd common file must diff: $d23")
    // and the pruned full-range diff agrees with first-principles
    val s13 = TableManifest.diffVersions(spark, dir, v1, v3).head()
    assert((s13.getLong(0), s13.getLong(1), s13.getLong(2)) == ((1L, 1L, 2L)),
      s"v1->v3: one added, one removed, got (${s13.getLong(0)}, " +
        s"${s13.getLong(1)}, ${s13.getLong(2)})")
  }

  test("erase racing a streaming append loses neither the append nor replay") {
    // same interleave drill as the optimize race: the splice commit must
    // keep a mid-erase append's file AND its hwm, or rows vanish and the
    // checkpoint replay is suppressed
    val dir = java.nio.file.Files.createTempDirectory("graft-eracerace").toString
    graft.streaming.ManifestAppendSink.applyBatch(
      (1L to 100L).toDF("k").repartition(4), 0L, dir, statsCols = Seq("k"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1L to 4L).foreach { i =>
      val gate = new java.util.concurrent.CountDownLatch(1)
      def racer(body: => Unit) = {
        val t = new Thread(() => { gate.await(); body })
        t.setUncaughtExceptionHandler((_, e) => errors.add(e))
        t
      }
      val eraser = racer(TableManifest.eraseWhereEq(spark, dir, "k", Seq(i)))
      val appender = racer(graft.streaming.ManifestAppendSink.applyBatch(
        Seq(1000L + i).toDF("k").coalesce(1), i, dir, statsCols = Seq("k")))
      eraser.start(); appender.start()
      gate.countDown()
      eraser.join(); appender.join()
      assert(errors.isEmpty, s"racer threw at round $i: ${errors.peek()}")
      // one key erased, one row appended: the count holds at 100
      assert(TableManifest.readTable(spark, dir).count() == 100L,
        s"row count drifted at round $i")
      assert(graft.streaming.ManifestAppendSink
        .committedBatchHighWater(spark, dir) == i,
        s"hwm rolled back at round $i — replay would double-append")
    }
    val left = TableManifest.readTable(spark, dir)
    assert(left.filter(col("k").isin(1L, 2L, 3L, 4L)).count() == 0)
    assert(left.filter(col("k") > 1000L).count() == 4)
  }

  test("eraseWhereIn erases string-keyed rows with string-stat pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-erase-s").toString
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq(("srcA", 1L), ("srcB", 2L)).toDF("src", "n").coalesce(1), 0L, dir)
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq(("srcY", 3L), ("srcZ", 4L)).toDF("src", "n").coalesce(1), 1L, dir)
    TableManifest.analyze(spark, dir, Seq("src"))
    val before = TableManifest.read(spark, dir).get._2.toSet

    TableManifest.eraseWhereIn(spark, dir, "src", Seq("srcB"))
    val after = TableManifest.read(spark, dir).get._2.toSet
    // the [srcY, srcZ] file's string range excludes srcB — untouched
    val yzFile = before.find(_.startsWith("b1-")).get
    assert(after.contains(yzFile), s"string stats must spare $yzFile")
    assert(TableManifest.readTable(spark, dir).orderBy("n")
      .select("src").as[String].collect().toSeq == Seq("srcA", "srcY", "srcZ"))
  }
}
