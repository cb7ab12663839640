package graft.ops

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reader-atomicity of the [[TableManifest]] commit protocol, including the
  * judge-style crash-point drills: a reader opened mid-swap must see
  * exactly the old or the new file set, and a crash between the data-file
  * move and the cleanup must recover to a consistent manifest. */
class ManifestSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.load(spark, sfDir, "documents").select("doc_id", "lang", "text")

  private def fingerprint(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(crc32(concat_ws("", col("doc_id"), col("lang"), col("text"))))
        .as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-manifest-$tag").toFile.getAbsolutePath

  private def diskDataFiles(dir: String): Set[String] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet

  test("init pins the current files; readTable matches a plain read") {
    val dir = tmpDir("init")
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val v = TableManifest.init(spark, dir)
    assert(v == 1L)
    assert(TableManifest.init(spark, dir) == 1L, "re-init must be a no-op")
    val (_, files) = TableManifest.read(spark, dir).get
    assert(files.toSet == diskDataFiles(dir))
    assert(fingerprint(TableManifest.readTable(spark, dir)) == fingerprint(docs))
  }

  test("publish is reader-atomic: old snapshot stays complete until vacuum") {
    val dir = tmpDir("publish")
    val v1 = TableManifest.publish(docs.filter(col("lang") === "en"), dir)
    val oldFp = fingerprint(TableManifest.readTable(spark, dir))
    val (rv, oldFiles) = TableManifest.read(spark, dir).get
    assert(rv == v1)

    val v2 = TableManifest.publish(docs.filter(col("lang") === "de"), dir)
    assert(v2 == v1 + 1)
    // new head is exactly the new snapshot ...
    val newFp = fingerprint(TableManifest.readTable(spark, dir))
    assert(newFp == fingerprint(docs.filter(col("lang") === "de")))
    assert(newFp != oldFp)
    // ... while a reader that captured the old head BEFORE the publish can
    // still read every one of its files (nothing deleted at commit time)
    val oldReader = spark.read.parquet(oldFiles.map(f => s"$dir/$f"): _*)
    assert(fingerprint(oldReader) == oldFp)
    // heads never mix snapshots: each version lists only its own files
    assert(oldFiles.toSet.intersect(
      TableManifest.read(spark, dir).get._2.toSet).isEmpty)

    // vacuum reclaims exactly the unlisted data files; head unaffected
    val deleted = TableManifest.vacuum(spark, dir)
    assert(oldFiles.forall(deleted.contains))
    assert(diskDataFiles(dir) == TableManifest.read(spark, dir).get._2.toSet)
    assert(fingerprint(TableManifest.readTable(spark, dir)) == newFp)
  }

  test("crash before the manifest rename publishes nothing") {
    val dir = tmpDir("crash-precommit")
    TableManifest.publish(docs.limit(100), dir)
    val before = TableManifest.read(spark, dir).get

    // simulate a publisher that crashed after moving data files in but
    // before the commit rename: drop extra snap- files + a stale tmp dir
    val extra = tmpDir("crash-extra")
    docs.limit(7).coalesce(1).write.mode("overwrite").parquet(extra)
    new java.io.File(extra).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach { f =>
        Files.copy(f.toPath,
          new java.io.File(dir, s"snap-dead-${f.getName}").toPath)
      }
    new java.io.File(dir, "_publish_tmp-dead").mkdirs()
    new java.io.File(new java.io.File(dir, "_manifest"), ".tmp-dead")
      .createNewFile()

    // recovery view: the head is unchanged and reads cleanly
    assert(TableManifest.read(spark, dir).get == before)
    assert(fingerprint(TableManifest.readTable(spark, dir)) ==
      fingerprint(docs.limit(100)))
    // vacuum clears the dead publisher's debris
    val deleted = TableManifest.vacuum(spark, dir)
    assert(deleted.exists(_.startsWith("snap-dead-")))
    assert(deleted.contains("_publish_tmp-dead"))
    assert(deleted.contains(".tmp-dead"))
    assert(diskDataFiles(dir) == before._2.toSet)
  }

  test("tracked compaction commits atomically and leaves fragments for vacuum") {
    val dir = tmpDir("compact")
    docs.repartition(32).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val fragments = TableManifest.read(spark, dir).get._2.toSet
    val expected = fingerprint(docs)

    val stats = Compaction.compactInPlace(spark, dir,
      targetBytes = 1L << 30, minFileBytes = 1L << 30)
    assert(stats.filesBefore == 32 && stats.filesAfter == 1, s"$stats")
    // commit point passed: head lists exactly the compacted output
    val (v, head) = TableManifest.read(spark, dir).get
    assert(v == 2L && head.size == 1 && head.head.startsWith("compacted-"))
    assert(fingerprint(TableManifest.readTable(spark, dir)) == expected)
    // crash window between commit and cleanup: fragments still on disk, so
    // an old-head reader stays whole ...
    assert(fragments.subsetOf(diskDataFiles(dir)))
    assert(fingerprint(
      spark.read.parquet(fragments.map(f => s"$dir/$f").toSeq: _*)) == expected)
    // ... and recovery is just vacuum
    TableManifest.vacuum(spark, dir)
    assert(diskDataFiles(dir) == head.toSet)
    assert(fingerprint(TableManifest.readTable(spark, dir)) == expected)
  }

  test("untracked compaction still uses the legacy delete-after-move swap") {
    val dir = tmpDir("untracked")
    docs.repartition(8).write.mode("overwrite").parquet(dir)
    val stats = Compaction.compactInPlace(spark, dir,
      targetBytes = 1L << 30, minFileBytes = 1L << 30)
    assert(stats.filesAfter == 1)
    assert(diskDataFiles(dir).size == 1, "fragments deleted inline when untracked")
    assert(TableManifest.read(spark, dir).isEmpty)
  }

  test("scd2 diff-then-publish loop commits whole snapshots") {
    import spark.implicits._
    val dir = tmpDir("scd2")
    val changes1 = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "x"))
      .toDF("key", "ts", "payload")
    TableManifest.publish(Merge.scd2(changes1, Seq("key"), "ts"), dir)
    val snap1 = TableManifest.readTable(spark, dir)
    assert(snap1.count() == 3)
    assert(snap1.filter(col("valid_to").isNull).count() == 2)

    val changes2 = changes1.unionAll(Seq((2L, 30L, "y")).toDF("key", "ts", "payload"))
    TableManifest.publish(Merge.scd2(changes2, Seq("key"), "ts"), dir)
    val snap2 = TableManifest.readTable(spark, dir)
    assert(snap2.count() == 4)
    // key 2's old current version got closed in the new snapshot
    assert(snap2.filter(col("key") === 2 && col("valid_to").isNotNull).count() == 1)
  }

  test("time travel reads any retained version; addedBetween is per-commit CDC") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tt").toString
    // three append commits via the streaming sink's applyBatch
    graft.streaming.ManifestAppendSink.applyBatch(Seq(1L, 2L).toDF("v"), 0L, dir)
    graft.streaming.ManifestAppendSink.applyBatch(Seq(3L).toDF("v"), 1L, dir)
    graft.streaming.ManifestAppendSink.applyBatch(Seq(4L, 5L).toDF("v"), 2L, dir)

    def vals(df: DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).sorted.toSeq
    assert(vals(TableManifest.readTableAt(spark, dir, 1L)) == Seq(1L, 2L))
    assert(vals(TableManifest.readTableAt(spark, dir, 2L)) == Seq(1L, 2L, 3L))
    assert(vals(TableManifest.readTableAt(spark, dir, 3L)) == Seq(1L, 2L, 3L, 4L, 5L))
    // CDC: exactly the rows the middle commit added
    assert(vals(TableManifest.addedBetween(spark, dir, 1L, 2L)) == Seq(3L))
    assert(vals(TableManifest.addedBetween(spark, dir, 1L, 3L)) == Seq(3L, 4L, 5L))
    assert(TableManifest.addedBetween(spark, dir, 2L, 2L).isEmpty,
      "empty range adds nothing")
    // vacuum keeps history readable: append-only tables have no dead files
    TableManifest.vacuum(spark, dir)
    assert(vals(TableManifest.readTableAt(spark, dir, 1L)) == Seq(1L, 2L),
      "old versions of an append-only table survive vacuum")
  }

  test("commitIf is compare-and-swap: a commit landing in between forces a retry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cas").toString
    Seq(1L).toDF("v").write.mode("overwrite").parquet(dir)
    val v1 = TableManifest.init(spark, dir)
    val head = TableManifest.read(spark, dir).get
    // another committer lands between our read and our commit
    TableManifest.commit(spark, dir, head._2 :+ "extra-a.parquet")
    // stale CAS must fail rather than silently dropping extra-a
    assert(TableManifest.commitIf(spark, dir, head._2 :+ "extra-b.parquet",
      expectedHead = head._1).isEmpty, "stale CAS must be rejected")
    // fresh CAS succeeds and composes both writers' files
    val fresh = TableManifest.read(spark, dir).get
    val v = TableManifest.commitIf(spark, dir, fresh._2 :+ "extra-b.parquet",
      expectedHead = fresh._1)
    assert(v.contains(fresh._1 + 1))
    val files = TableManifest.read(spark, dir).get._2
    assert(files.contains("extra-a.parquet") && files.contains("extra-b.parquet"),
      s"both concurrent additions must survive: $files")
    assert(v1 == 1L)
  }

  test("publish racing a streaming append never rolls back the hwm") {
    import spark.implicits._
    // The round-8 ADVICE race: publish used to read the hwm ONCE and then
    // retry its commit against a refreshed head — an append landing between
    // that read and the winning commit had its high-water rolled back, so a
    // checkpoint replay double-appended. The drill races the two committers
    // repeatedly; whenever the append wins the contended version, a
    // stale-hwm publish would commit the rollback on its retry.
    val dir = Files.createTempDirectory("graft-hwm-race").toString
    graft.streaming.ManifestAppendSink.applyBatch(Seq(0L).toDF("v"), 0L, dir)
    (1L to 8L).foreach { i =>
      val gate = new java.util.concurrent.CountDownLatch(1)
      val publisher = new Thread(() => {
        gate.await()
        TableManifest.publish(Seq(-i).toDF("v"), dir)
      })
      val appender = new Thread(() => {
        gate.await()
        graft.streaming.ManifestAppendSink.applyBatch(Seq(i).toDF("v"), i, dir)
      })
      publisher.start(); appender.start()
      gate.countDown()
      publisher.join(); appender.join()
      assert(graft.streaming.ManifestAppendSink
        .committedBatchHighWater(spark, dir) == i,
        s"hwm rolled back at batch $i")
      // checkpoint replay of the same batch id must still no-op
      val before = TableManifest.readTable(spark, dir).count()
      graft.streaming.ManifestAppendSink.applyBatch(Seq(i).toDF("v"), i, dir)
      assert(TableManifest.readTable(spark, dir).count() == before,
        s"replayed batch $i double-appended")
    }
  }

  test("vacuum grace gates on dereference time, not file mtime") {
    val dir = tmpDir("deref")
    docs.limit(200).repartition(4).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val preHead = TableManifest.read(spark, dir).get._2.toSet
    Compaction.compactInPlace(spark, dir, 1L << 30, 1L << 30)
    val dead = preHead -- TableManifest.read(spark, dir).get._2.toSet
    assert(dead.size == 4, s"fragments replaced: $dead")
    // the fragments' BYTES are days old — but their delisting commit just
    // happened, and a reader that resolved the pre-compaction head may
    // still be scanning them. An mtime-only gate would reclaim them now.
    val old = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
    dead.foreach(n => new java.io.File(dir, n).setLastModified(old))
    val grace = 3600L * 1000
    val gone1 = TableManifest.vacuum(spark, dir, graceMillis = grace)
    assert(gone1.toSet.intersect(dead).isEmpty,
      s"vacuum reclaimed just-delisted files under grace: $gone1")
    assert(diskDataFiles(dir).intersect(dead) == dead,
      "pre-compaction readers keep a complete file set")
    // once the delisting itself is older than the grace, the same call
    // reclaims — age every manifest to simulate the next nightly run
    new java.io.File(dir, "_manifest").listFiles
      .foreach(f => f.setLastModified(old))
    val gone2 = TableManifest.vacuum(spark, dir, graceMillis = grace)
    assert(dead.subsetOf(gone2.toSet), s"aged delisting reclaimed: $gone2")
    assert(diskDataFiles(dir).intersect(dead).isEmpty)
  }

  test("vacuum keeps delisted files whose listers retention already pruned") {
    val dir = tmpDir("deref2")
    docs.limit(50).coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // v1 lists the original file
    val original = TableManifest.read(spark, dir).get._2.toSet
    (1 to 7).foreach(_ => TableManifest.publish(docs.limit(10), dir))
    // prune the manifest history down to the 2 newest versions while the
    // original file's bytes are still young (mtime gate keeps it)
    TableManifest.vacuum(spark, dir, graceMillis = 3600L * 1000,
      retainManifests = 2)
    assert(diskDataFiles(dir).intersect(original) == original)
    // now its bytes are old, but its lister (v1) and delisting commit
    // (v2) are both pruned — the delist time is unknowable and could be
    // inside the grace, so a graced vacuum must keep it...
    val old = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
    original.foreach(n => new java.io.File(dir, n).setLastModified(old))
    val gone = TableManifest.vacuum(spark, dir, graceMillis = 3600L * 1000)
    assert(gone.toSet.intersect(original).isEmpty,
      s"unprovable delist time reclaimed under grace: $gone")
    // ...and an explicit grace-0 maintenance pass still reclaims it
    val gone0 = TableManifest.vacuum(spark, dir, graceMillis = 0L)
    assert(original.subsetOf(gone0.toSet), s"grace-0 reclaim: $gone0")
  }

  test("concurrent publishers: head is always one complete snapshot") {
    val dir = tmpDir("race")
    TableManifest.publish(docs.limit(10), dir)
    val langs = Seq("en", "de", "fr", "es")
    val fps = langs.map(l => l -> fingerprint(docs.filter(col("lang") === l))).toMap
    val threads = langs.map { l =>
      new Thread(() =>
        TableManifest.publish(docs.filter(col("lang") === l), dir))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // all four committed distinct versions (none silently lost) ...
    val (v, _) = TableManifest.read(spark, dir).get
    assert(v == 5L, s"expected 4 commits after v1, head is v$v")
    // ... and the head is exactly one publisher's snapshot, never a blend
    val headFp = fingerprint(TableManifest.readTable(spark, dir))
    assert(fps.values.toSet.contains(headFp), s"head $headFp not a whole snapshot")
  }

  test("vacuum protects in-flight sql-insert files within the floor, reclaims stale orphans") {
    val dir = tmpDir("sql-floor")
    TableManifest.publish(docs.limit(10), dir)
    // an unlisted sql-named file inside the rename->commit window (fresh
    // mtime): a SQL INSERT has moved it in but not yet CAS-committed.
    // Unlike append-batch files there is no hwm to clear it, so the age
    // floor alone must protect it even at graceMillis = 0
    val live = new java.io.File(dir, "sql-deadbeef-p0.parquet")
    Files.write(live.toPath, Array[Byte](1, 2, 3))
    val first = TableManifest.vacuum(spark, dir)
    assert(!first.contains("sql-deadbeef-p0.parquet") && live.exists,
      "vacuum reclaimed a possibly-in-flight sql insert file")
    // a crashed insert's orphan past the floor reclaims like any dead file
    assert(live.setLastModified(
      System.currentTimeMillis() - 11L * 60L * 1000L))
    val second = TableManifest.vacuum(spark, dir)
    assert(second.contains("sql-deadbeef-p0.parquet") && !live.exists,
      "a stale sql orphan must reclaim once clearly dead")
  }

  test("init never sweeps protocol-named files: a racing insert's move-in cannot be committed by a conversion") {
    val dir = tmpDir("init-skips")
    docs.limit(5).coalesce(1).write.mode("overwrite").parquet(dir)
    // a racing SQL insert has moved files in but not CAS-committed (or a
    // crashed one left orphans); a streaming append batch likewise. If a
    // concurrent convert-in-place swept these into v1, a crashed writer's
    // PARTIAL move-in would become committed rows.
    Files.write(new java.io.File(dir, "sql-0badcafe-p0.parquet").toPath,
      Array[Byte](9))
    Files.write(new java.io.File(dir, "b7-feedface-p0.parquet").toPath,
      Array[Byte](9))
    TableManifest.init(spark, dir)
    val listed = TableManifest.read(spark, dir).get._2
    assert(listed.nonEmpty && listed.forall(_.startsWith("part-")),
      s"init swept protocol-named in-flight files: $listed")
    assert(TableManifest.readTable(spark, dir).count() == 5L)
  }

  test("history: one ledger row per surviving version; retention prunes honestly") {
    val dir = tmpDir("history")
    docs.limit(30).repartition(2).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)                              // v1: 2 files
    graft.streaming.ManifestAppendSink.applyBatch(
      docs.limit(5).coalesce(1), batchId = 1L, dir)             // v2: +1, hwm 1
    TableManifest.publish(docs.limit(10).coalesce(1), dir)      // v3: replace
    val rows = TableManifest.history(spark, dir).orderBy("version").collect()
    val h = rows
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(h.toSeq == Seq(
      (1L, 2L, 2L, 0L, None),
      (2L, 3L, 1L, 0L, Some(1L)),
      (3L, 1L, 1L, 3L, Some(1L))),
      s"unexpected ledger: ${h.toSeq}")
    // commit timestamps are BODY-recorded wall clocks (never null on
    // fresh manifests) and non-decreasing in version
    val ts = rows.map(_.getTimestamp(1).getTime)
    assert(ts.forall(_ > 0L) && ts.sorted.toSeq == ts.toSeq,
      s"recorded commit times monotone: ${ts.toSeq}")
    // bytes come from the filestat inventory and match the live files
    val head = TableManifest.history(spark, dir)
      .orderBy(org.apache.spark.sql.functions.col("version").desc)
      .head()
    val liveBytes = TableManifest.readHead(spark, dir).get._2
      .map(n => new java.io.File(dir, n).length()).sum
    assert(!head.isNullAt(3) && head.getLong(3) == liveBytes)
    // retention pruning drops rows; deltas recompute vs what survives
    TableManifest.vacuum(spark, dir, retainManifests = 1)
    val afterPrune = TableManifest.history(spark, dir).collect()
    assert(afterPrune.length == 1 && afterPrune.head.getLong(0) == 3L)
    assert(afterPrune.head.getLong(4) == 1L, "delta must be vs surviving history")
  }

  test("snapshot cache: a wiped-and-recreated table at the same path reads fresh") {
    val dir = tmpDir("recreate")
    docs.limit(10).coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    assert(TableManifest.readTable(spark, dir).count() == 10L) // caches v1
    // wipe the WHOLE table (data + _manifest) and rebuild at the same path
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
    docs.limit(3).coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir) // a FRESH v1 under the same (dir, version)
    // the parsed-head cache must not serve the dead table's file list:
    // the key includes the manifest file's length+mtime identity
    assert(TableManifest.readTable(spark, dir).count() == 3L,
      "cache served a wiped table's stale snapshot")
  }
}
