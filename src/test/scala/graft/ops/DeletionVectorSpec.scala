package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Round-17 headline: MERGE-ON-READ row-level DML via deletion vectors.
  *
  * With `spark.graft.dml.deletionVectors=true`, DELETE/UPDATE record
  * matched row POSITIONS in `_dv/` sidecars referenced from the
  * manifest's `dvs` section instead of rewriting whole victim files —
  * a one-row DELETE in a big file costs O(deleted rows) write, not the
  * file. The matrix: reads (library + subset + time travel) apply the
  * bitmap; full-file deletes drop the file; repeat deletes union;
  * UPDATE appends replacements; copy-on-write paths and compaction
  * MATERIALIZE deletions (never resurrect); vacuum reclaims orphaned
  * sidecars; renames compose; streams deliver dv'd ranges row-filtered
  * (round-18 — [[graft.sources]] ManifestStreamDvSpec has the matrix). */
class DeletionVectorSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def withDv[A](f: => A): A = {
    spark.conf.set("spark.graft.dml.deletionVectors", "true")
    // threshold pinned OFF: these tests drive write-once sidecar
    // mechanics on tiny files; DvDensitySpec pins the 0.5 default
    spark.conf.set("spark.graft.dv.materializeThreshold", "1.1")
    try f finally {
      spark.conf.unset("spark.graft.dml.deletionVectors")
      spark.conf.unset("spark.graft.dv.materializeThreshold")
    }
  }

  /** Tracked table (k, v), k = 0..8 over exactly 3 files of known
    * contents: {0,1,2}, {3,4,5}, {6,7,8} (deterministic — never a hash
    * layout guess). */
  private def table3(tag: String): String = {
    val dir = tmpDir(tag)
    (0L until 3L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    (3L until 6L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    (6L until 9L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    dir
  }

  test("DV DELETE marks positions; no file rewrites; every read path serves survivors") {
    val dir = table3("gm-dv-del")
    val filesBefore = TableManifest.read(spark, dir).get._2.toSet
    val v = withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
    assert(v >= 2L)
    assert(TableManifest.read(spark, dir).get._2.toSet == filesBefore,
      "merge-on-read: no data file rewritten or removed")
    val dvs = TableManifest.readDvs(spark, dir)
    assert(dvs.size == 1 && dvs.values.head._2 == 1L,
      s"exactly one position marked: $dvs")
    val got = TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L), s"library read: $got")
    // subset reads apply the bitmap too
    assert(TableManifest.readTableWhereEq(spark, dir, "k", Seq(4L))
      .count() == 0L, "point lookup must not serve the deleted row")
    assert(TableManifest.readTableRange(spark, dir, "k", 3L, 5L)
      .select("k").as[Long].collect().toSeq.sorted == Seq(3L, 5L))
    // time travel: the pre-delete head still serves the row; the dv'd
    // head does not
    assert(TableManifest.readTableAt(spark, dir, v - 1).count() == 9L)
    assert(TableManifest.readTableAt(spark, dir, v).count() == 8L)
  }

  test("a DELETE matching every row of a file removes the FILE, not a dv") {
    val dir = table3("gm-dv-full")
    val before = TableManifest.read(spark, dir).get._2.toSet
    // {3,4,5} is exactly the second file's whole row set
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(3L, 4L, 5L)) }
    val after = TableManifest.read(spark, dir).get._2.toSet
    assert(after.subsetOf(before) && after.size == before.size - 1,
      s"one whole file dropped: ${before.size} -> ${after.size}")
    assert(TableManifest.readDvs(spark, dir).isEmpty,
      "no sidecar debris for a whole-file delete")
    assert(TableManifest.readTable(spark, dir).count() == 6L)
  }

  test("repeat DELETEs union into one sidecar per file") {
    val dir = table3("gm-dv-union")
    withDv {
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(0L))
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L))
    }
    val dvs = TableManifest.readDvs(spark, dir)
    // 0 and 1 share the first file
    assert(dvs.size == 1 && dvs.values.head._2 == 2L,
      s"union of both deletes in one dv: $dvs")
    assert(TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted == Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L))
    // deleting the file's last live row drops the FILE and the dv
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(2L)) }
    assert(TableManifest.readDvs(spark, dir).isEmpty,
      "the union reached every row: file removed, dv gone")
    assert(TableManifest.readTable(spark, dir).count() == 6L)
  }

  test("DV UPDATE appends the updated rows and marks the old positions") {
    val dir = table3("gm-dv-upd")
    val before = TableManifest.read(spark, dir).get._2
    val v = withDv {
      TableManifest.updateWhere(spark, dir,
        Seq("v" -> (col("v") + 1000L)), Some(col("k") === 2L))
    }
    val after = TableManifest.read(spark, dir).get._2
    assert(before.toSet.subsetOf(after.toSet) &&
      after.size == before.size + 1,
      "victims kept (positions dv'd), one appended replacement file")
    assert(TableManifest.readDvs(spark, dir).size == 1)
    val got = TableManifest.readTable(spark, dir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == (0L until 9L).map(k =>
      (k, if (k == 2L) 1020L else k * 10L)).sorted, s"updated view: $got")
    assert(TableManifest.readTableAt(spark, dir, v - 1).count() == 9L)
  }

  test("copy-on-write paths NEVER resurrect dv-deleted rows; the rewrite clears the dv") {
    val dir = table3("gm-dv-cow")
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(5L)) }
    assert(TableManifest.readDvs(spark, dir).size == 1)
    // a COPY-ON-WRITE update (conf off) touching the dv'd FILE (k=4
    // shares it with the deleted k=5): the rewrite must apply the
    // bitmap and the fresh file carries no dv
    TableManifest.updateWhere(spark, dir,
      Seq("v" -> (col("v") + 1L)), Some(col("k") === 4L))
    val got = TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L),
      s"rewrite must not resurrect k=5: $got")
    assert(TableManifest.readDvs(spark, dir).isEmpty,
      "the rewritten victim dropped its dv reference")
  }

  test("compaction materializes deletions and clears the dv section") {
    val dir = table3("gm-dv-compact")
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L, 5L)) }
    assert(TableManifest.readDvs(spark, dir).nonEmpty)
    Compaction.compactInPlace(spark, dir,
      targetBytes = 1L << 20, minFileBytes = 1L << 20)
    assert(TableManifest.readDvs(spark, dir).isEmpty,
      "compaction rewrote the carriers; dv entries dropped")
    assert(TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted == Seq(0L, 2L, 3L, 4L, 6L, 7L, 8L))
  }

  test("vacuum reclaims sidecars no surviving manifest references") {
    val dir = table3("gm-dv-vacuum")
    // every-commit checkpoints: with the default delta chain, the OLD
    // sidecar stays referenced by the retained delta that introduced it
    // (chain-aware retention keeps [chainBase, head]) — which is the
    // CORRECT conservative outcome; re-anchoring is what frees it
    spark.conf.set("spark.graft.manifest.checkpointInterval", "1")
    try {
    withDv {
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(0L))
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L)) // replaces the dv
    }
    val dvDir = new java.io.File(dir, "_dv")
    assert(dvDir.listFiles().count(_.getName.endsWith(".bin")) == 2,
      "both generations on disk before vacuum")
    val live = TableManifest.readDvs(spark, dir).values.head._1
    TableManifest.vacuum(spark, dir, graceMillis = 0L, retainManifests = 1)
    val left = dvDir.listFiles().filter(_.getName.endsWith(".bin"))
      .map(_.getName).toSeq
    assert(left == Seq(live.stripPrefix("_dv/")),
      s"only the referenced sidecar survives: $left vs $live")
    // and the table still reads correctly after the sweep
    assert(TableManifest.readTable(spark, dir).select("k")
      .as[Long].collect().toSeq.sorted ==
      Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L))
    } finally spark.conf.unset("spark.graft.manifest.checkpointInterval")
  }

  test("renames compose: DV DELETE through the renamed column over mixed generations") {
    val dir = tmpDir("gm-dv-ren")
    (0L until 4L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.renameColumn(spark, dir, "v", "w")
    (4L until 8L).map(k => (k, k * 10L)).toDF("k", "w")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    withDv {
      // hits one pre-rename (physical v) and one post-rename file
      TableManifest.eraseWhereRange(spark, dir, "w", 20L, 40L)
    }
    val got = TableManifest.readTable(spark, dir)
      .select("k", "w").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((0L, 0L), (1L, 10L), (5L, 50L), (6L, 60L), (7L, 70L)),
      s"both generations filtered under the logical name: $got")
    assert(TableManifest.readDvs(spark, dir).size == 2,
      "one dv per touched generation")
  }

  test("streams DELIVER dv'd ranges (live rows only); DSv2 batch reads are guarded or correct") {
    val dir = table3("gm-dv-stream")
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L)) }
    // round-18: a dv on a NOT-YET-delivered file no longer refuses —
    // the file streams through a row-index-filtered sub-batch serving
    // exactly its live rows (ManifestStreamDvSpec drives the matrix)
    val name = s"dvstream${java.util.UUID.randomUUID().toString.take(6)}"
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).select("k")
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L),
      s"dv'd range delivered live rows only: $got")
    // DSv2 batch read: with the extensions the read is CORRECT (DvReads
    // splice), without them the toBatch guard is LOUD — never stale rows
    (try Right(spark.read.format("graft-manifest").load(dir)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq)
      catch { case ex: Exception => Left(ex) }) match {
      case Right(rows) =>
        assert(rows == Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L), s"rows: $rows")
      case Left(ex) =>
        assert(ex.getMessage.contains("deletion vector"), ex.getMessage)
    }
  }

  test("HIVE-PARTITIONED tables: dv DELETE + UPDATE keep the layout; segment pruning composes") {
    val dir = tmpDir("gm-dv-part")
    // one FILE per partition dir (4 rows each) — the partial-file dv
    // shape; un-repartitioned input would write one-row files and every
    // touched file would be a whole-file delete
    TableManifest.publishPartitioned(
      (0L until 12L).map(k => (k, k * 10L, k % 3)).toDF("k", "v", "b")
        .repartition(3, col("b")),
      dir, Seq("b"))
    val before = TableManifest.read(spark, dir).get._2.toSet
    assert(before.forall(_.startsWith("b=")), s"hive layout: $before")
    withDv {
      // partition-pruned UPDATE through the dv engine
      TableManifest.updateWhere(spark, dir,
        Seq("v" -> (col("v") + 1000L)),
        Some(col("b") === 1L && col("k") === 4L),
        pruneRanges = Seq(("b", 1L, 1L)))
      // then a range DELETE across partitions
      TableManifest.eraseWhereRange(spark, dir, "v", 100L, 110L)
    }
    val after = TableManifest.read(spark, dir).get._2
    assert(after.forall(_.startsWith("b=")),
      s"every file (incl. the update's append) stays under its k=v dir: " +
        after.filterNot(_.startsWith("b=")).mkString(", "))
    // merge-on-read: files are only ever KEPT (dv'd) or REMOVED
    // whole-file — never rewritten in place (publishPartitioned's
    // parallelism decides how many rows share a file, so a fully-dead
    // one-row file legitimately drops)
    assert(TableManifest.readDvs(spark, dir).nonEmpty,
      "at least one partial file carries a dv")
    assert(after.toSet.intersect(before).nonEmpty &&
      after.toSet.diff(before).forall(_.contains("update")),
      s"no victim rewritten: fresh names are the UPDATE's appends only " +
        s"(${after.toSet.diff(before).mkString(", ")})")
    val got = TableManifest.readTable(spark, dir)
      .select("k", "v", "b").as[(Long, Long, Long)].collect().toSeq.sorted
    val want = (0L until 12L).map { k =>
      val v0 = if (k == 4L) k * 10L + 1000L else k * 10L
      (k, v0, k % 3)
    }.filterNot { case (_, v, _) => v >= 100L && v <= 110L }.sorted
    assert(got == want, s"partitioned dv view: $got")
    // partition-pruned read still composes with the bitmaps
    assert(TableManifest.readTable(spark, dir).filter(col("b") === 1L)
      .count() == want.count(_._3 == 1L))
  }

  test("DV MERGE marks matched keys and appends the source; unmatched keys are pure appends") {
    val dir = table3("gm-dv-merge")
    val before = TableManifest.read(spark, dir).get._2.toSet
    // upsert: k=4 replaced (lives in file2), k=100 inserted
    val batch = Seq((4L, 4444L), (100L, 1000L)).toDF("k", "v")
      .coalesce(1).localCheckpoint()
    val v = withDv { TableManifest.mergeByKey(spark, dir, "k", batch) }
    assert(v >= 2L)
    val after = TableManifest.read(spark, dir).get._2.toSet
    assert(before.subsetOf(after), "merge-on-read: no victim rewritten")
    assert(TableManifest.readDvs(spark, dir).size == 1,
      "the matched key's file carries the dv")
    val got = TableManifest.readTable(spark, dir)
      .as[(Long, Long)].collect().toSeq.sorted
    val want = ((0L until 9L).filterNot(_ == 4L).map(k => (k, k * 10L)) ++
      Seq((4L, 4444L), (100L, 1000L))).sorted
    assert(got == want, s"upsert view: $got")
    // a batch matching NOTHING is a pure append, zero new dvs
    val batch2 = Seq((200L, 2000L)).toDF("k", "v")
      .coalesce(1).localCheckpoint()
    withDv { TableManifest.mergeByKey(spark, dir, "k", batch2) }
    assert(TableManifest.readDvs(spark, dir).size == 1)
    assert(TableManifest.readTable(spark, dir).count() == 11L)
  }

  test("restore refuses a version whose dv sidecars were reclaimed; cold copies re-resolve dvs") {
    val dir = table3("gm-dv-restore")
    spark.conf.set("spark.graft.manifest.checkpointInterval", "1")
    try {
      val vDel = withDv {
        TableManifest.eraseWhereEq(spark, dir, "k", Seq(4L))
      }
      // a COLD COPY re-resolves the dvs section and sidecars from disk
      val cold = tmpDir("gm-dv-cold-dst")
      def copyTree(from: java.io.File, to: java.io.File): Unit = {
        to.mkdirs()
        from.listFiles().foreach { f =>
          val t = new java.io.File(to, f.getName)
          if (f.isDirectory) copyTree(f, t)
          else java.nio.file.Files.copy(f.toPath, t.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
      copyTree(new java.io.File(dir), new java.io.File(cold))
      assert(TableManifest.readTable(spark, cold).select("k")
        .as[Long].collect().toSeq.sorted ==
        Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L),
        "cold replay applies the dv from disk alone")
      // materialize away the dv (head no longer references it), then
      // LOSE the sidecar out-of-protocol (vacuum never reclaims a
      // referenced one — this models a partial backup / manual rm): a
      // RESTORE back to the dv'd version must refuse UP FRONT, never
      // FileNotFound mid-scan after committing
      Compaction.compactInPlace(spark, dir,
        targetBytes = 1L << 20, minFileBytes = 1L << 20)
      new java.io.File(dir, "_dv").listFiles()
        .filter(_.getName.endsWith(".bin")).foreach(_.delete())
      val e = intercept[Exception] {
        TableManifest.restore(spark, dir, vDel)
      }
      assert(e.getMessage.contains("deletion-vector sidecars"),
        e.getMessage)
    } finally spark.conf.unset("spark.graft.manifest.checkpointInterval")
  }

  test("provider time travel resolves each version's own dvs") {
    val s = graft.TestSessions.withExtensions
    graft.TestSessions.withExtensionsActive { _ =>
      val dir = tmpDir("gm-dv-tt")
      import s.implicits._
      (0L until 6L).map(k => (k, k * 10L)).toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      TableManifest.init(s, dir) // v1
      s.conf.set("spark.graft.dml.deletionVectors", "true")
      val vDel =
        try TableManifest.eraseWhereEq(s, dir, "k", Seq(2L))
        finally s.conf.unset("spark.graft.dml.deletionVectors")
      // versionAsOf BEFORE the delete serves the row; AT it does not —
      // both through the DSv2 provider (DvReads owns the dv'd version)
      assert(s.read.format("graft-manifest")
        .option("versionAsOf", vDel - 1).load(dir).count() == 6L)
      assert(s.read.format("graft-manifest")
        .option("versionAsOf", vDel).load(dir)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L, 3L, 4L, 5L))
    }
  }

  test("SQL DELETE and UPDATE honor the conf through the graft session") {
    val s = graft.TestSessions.withExtensions
    graft.TestSessions.withExtensionsActive { _ =>
      val dir = tmpDir("gm-dv-sql")
      import s.implicits._
      (0L until 5L).map(k => (k, k * 10L)).toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      TableManifest.init(s, dir)
      (5L until 9L).map(k => (k, k * 10L)).toDF("k", "v")
        .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
      val tbl = s"gdv_${java.util.UUID.randomUUID().toString.take(8)}"
      s.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
      s.conf.set("spark.graft.dml.deletionVectors", "true")
      try {
        val before = TableManifest.read(s, dir).get._2.toSet
        s.sql(s"DELETE FROM $tbl WHERE k = 4")
        assert(TableManifest.read(s, dir).get._2.toSet == before,
          "SQL DELETE took the merge-on-read path")
        assert(TableManifest.readDvs(s, dir).size == 1)
        s.sql(s"UPDATE $tbl SET v = v + 1000 WHERE k = 2")
        val got = s.sql(s"SELECT k, v FROM $tbl ORDER BY k").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == Seq((0L, 0L), (1L, 10L), (2L, 1020L), (3L, 30L),
          (5L, 50L), (6L, 60L), (7L, 70L), (8L, 80L)), s"SQL view: $got")
      } finally {
        s.conf.unset("spark.graft.dml.deletionVectors")
        s.sql(s"DROP TABLE $tbl")
      }
    }
  }

  test("ALTER COLUMN TYPE widening composes with deletion vectors") {
    import org.apache.spark.sql.types.LongType
    val dir = tmpDir("gm-dv-widen")
    // INT columns: the dv'd footer stays int32 after the widen, so the
    // dv read path (V1 + row_index + bitmap) must serve it through
    // Spark's parquet type promotion under the widened read schema
    (0 until 3).map(k => (k, k * 10)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    (3 until 6).map(k => (k, k * 10)).toDF("k", "v")
      .coalesce(1).write.format("graft-manifest").mode("append").save(dir)
    TableManifest.analyze(spark, dir, Seq("k"))
    val preWiden = withDv {
      TableManifest.eraseWhereEq(spark, dir, "k", Seq(1L))
    }
    assert(TableManifest.readDvs(spark, dir).size == 1)
    TableManifest.widenColumnType(spark, dir, "k", LongType)
    val t = TableManifest.readTable(spark, dir)
    assert(t.schema("k").dataType == LongType, t.schema.treeString)
    assert(t.select("k").as[Long].collect().sorted.toSeq ==
      Seq(0L, 2L, 3L, 4L, 5L), "widened read still hides the dv'd row")
    // a NEW dv delete under the widened schema unions into the same
    // file's sidecar (positions bind by file identity, not schema era)
    withDv { TableManifest.eraseWhereEq(spark, dir, "k", Seq(2L)) }
    assert(TableManifest.readDvs(spark, dir).values.map(_._2).sum == 2L)
    assert(TableManifest.readTable(spark, dir).select("k").as[Long]
      .collect().sorted.toSeq == Seq(0L, 3L, 4L, 5L))
    // time travel to the pre-widen version: its own (int) schema, its
    // own dv state — k=1 already hidden, k=2 still live
    val tt = TableManifest.readTableAt(spark, dir, preWiden)
    assert(tt.schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType, tt.schema.treeString)
    assert(tt.select("k").as[Int].collect().sorted.toSeq ==
      Seq(0, 2, 3, 4, 5))
  }
}
