package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

/** Round 16: metadata-only `ALTER TABLE … RENAME COLUMN` via the
  * manifest column mapping — mixed old/new-file reads (library + SQL),
  * filter pushdown through the grouped expansion, chained renames, DML
  * over renamed columns, carrier-set shrinkage through compaction, the
  * rejection matrix, and the loud un-expanded-scan guard. */
class GraftRenameColumnSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSessions.withExtensions
  private def withActive[A](f: => A): A =
    graft.TestSessions.withExtensionsActive(_ => f)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gm-ren-$tag").toString

  private def freshName(tag: String): String =
    s"gren_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  /** A tracked flat table with columns (k BIGINT, v BIGINT, s STRING),
    * rows k = 0..4, v = 10k, then RENAME v → w, then 5 more rows
    * k = 5..9 appended under the new name. */
  private def mixedTable(): String = withActive {
    val dir = tmp("mixed")
    import spark.implicits._
    (0L until 5L).map(k => (k, k * 10L, s"r$k")).toDF("k", "v", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    TableManifest.renameColumn(spark, dir, "v", "w")
    (5L until 10L).map(k => (k, k * 10L, s"r$k")).toDF("k", "w", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    dir
  }

  test("library read serves renamed column across old and new files") {
    val dir = mixedTable()
    withActive {
      val df = TableManifest.readTable(spark, dir)
      assert(df.columns.toSeq.sorted == Seq("k", "s", "w"))
      val rows = df.select("k", "w").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows == (0L until 10L).map(k => (k, k * 10L)).toSeq)
    }
  }

  test("SQL read + filter on the renamed column finds pre-rename rows") {
    val dir = mixedTable()
    val tbl = freshName("sql")
    withActive {
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir')")
      // w=20 lives in a PRE-rename file (physically column v)
      assert(spark.sql(s"SELECT k FROM $tbl WHERE w = 20").collect()
        .map(_.getLong(0)).toSeq == Seq(2L))
      // aggregate over the mix
      assert(spark.sql(s"SELECT CAST(SUM(w) AS BIGINT) FROM $tbl").head()
        .getLong(0) == (0L until 10L).map(_ * 10L).sum)
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("SQL ALTER TABLE RENAME COLUMN routes through the manifest and syncs the catalog") {
    withActive {
      val dir = tmp("alter")
      val tbl = freshName("alter")
      import spark.implicits._
      (0L until 4L).map(k => (k, s"d$k")).toDF("id", "doc")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      TableManifest.init(spark, dir)
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir')")
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN doc TO body")
      assert(TableManifest.readSchema(spark, dir).get.fieldNames.toSeq
        .sorted == Seq("body", "id"))
      assert(TableManifest.readRenames(spark, dir).map(r =>
        (r.to, r.from)) == Seq(("body", "doc")))
      // catalog schema synced: INSERT resolves against the new name
      spark.sql(s"INSERT INTO $tbl VALUES (4, 'd4')")
      assert(spark.sql(s"SELECT body FROM $tbl WHERE id = 1").head()
        .getString(0) == "d1")
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE body = 'd4'")
        .head().getLong(0) == 1L)
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("chained rename a->b->c reads all three file generations") {
    withActive {
      val dir = tmp("chain")
      import spark.implicits._
      Seq((1L, 100L)).toDF("k", "a").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      TableManifest.init(spark, dir)
      TableManifest.renameColumn(spark, dir, "a", "b")
      Seq((2L, 200L)).toDF("k", "b")
        .write.format("graft-manifest").mode("append").save(dir)
      TableManifest.renameColumn(spark, dir, "b", "c")
      Seq((3L, 300L)).toDF("k", "c")
        .write.format("graft-manifest").mode("append").save(dir)
      val rows = TableManifest.readTable(spark, dir).select("k", "c")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows == Seq((1L, 100L), (2L, 200L), (3L, 300L)))
      // two live entries, both mapping to the CURRENT logical name
      assert(TableManifest.readRenames(spark, dir).map(r =>
        (r.to, r.from)).toSet == Set(("c", "a"), ("c", "b")))
    }
  }

  test("rejection matrix: unknown, existing target, partition column, non-identifier") {
    withActive {
      val dir = tmp("rej")
      import spark.implicits._
      Seq((1L, 2L, 0L)).toDF("k", "v", "bucket").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      TableManifest.init(spark, dir)
      val unknown = intercept[RuntimeException](
        TableManifest.renameColumn(spark, dir, "nope", "x"))
      assert(unknown.getMessage.contains("unknown column"))
      val existing = intercept[IllegalArgumentException](
        TableManifest.renameColumn(spark, dir, "k", "v"))
      assert(existing.getMessage.contains("already exists"))
      val badName = intercept[IllegalArgumentException](
        TableManifest.renameColumn(spark, dir, "k", "bad-name"))
      assert(badName.getMessage.contains("identifier"))

      val pdir = tmp("rejp")
      TableManifest.publishPartitioned(
        Seq((1L, 10L, 0L)).toDF("k", "v", "b"), pdir, Seq("b"))
      val part = intercept[IllegalArgumentException](
        TableManifest.renameColumn(spark, pdir, "b", "bb"))
      assert(part.getMessage.contains("partition column"))
    }
  }

  test("UPDATE and DELETE see pre-rename rows through the renamed column") {
    val dir = mixedTable()
    val tbl = freshName("dml")
    withActive {
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir')")
      // w=20 is in a pre-rename file: the UPDATE must find and rewrite it
      spark.sql(s"UPDATE $tbl SET w = 21 WHERE w = 20")
      assert(spark.sql(s"SELECT w FROM $tbl WHERE k = 2").head()
        .getLong(0) == 21L)
      // the rewrite emitted the LOGICAL name: the rewritten file left the
      // carrier set
      val carriers = TableManifest.readRenames(spark, dir)
        .flatMap(_.carriers).toSet
      val live = TableManifest.read(spark, dir).get._2.toSet
      assert(carriers.subsetOf(live))
      // DELETE through the renamed column (pre-rename row k=1, w=10)
      spark.sql(s"DELETE FROM $tbl WHERE w = 10")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 9L)
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE w = 10").head()
        .getLong(0) == 0L)
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("compaction rewrites carriers to the logical name and clears the mapping") {
    val dir = mixedTable()
    withActive {
      assert(TableManifest.readRenames(spark, dir).nonEmpty)
      // everything is a small file: one pass rewrites the whole table
      graft.ops.Compaction.compactTracked(spark, dir,
        minFileBytes = 1L << 20, targetBytes = 1L << 24)
      assert(TableManifest.readRenames(spark, dir).isEmpty,
        "no live file carries the old name after a full rewrite")
      // a PLAIN session (no extensions) can now read it — the mapping is
      // gone, so the un-expanded scan guard does not fire
      val rows = TableManifest.readTable(spark, dir).select("k", "w")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows == (0L until 10L).map(k => (k, k * 10L)).toSeq)
    }
  }

  test("time travel serves each version's own names") {
    val dir = mixedTable()
    withActive {
      // v1 = init (pre-rename): column is still v
      val v1 = TableManifest.readTableAt(spark, dir, 1L)
      assert(v1.columns.contains("v") && !v1.columns.contains("w"))
      assert(v1.select("v").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 10L, 20L, 30L, 40L))
      // head serves w
      assert(TableManifest.readTable(spark, dir).columns.contains("w"))
    }
  }

  test("adding a column named like a carried physical name is loud") {
    val dir = mixedTable()
    withActive {
      val e = intercept[IllegalArgumentException](
        TableManifest.addColumns(spark, dir, Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
      assert(e.getMessage.contains("physically carried"))
    }
  }

  test("sibling sessions read correctly; streams over carrier files are loud") {
    val dir = mixedTable()
    withActive {
      // the sibling session's fate depends on JVM session-creation
      // order (it may or may not have inherited the expansion rule
      // through the shared builder state) — the CONTRACT is that both
      // outcomes are safe: WITH the rule the read is CORRECT (the
      // pre-rename file's rows included), WITHOUT it the un-expanded
      // scan guard is LOUD. Silent NULLs are the one forbidden outcome.
      val plain = graft.SparkSpec.session
      (try Right(plain.read.format("graft-manifest").load(dir)
          .select("k", "w").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
        catch { case e: RuntimeException => Left(e) }) match {
        case Right(rows) =>
          assert(rows == (0L until 10L).map(k => (k, k * 10L)).toSeq,
            s"a sibling session with the rule must read CORRECTLY: $rows")
        case Left(e) =>
          assert(e.getMessage.contains("renamed columns"),
            s"a session without the rule must hit the named guard: " +
              s"${e.getMessage}")
      }
      // a streaming read whose range includes carriers DELIVERS them
      // under the pinned logical schema (round 17 — the grouped
      // per-physical-name delivery ManifestStreamRenameSpec pins in
      // detail); the refusal that remains is the FORWARD case (rename
      // mid-stream under the old pinned schema)
      val qn = freshName("renstream")
      val q = spark.readStream.format("graft-manifest").load(dir)
        .writeStream.format("memory").queryName(qn).start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table(qn).select("k", "w").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(streamed == (0L until 10L).map(k => (k, k * 10L)).toSeq,
        s"carrier ranges stream correctly under logical names: $streamed")
    }
  }

  test("restore to a pre-rename version restores the old schema and mapping") {
    val dir = mixedTable()
    withActive {
      TableManifest.restore(spark, dir, 1L)
      assert(TableManifest.readSchema(spark, dir).get.fieldNames
        .contains("v"))
      assert(TableManifest.readRenames(spark, dir).isEmpty)
      val rows = TableManifest.readTable(spark, dir).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows == (0L until 5L).map(k => (k, k * 10L)).toSeq)
    }
  }

  test("renaming a DATA column of a hive-partitioned table serves mixed generations with partition pruning intact") {
    withActive {
      val dir = tmp("part")
      import spark.implicits._
      TableManifest.publishPartitioned(
        (0L until 8L).map(k => (k, k * 10L, k % 2)).toDF("k", "v", "b"),
        dir, Seq("b"))
      TableManifest.renameColumn(spark, dir, "v", "w")
      (8L until 12L).map(k => (k, k * 10L, k % 2)).toDF("k", "w", "b")
        .write.format("graft-manifest").mode("append").save(dir)
      val df = TableManifest.readTable(spark, dir)
      assert(df.columns.toSeq.sorted == Seq("b", "k", "w"))
      // partition filter + renamed-column filter across both generations
      val rows = df.filter($"b" === 0L && $"w" >= 40L)
        .select("k", "w").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows == Seq((4L, 40L), (6L, 60L), (8L, 80L), (10L, 100L)))
      // SQL over the same table through the expansion rule
      val tbl = freshName("part")
      spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
        s"OPTIONS (path '$dir')")
      assert(spark.sql(
        s"SELECT CAST(SUM(w) AS BIGINT) FROM $tbl WHERE b = 1").head()
        .getLong(0) == Seq(1L, 3L, 5L, 7L, 9L, 11L).map(_ * 10L).sum)
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("stats committed under the OLD physical name keep pruning through the rename") {
    withActive {
      val dir = tmp("prune")
      import spark.implicits._
      // two one-file generations with disjoint v ranges, stats committed
      // BEFORE the rename (keyed by the physical name v)
      (0L until 5L).map(k => (k, k * 10L)).toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      TableManifest.init(spark, dir)
      TableManifest.analyze(spark, dir, Seq("v", "k"))
      TableManifest.renameColumn(spark, dir, "v", "w")
      (5L until 10L).map(k => (k, k * 10L)).toDF("k", "w")
        .write.format("graft-manifest").mode("append").save(dir)
      TableManifest.analyze(spark, dir, Seq("w", "k"))
      val all = TableManifest.read(spark, dir).get._2
      assert(all.size >= 2)
      // a LOGICAL-name range that only the pre-rename file can hold:
      // the carrier's old-name stats must prune the post-rename files
      val lowOnly = TableManifest.prunedFilesAll(spark, dir,
        Seq(("w", 0L, 30L)))
      assert(lowOnly.size < all.size,
        s"carrier stats under the old name must keep pruning: $lowOnly")
      // and the other way: a range only the post-rename file holds
      val highOnly = TableManifest.prunedFilesAll(spark, dir,
        Seq(("w", 60L, 90L)))
      assert(highOnly.size < all.size)
      // a stats-pruned range DELETE through the renamed column is exact
      TableManifest.eraseWhereRange(spark, dir, "w", 0L, 25L)
      val left = TableManifest.readTable(spark, dir)
        .select("w").collect().map(_.getLong(0)).sorted.toSeq
      assert(left == (3L until 10L).map(_ * 10L).toSeq)
    }
  }

  test("CDC addedBetween over a range including carriers aliases correctly") {
    val dir = mixedTable()
    withActive {
      // (0, head]: includes the pre-rename file — served under the
      // head's LOGICAL schema with the old physical column folded in
      val head = TableManifest.read(spark, dir).get._1
      val adds = TableManifest.addedBetween(spark, dir, 0L, head)
      assert(adds.columns.toSeq.sorted == Seq("k", "s", "w"))
      assert(adds.select("w").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 10L).map(_ * 10L).sorted.toSeq)
    }
  }
}
