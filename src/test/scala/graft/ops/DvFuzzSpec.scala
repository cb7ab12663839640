package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the MERGE-ON-READ DML path: random interleaved
  * sequences of append / DELETE / UPDATE / MERGE / rename / compaction
  * against a graft table, with each mutation randomly taking the
  * deletion-vector or the copy-on-write route, checked after EVERY step
  * against a driver-side Map oracle. Accumulated dvs must compose with
  * later dv AND cow mutations (a cow rewrite of a dv'd victim has to
  * apply the bitmap; a dv delete over an already-dv'd file has to
  * union), with renames (carrier groups × position filters), and with
  * compaction (materializes both). A wrong position, a resurrected row,
  * or a double-applied bitmap shows up as a row diff with the seed
  * printed. Seeded, so failures replay. */
class DvFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSessions.withExtensions
  private def withActive[A](f: => A): A =
    graft.TestSessions.withExtensionsActive(_ => f)

  private def withDv[A](on: Boolean)(f: => A): A = {
    if (!on) f
    else {
      spark.conf.set("spark.graft.dml.deletionVectors", "true")
      try f finally spark.conf.unset("spark.graft.dml.deletionVectors")
    }
  }

  test("random dv/cow append/delete/update/merge/rename sequences match a driver-side oracle") {
    withActive {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      (1 to 3).foreach { seed =>
        val rng = new scala.util.Random(100 + seed)
        val dir = java.nio.file.Files
          .createTempDirectory(s"gm-dvfuzz-$seed").toString
        var colName = "v0"
        var renameCount = 0
        var nextK = 0L
        val oracle = scala.collection.mutable.Map.empty[Long, Long]
        def appendBatch(n: Int): Unit = {
          val rows = (0 until n).map { _ =>
            val k = nextK; nextK += 1
            val v = rng.nextInt(1000).toLong
            oracle(k) = v
            (k, v)
          }
          val df = rows.toDF("k", colName)
          if (TableManifest.read(spark, dir).isEmpty) {
            df.coalesce(1).write.mode("overwrite").parquet(dir)
            TableManifest.init(spark, dir)
          } else df.coalesce(1).write.format("graft-manifest")
            .mode("append").save(dir)
        }
        appendBatch(5)
        def check(step: String): Unit = {
          // library read AND a point-lookup probe of one surviving key
          val got = TableManifest.readTable(spark, dir)
            .select("k", colName).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
          val want = oracle.toSeq.sorted
          assert(got == want,
            s"seed=$seed $step col=$colName dvs=" +
              s"${TableManifest.readDvs(spark, dir).size}:\n" +
              s" got  $got\n want $want")
          if (oracle.nonEmpty) {
            val k = oracle.keys.head
            val hit = TableManifest.readTableWhereEq(spark, dir, "k", Seq(k))
              .select("k", colName).collect()
              .map(r => r.getLong(0) -> r.getLong(1)).toSeq
            assert(hit == Seq(k -> oracle(k)),
              s"seed=$seed $step point lookup k=$k: $hit vs ${oracle(k)}")
          }
        }
        (1 to 12).foreach { step =>
          val dv = rng.nextBoolean()
          rng.nextInt(6) match {
            case 0 => appendBatch(1 + rng.nextInt(3))
            case 1 if oracle.nonEmpty => // DELETE by value range
              val vs = oracle.values.toSeq
              val cut = vs(rng.nextInt(vs.size))
              withDv(dv) {
                TableManifest.eraseWhereRange(spark, dir, colName,
                  cut - 50L, cut + 50L)
              }
              oracle.filterInPlace((_, v) => v < cut - 50L || v > cut + 50L)
            case 2 if oracle.nonEmpty => // UPDATE through the value column
              val vs = oracle.values.toSeq
              val cut = vs(rng.nextInt(vs.size))
              withDv(dv) {
                TableManifest.updateWhere(spark, dir,
                  Seq(colName -> (col(colName) + lit(2000L))),
                  Some(col(colName) <= lit(cut) && col(colName) >= lit(0L)))
              }
              oracle.mapValuesInPlace((_, v) =>
                if (v <= cut && v >= 0L) v + 2000L else v)
            case 3 if oracle.nonEmpty => // MERGE upsert on k
              val keys = oracle.keys.toSeq
              val hit = keys(rng.nextInt(keys.size))
              val fresh = nextK; nextK += 1
              val rows = Seq(hit -> -7L, fresh -> -9L)
              val batch = rows.toDF("k", colName)
                .coalesce(1).localCheckpoint()
              withDv(dv) {
                TableManifest.mergeByKey(spark, dir, "k", batch)
              }
              rows.foreach { case (k, v) => oracle(k) = v }
            case 4 => // rename the value column
              renameCount += 1
              val to = s"v$renameCount"
              TableManifest.renameColumn(spark, dir, colName, to)
              colName = to
            case _ => appendBatch(2)
          }
          check(s"step $step")
        }
        // compaction materializes every dv + carrier; single-scan read
        // still matches and both metadata sections are clear
        Compaction.compactTracked(spark, dir,
          minFileBytes = 1L << 20, targetBytes = 1L << 24)
        assert(TableManifest.readDvs(spark, dir).isEmpty,
          s"seed=$seed: compaction must materialize the dvs")
        assert(TableManifest.readRenames(spark, dir).isEmpty)
        check("post-compaction")
        // and time travel still serves the dv'd historical states: the
        // final pre-compaction head must equal the oracle too
        val headNow = TableManifest.read(spark, dir).get._1
        val prev = TableManifest.readTableAt(spark, dir, headNow - 1)
          .select("k", colName).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
        assert(prev == oracle.toSeq.sorted,
          s"seed=$seed: time travel to the pre-compaction head diverged")
      }
    }
  }
}
