package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

/** Differential fuzz of the RENAME COLUMN read path: random interleaved
  * sequences of append / rename / UPDATE / DELETE against a graft table,
  * with a driver-side Map as the oracle. Every sequence leaves the table
  * with a mix of physical-name generations and shrunken carrier sets;
  * after every mutation the grouped-union read must serve EXACTLY the
  * oracle rows under the current logical name — a wrong group split, a
  * missed coalesce in a victim rewrite, or a stale mapping entry shows
  * up as a row diff with the seed printed. Seeded, so failures replay. */
class RenameFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSessions.withExtensions
  private def withActive[A](f: => A): A =
    graft.TestSessions.withExtensionsActive(_ => f)

  test("random append/rename/update/delete sequences match a driver-side oracle") {
    withActive {
      import spark.implicits._
      (1 to 3).foreach { seed =>
        val rng = new scala.util.Random(seed)
        val dir = java.nio.file.Files
          .createTempDirectory(s"gm-renfuzz-$seed").toString
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
        appendBatch(4)
        def check(step: String): Unit = {
          val got = TableManifest.readTable(spark, dir)
            .select("k", colName).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
          val want = oracle.toSeq.sorted
          assert(got == want,
            s"seed=$seed $step col=$colName:\n got  $got\n want $want")
        }
        (1 to 10).foreach { step =>
          rng.nextInt(4) match {
            case 0 => appendBatch(1 + rng.nextInt(3))
            case 1 =>
              renameCount += 1
              val to = s"v$renameCount"
              TableManifest.renameColumn(spark, dir, colName, to)
              colName = to
            case 2 if oracle.nonEmpty => // UPDATE through the current name
              val cut = oracle.values.toSeq(rng.nextInt(oracle.size))
              import org.apache.spark.sql.functions.{col, lit}
              TableManifest.updateWhere(spark, dir,
                Seq(colName -> (col(colName) + lit(1000L))),
                Some(col(colName) <= lit(cut)))
              oracle.mapValuesInPlace((_, v) =>
                if (v <= cut) v + 1000L else v)
            case _ if oracle.nonEmpty => // DELETE through the current name
              val victim = oracle.values.toSeq(rng.nextInt(oracle.size))
              TableManifest.eraseWhereEq(spark, dir, colName, Seq(victim))
              oracle.filterInPlace((_, v) => v != victim)
            case _ => appendBatch(2)
          }
          check(s"step $step")
        }
        // a final compaction clears whatever mapping is left and the
        // single-scan read still matches
        graft.ops.Compaction.compactTracked(spark, dir,
          minFileBytes = 1L << 20, targetBytes = 1L << 24)
        assert(TableManifest.readRenames(spark, dir).isEmpty)
        check("post-compaction")
      }
    }
  }
}
