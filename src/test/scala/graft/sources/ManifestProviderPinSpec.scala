package graft.sources

import java.util.Collections

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The provider's snapshot pin must hold per (path, versionAsOf), not in a
  * single last-resolution slot: Spark resolves a table as `inferSchema`
  * then `getTable` on the SAME provider instance, and a concurrent
  * resolution of a DIFFERENT table through that instance must not evict
  * the in-flight pin between the two calls — a single slot re-opens the
  * split-snapshot window (schema from one manifest version, scan from
  * another) the pin exists to close. */
class ManifestProviderPinSpec extends SparkSpec {

  private def opts(pairs: (String, String)*): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String]()
    pairs.foreach { case (k, v) => m.put(k, v) }
    new CaseInsensitiveStringMap(m)
  }

  /** File NAMES the table's batch scan actually plans over. */
  private def scannedFiles(table: Table): Set[String] = {
    val scan = table.asInstanceOf[SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    scan.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition =>
        fp.files.map(f => new Path(f.filePath.toString).getName)
      case other => sys.error(s"unexpected partition: $other")
    }.toSet
  }

  private def freshTable(prefix: String, n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    TableManifest.publish(
      (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "s"), dir)
    dir
  }

  test("a racing resolution of another table cannot evict an in-flight head pin") {
    import spark.implicits._
    val dirA = freshTable("gm-pin-a", 3)
    val dirB = freshTable("gm-pin-b", 2)
    val filesAtPin = TableManifest.read(spark, dirA).get._2.toSet

    val provider = new ManifestTableProvider
    // resolution of A starts: inferSchema pins A's head snapshot
    val schemaA = provider.inferSchema(opts("path" -> dirA))
    // resolution of B interleaves on the same instance (the case a single
    // slot gets wrong: B's pin evicted A's)
    provider.inferSchema(opts("path" -> dirB))
    // a commit replaces A's snapshot ENTIRELY before A's getTable lands
    TableManifest.publish(
      (10 to 14).map(i => (i.toLong, s"new$i")).toDF("id", "s"), dirA)
    assert(TableManifest.read(spark, dirA).get._2.toSet
      .intersect(filesAtPin).isEmpty, "publish must have replaced the files")

    val propsA = new java.util.HashMap[String, String]()
    propsA.put("path", dirA)
    val tableA = provider.getTable(schemaA, Array.empty,
      Collections.unmodifiableMap(propsA))
    // the scan must see exactly the snapshot inferSchema pinned — a
    // re-resolution here would pair A's schema with the post-commit files
    assert(scannedFiles(tableA) == filesAtPin,
      "getTable re-resolved: the racing resolution evicted the pin")
  }

  test("same path at different versionAsOf holds two independent pins") {
    import spark.implicits._
    val dir = freshTable("gm-pin-v", 2)
    val v1Files = TableManifest.read(spark, dir).get._2.toSet
    TableManifest.publish(
      (5 to 9).map(i => (i.toLong, s"v2_$i")).toDF("id", "s"), dir)
    val v2Files = TableManifest.read(spark, dir).get._2.toSet

    val provider = new ManifestTableProvider
    val o1 = opts("path" -> dir, "versionAsOf" -> "1")
    val o2 = opts("path" -> dir, "versionAsOf" -> "2")
    // interleaved resolution of BOTH versions through one instance
    val s1 = provider.inferSchema(o1)
    val s2 = provider.inferSchema(o2)
    def props(v: String): java.util.Map[String, String] = {
      val m = new java.util.HashMap[String, String]()
      m.put("path", dir); m.put("versionAsOf", v)
      m
    }
    val t1 = provider.getTable(s1, Array.empty, props("1"))
    val t2 = provider.getTable(s2, Array.empty, props("2"))
    assert(scannedFiles(t1) == v1Files)
    assert(scannedFiles(t2) == v2Files)
  }

  test("8 concurrent head resolutions through one instance each see their own table") {
    import spark.implicits._
    val dirs = (0 until 8).map(i => freshTable(s"gm-pin-c$i", i + 1))
    val expected = dirs.map(d => TableManifest.read(spark, d).get._2.toSet)
    val provider = new ManifestTableProvider
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence(dirs.map { d =>
      Future {
        val schema = provider.inferSchema(opts("path" -> d))
        val props = new java.util.HashMap[String, String]()
        props.put("path", d)
        (schema, scannedFiles(provider.getTable(schema, Array.empty, props)))
      }
    }), 2.minutes)
    results.zip(expected).zipWithIndex.foreach { case (((_, got), want), i) =>
      assert(got == want, s"resolution $i scanned the wrong snapshot")
    }
  }
}
