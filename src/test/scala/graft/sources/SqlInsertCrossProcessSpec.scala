package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.TableManifest

/** CROSS-PROCESS race of the SQL `INSERT INTO` commit path.
  * `ManifestCrossProcessSpec` races raw `commitIf` calls; this drill
  * races the FULL provider write protocol — scratch-dir parquet write,
  * move-in under unique `sql-*` names, CAS append commit
  * ([[ManifestTableProvider]]) — from two real JVMs: the suite session
  * runs catalog-table `INSERT INTO … VALUES` statements while a second
  * OS process appends through `DataFrameWriter.format("graft-manifest")
  * .mode("append")` (the identical write path without needing a shared
  * metastore). Pass = no lost updates (every row from both writers
  * survives exactly once), the head version advanced exactly once per
  * commit, and the seed hwm rode through untouched. */
class SqlInsertCrossProcessSpec extends SparkSpec {

  private val N = 5

  test("two OS processes racing SQL-path INSERTs: no lost updates, exact row multiset") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sqlrace").toString
    // seed: one committed batch carrying an hwm the racing commits must
    // preserve, with the (k, who) schema both writers append
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((0L, "seed")).toDF("k", "who"), 7L, dir)
    val (v0, _, hwm0) = TableManifest.readHead(spark, dir).get
    assert(hwm0.contains(7L))

    val scratch = Files.createTempDirectory("graft-sqlrace-flags")
    val ready = scratch.resolve("ready").toString
    val go = scratch.resolve("go").toString

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val moduleFlags = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.sources.SqlInsertRaceMain", dir, "procB", N.toString, ready, go)
    val child = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).start()
    val drain = new Thread(() => {
      val src = scala.io.Source.fromInputStream(child.getInputStream)
      src.getLines().foreach(_ => ())
      src.close()
    })
    drain.setDaemon(true); drain.start()

    val tbl = s"gsqlrace_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (!new java.io.File(ready).exists()) {
        assert(System.currentTimeMillis() < deadline,
          "child JVM never became ready")
        assert(child.isAlive, "child JVM died during startup")
        Thread.sleep(20)
      }
      assert(new java.io.File(go).createNewFile())
      (1 to N).foreach { i =>
        spark.sql(s"INSERT INTO $tbl VALUES (${i}L, 'procA')")
      }
      assert(child.waitFor() == 0, "child writer failed")
    } finally {
      spark.sql(s"DROP TABLE $tbl")
      if (child.isAlive) child.destroyForcibly()
    }

    val (v1, _, hwm1) = TableManifest.readHead(spark, dir).get
    val got = TableManifest.readTable(spark, dir)
      .as[(Long, String)].collect().toSeq.sorted
    val want = ((0L, "seed") +:
      (1 to N).flatMap(i => Seq((i.toLong, "procA"), (i.toLong, "procB"))))
      .sorted
    assert(got == want, s"row multiset drifted: $got")
    assert(v1 == v0 + 2 * N,
      s"version must advance once per commit: $v0 -> $v1")
    assert(hwm1.contains(7L), s"hwm clobbered by contended INSERTs: $hwm1")
    // no scratch leftovers: every in-flight dir was promoted or dropped
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".inflight-"))
    assert(leftovers.isEmpty, s"scratch survived: ${leftovers.toSeq}")
  }

  test("two OS processes racing INSERTs into a PARTITIONED table: single layout, exact multiset") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sqlrace-part").toString
    // seed: a partitioned table (bucket = k % 2) with an hwm-carrying
    // streaming batch — both racing writers must re-lay their batches
    // out nested, and neither the layout nor the hwm may be disturbed
    TableManifest.publishPartitioned(
      Seq((100L, "seed", 0L)).toDF("k", "who", "bucket"), dir, Seq("bucket"))
    graft.streaming.ManifestAppendSink.applyBatch(
      Seq((101L, "seed", 1L)).toDF("k", "who", "bucket"), 7L, dir)
    val (v0, _, hwm0) = TableManifest.readHead(spark, dir).get
    assert(hwm0.contains(7L))

    val scratch = Files.createTempDirectory("graft-sqlrace-part-flags")
    val ready = scratch.resolve("ready").toString
    val go = scratch.resolve("go").toString
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val moduleFlags = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.sources.SqlInsertRaceMain", dir, "procB", N.toString,
      ready, go, "part")
    val child = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).start()
    val drain = new Thread(() => {
      val src = scala.io.Source.fromInputStream(child.getInputStream)
      src.getLines().foreach(_ => ())
      src.close()
    })
    drain.setDaemon(true); drain.start()

    val tbl = s"gsqlracep_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (!new java.io.File(ready).exists()) {
        assert(System.currentTimeMillis() < deadline,
          "child JVM never became ready")
        assert(child.isAlive, "child JVM died during startup")
        Thread.sleep(20)
      }
      assert(new java.io.File(go).createNewFile())
      (1 to N).foreach { i =>
        spark.sql(s"INSERT INTO $tbl VALUES (${i}L, 'procA', ${i % 2}L)")
      }
      assert(child.waitFor() == 0, "child writer failed")
    } finally {
      spark.sql(s"DROP TABLE $tbl")
      if (child.isAlive) child.destroyForcibly()
    }

    val (v1, names, hwm1) = TableManifest.readHead(spark, dir).get
    assert(names.forall(_.startsWith("bucket=")),
      s"contended appends kept the single hive layout: $names")
    val got = TableManifest.readTable(spark, dir)
      .select("k", "who", "bucket").as[(Long, String, Long)]
      .collect().toSeq.sorted
    val want = (Seq((100L, "seed", 0L), (101L, "seed", 1L)) ++
      (1 to N).flatMap(i => Seq((i.toLong, "procA", i.toLong % 2),
        (i.toLong, "procB", i.toLong % 2)))).sorted
    assert(got == want, s"row multiset drifted: $got")
    assert(v1 == v0 + 2 * N,
      s"version must advance once per commit: $v0 -> $v1")
    assert(hwm1.contains(7L), s"hwm clobbered: $hwm1")
    // partition values survive contention on the READ side too:
    // bucket=1 holds the (101, seed) row plus every ODD k from BOTH
    // writers
    val odd = (1 to N).count(_ % 2 == 1)
    assert(TableManifest.readTable(spark, dir)
      .filter(org.apache.spark.sql.functions.col("bucket") === 1)
      .count() == 1L + 2L * odd, s"bucket=1 row count")
  }
}
