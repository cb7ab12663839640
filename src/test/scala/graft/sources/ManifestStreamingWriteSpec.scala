package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `writeStream.format("graft-manifest")` — the native DSv2 streaming
  * append ([[ManifestStreamingWrite]]): per-epoch two-phase commit onto
  * the manifest hwm protocol, exactly-once over restart and epoch
  * replay, no foreachBatch required. Twin of `FileLogStreamingWriteSpec`
  * on the table format. */
class ManifestStreamingWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def readBack(dir: String): Seq[(Long, String)] =
    TableManifest.readTable(spark, dir).as[(Long, String)]
      .collect().toSeq.sorted

  test("streaming write lands each micro-batch exactly once and resumes") {
    val dir = tmpDir("gm-swrite")
    val ckpt = tmpDir("gm-swrite-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    def run(): Unit = {
      val q = in.toDF().toDF("k", "s")
        .writeStream.format("graft-manifest")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dir)
      q.awaitTermination(60000)
    }
    run()
    assert(readBack(dir) == Seq((1L, "a"), (2L, "b")))
    val hwm0 = TableManifest.readHead(spark, dir).get._3
    assert(hwm0.isDefined, "the epoch id rides the manifest hwm")

    // restart on the same checkpoint with no new data: nothing re-appends
    run()
    assert(readBack(dir) == Seq((1L, "a"), (2L, "b")))

    // new data after restart appends only the delta, as a new version
    in.addData((3L, "c"))
    val vBefore = TableManifest.read(spark, dir).get._1
    run()
    assert(readBack(dir) == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TableManifest.read(spark, dir).get._1 > vBefore,
      "each non-empty micro-batch is one new manifest version")
    // no scratch leftovers after clean commits
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".inflight-"))
    assert(leftovers.isEmpty, s"scratch survived: ${leftovers.toSeq}")
  }

  test("a replayed epoch is a no-op: the manifest hwm is the commit record") {
    val dir = tmpDir("gm-swrite-replay")
    val ckpt1 = tmpDir("gm-swrite-ck1")
    val ckpt2 = tmpDir("gm-swrite-ck2")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "x"), (2L, "y"))
    def run(ckpt: String): Unit = {
      val q = in.toDF().toDF("k", "s")
        .writeStream.format("graft-manifest")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dir)
      q.awaitTermination(60000)
    }
    run(ckpt1)
    assert(readBack(dir) == Seq((1L, "x"), (2L, "y")))
    // a FRESH checkpoint replays epoch 0 (the crash-after-commit shape:
    // the sink committed but the engine's checkpoint never advanced) —
    // the hwm must swallow the duplicate delivery
    run(ckpt2)
    assert(readBack(dir) == Seq((1L, "x"), (2L, "y")),
      "replayed epoch 0 double-appended")
  }

  test("statsCols makes appended files born prunable; complete mode is rejected") {
    val dir = tmpDir("gm-swrite-stats")
    val ckpt = tmpDir("gm-swrite-stats-ck")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData((10L, "p"), (20L, "q"))
    val q = in.toDF().toDF("k", "s")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", ckpt)
      .option("statsCols", "k")
      .trigger(Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination(60000)
    val (_, files) = TableManifest.read(spark, dir).get
    val stats = TableManifest.readStats(spark, dir)
    assert(files.nonEmpty &&
      files.forall(f => stats.get(f).exists(_.contains("k"))),
      s"appended files carry k stats: $stats")

    val e = intercept[Exception] {
      in.toDF().toDF("k", "s")
        .groupBy("s").count()
        .writeStream.format("graft-manifest")
        .outputMode("complete")
        .option("checkpointLocation", tmpDir("gm-swrite-cm"))
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("gm-swrite-cm-t"))
        .awaitTermination(60000)
    }
    assert(e.getMessage != null)
  }

  test("streaming write into a hive-partitioned table lands epochs under their partitions") {
    val dir = tmpDir("gm-swrite-part")
    (1L to 6L).map(i => (i, i % 2)).toDF("k", "side")
      .repartition(1).write.partitionBy("side").mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val v0 = TableManifest.read(spark, dir).get._1
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    in.addData((9L, 0L), (10L, 3L)) // an existing and a brand-new partition
    val q = in.toDF().toDF("k", "side")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", tmpDir("gm-swrite-part-ck"))
      .trigger(Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination(60000)
    // one epoch = one commit; the micro-batch is re-laid out under its
    // k=v/ directories with the b<epoch>- stamp on the nested basename
    // (replay detection and vacuum's in-flight floor unchanged)
    val (v1, names) = TableManifest.read(spark, dir).get
    assert(v1 == v0 + 1, "one version per epoch")
    assert(names.forall(_.startsWith("side=")), s"single layout: $names")
    assert(names.exists(n => n.startsWith("side=3/") &&
      n.substring(n.indexOf('/') + 1).startsWith("b0-")),
      s"new partition minted with the batch stamp: $names")
    val got = spark.read.format("graft-manifest").load(dir)
      .selectExpr("k", "side").as[(Long, Long)].collect().toSeq.sorted
    assert(got == ((1L to 6L).map(i => (i, i % 2)) ++
      Seq((9L, 0L), (10L, 3L))).sorted,
      s"streamed rows read back with their partition values: $got")
  }
}
