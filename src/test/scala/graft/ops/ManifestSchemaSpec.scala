package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** The manifest-carried table schema: written by every committing surface,
  * evolved by merge on appends, replaced on publish, read back by every
  * scan path with ZERO footer reads at planning — and fallen back to
  * merged footer inference on manifests written before the field existed.
  * The 100 TB point: without the field, correct schema resolution on an
  * evolving table costs an O(files) footer sweep at EVERY planning. */
class ManifestSchemaSpec extends SparkSpec {

  import spark.implicits._

  private def tmpTable(tag: String): String =
    Files.createTempDirectory(s"gm-schema-$tag").toString

  /** What the manifest stores and a scan serves: every field nullable. */
  private def nullable(s: StructType): StructType =
    StructType(s.fields.map(_.copy(nullable = true)))

  private def headBody(dir: String): String = {
    val mdir = new java.io.File(dir, "_manifest")
    val head = mdir.listFiles().map(_.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json")).max
    new String(Files.readAllBytes(Paths.get(dir, "_manifest", head)),
      StandardCharsets.UTF_8)
  }

  test("publish stores the schema; readTable plans from it") {
    val dir = tmpTable("publish")
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "s", "score")
    TableManifest.publish(df, dir)
    assert(headBody(dir).contains("\"schemab64\":\""),
      "publish must carry the schema in the manifest body")
    assert(TableManifest.readSchema(spark, dir).contains(nullable(df.schema)))
    val back = TableManifest.readTable(spark, dir)
    assert(back.schema == nullable(df.schema))
    assert(back.count() == 2)
  }

  test("undeclared evolved append widens the stored schema from the delta") {
    val dir = tmpTable("evolve")
    Seq((1L, "a")).toDF("id", "s").repartition(1)
      .write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    assert(TableManifest.readSchema(spark, dir).map(_.fieldNames.toSet)
      .contains(Set("id", "s")))
    // an appender moves in an evolved file and commits WITHOUT declaring
    // a schema — commitIf must inventory the delta's footers, or the
    // carried schema would hide `score` table-wide
    val scratch = Files.createTempDirectory("gm-schema-add").toString
    Seq((2L, "b", 9.0)).toDF("id", "s", "score").repartition(1)
      .write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir, "zz-evolved.parquet")
    Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    assert(TableManifest.commitIf(
      spark, dir, files :+ target.getName, head).isDefined)
    assert(TableManifest.readSchema(spark, dir).map(_.fieldNames.toSet)
      .contains(Set("id", "s", "score")))
    val got = TableManifest.readTable(spark, dir)
      .select("id", "s", "score")
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a", None), (2L, "b", Some(9.0))))
  }

  test("a narrow declared append cannot shrink the table schema") {
    val dir = tmpTable("narrow")
    TableManifest.publish(
      Seq((1L, "a", 0.5)).toDF("id", "s", "score"), dir)
    val scratch = Files.createTempDirectory("gm-schema-narrow").toString
    val narrow = Seq((2L, "b")).toDF("id", "s")
    narrow.repartition(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir, "zz-narrow.parquet")
    Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    assert(TableManifest.commitIf(spark, dir, files :+ target.getName,
      head, schema = Some(narrow.schema)).isDefined)
    val cols = TableManifest.readSchema(spark, dir).get.fieldNames.toSet
    assert(cols == Set("id", "s", "score"),
      s"append merges, never shrinks: $cols")
    val got = TableManifest.readTable(spark, dir)
      .select("id", "score")
      .as[(Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, Some(0.5)), (2L, None)))
  }

  test("publish REPLACES the schema; time travel keeps each version's") {
    val dir = tmpTable("drop")
    TableManifest.publish(
      Seq((1L, "a", 0.5)).toDF("id", "s", "score"), dir) // v1
    val v1 = TableManifest.read(spark, dir).get._1
    TableManifest.publish(Seq((1L, "a")).toDF("id", "s"), dir) // v2
    assert(TableManifest.readSchema(spark, dir).map(_.fieldNames.toSet)
      .contains(Set("id", "s")),
      "a snapshot publish that dropped a column really drops it")
    assert(!TableManifest.readTable(spark, dir).columns.contains("score"))
    // the v1 files still exist (await vacuum) and v1's manifest carries
    // v1's schema — the dropped column is visible exactly there
    val old = TableManifest.readTableAt(spark, dir, v1)
    assert(old.columns.toSet == Set("id", "s", "score"))
    assert(old.select("score").as[Double].collect().toSeq == Seq(0.5))
  }

  test("pre-schema manifests fall back; analyzeSchema bootstraps them") {
    val dir = tmpTable("legacy")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").repartition(1)
      .write.mode("overwrite").parquet(dir)
    val names = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.getName).sorted
    // hand-write a manifest the way pre-schema builds rendered it
    Files.createDirectories(Paths.get(dir, "_manifest"))
    val body = s"""{"version":1,"token":"t","files":[""" +
      names.map("\"" + _ + "\"").mkString(",") + "]}"
    Files.write(Paths.get(dir, "_manifest", f"v${1L}%020d.json"),
      body.getBytes(StandardCharsets.UTF_8))
    assert(TableManifest.readSchema(spark, dir).isEmpty)
    // reads fall back to merged footer inference — correct, just O(files)
    assert(TableManifest.readTable(spark, dir).columns.toSet ==
      Set("id", "s"))
    assert(spark.read.format("graft-manifest").load(dir)
      .columns.toSet == Set("id", "s"))
    val v2 = TableManifest.analyzeSchema(spark, dir)
    assert(v2 == 2L)
    assert(TableManifest.readSchema(spark, dir).map(_.fieldNames.toSet)
      .contains(Set("id", "s")))
    assert(headBody(dir).contains("\"schemab64\":\""))
  }

  test("a zero-file version of a schema-carrying table reads as empty") {
    val dir = tmpTable("empty")
    val df = Seq((1L, "a")).toDF("id", "s")
    TableManifest.publish(df, dir)
    val (head, _) = TableManifest.read(spark, dir).get
    assert(TableManifest.commitIf(
      spark, dir, Seq.empty, head).isDefined) // delete-all commit
    val back = TableManifest.readTable(spark, dir)
    assert(back.schema == nullable(df.schema),
      "schema survives the empty snapshot")
    assert(back.count() == 0)
    val viaProvider = spark.read.format("graft-manifest").load(dir)
    assert(viaProvider.schema == nullable(df.schema))
    assert(viaProvider.count() == 0)
  }

  test("provider pins files and schema from the same manifest body") {
    val dir = tmpTable("pin")
    TableManifest.publish(
      Seq((1L, "a", 0.5)).toDF("id", "s", "score"), dir) // v1
    val v1 = TableManifest.read(spark, dir).get._1
    TableManifest.publish(Seq((2L, "b")).toDF("id", "s"), dir) // v2
    val asOf = spark.read.format("graft-manifest")
      .option("versionAsOf", v1).load(dir)
    assert(asOf.columns.toSet == Set("id", "s", "score"),
      "versionAsOf read serves that version's schema, not the head's")
    assert(asOf.select("id").as[Long].collect().toSeq == Seq(1L))
    val headRead = spark.read.format("graft-manifest").load(dir)
    assert(headRead.columns.toSet == Set("id", "s"))
  }

  test("DML rewrites read widened tables correctly: the declared-schema " +
      "victim scan upcasts narrower physical files") {
    // the rewriteScan fast path hands Spark the DECLARED schema instead of
    // merged footers — this pins the one case where declared and physical
    // types legitimately differ: files written BEFORE a widenColumnType
    // carry the narrow type and must upcast under the declared read
    val dir = tmpTable("widendml")
    TableManifest.publish(
      Seq((1, 10L), (2, 20L), (3, 30L)).toDF("k", "v"), dir) // k: INT files
    TableManifest.widenColumnType(spark, dir, "k", LongType)
    // UPDATE through the victim scan: k is declared LONG, files carry INT32
    TableManifest.updateWhere(spark, dir,
      Seq("v" -> (org.apache.spark.sql.functions.col("v") + 1L)),
      Some(org.apache.spark.sql.functions.col("k") === 2L))
    val rows = TableManifest.readTable(spark, dir)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 10L), (2L, 21L), (3L, 30L)),
      s"widened-table UPDATE must read int32 files as longs: $rows")
    // and a key-merge through the same scan path
    TableManifest.mergeByKey(spark, dir, "k",
      Seq((3L, 300L), (4L, 400L)).toDF("k", "v"))
    val rows2 = TableManifest.readTable(spark, dir)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(rows2 == Seq((1L, 10L), (2L, 21L), (3L, 300L), (4L, 400L)),
      s"widened-table MERGE must read int32 files as longs: $rows2")
  }

  test("manifest schema round-trips exact types, stored as a scan serves " +
      "them (nullable)") {
    val dir = tmpTable("types")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](), schema)
    TableManifest.publish(df, dir)
    // a declared non-null field is stored nullable: the manifest schema is
    // what a SCAN serves, and any listed file may predate a column — the
    // same view merged footer inference reports
    assert(TableManifest.readSchema(spark, dir).contains(nullable(schema)))
  }
}
