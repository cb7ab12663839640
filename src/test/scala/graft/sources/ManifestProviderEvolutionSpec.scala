package graft.sources

import graft.SparkSpec
import graft.ops.TableManifest

/** Schema evolution through the `graft-manifest` provider: a table whose
  * later commits ADD a column must read identically through the DSv2
  * provider and through [[TableManifest.readTable]] (which merges footer
  * schemas) — a provider that infers from one sampled footer would
  * silently drop the evolved column for SQL consumers. */
class ManifestProviderEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("provider read sees a column added by a later commit, old rows NULL") {
    val dir = java.nio.file.Files
      .createTempDirectory("gm-evolve").toString
    // v1: (id, s)
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .repartition(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    // v2: append a file carrying an EVOLVED schema (id, s, score)
    val tmp = java.nio.file.Files.createTempDirectory("gm-evolve-add").toString
    Seq((3L, "c", 0.5)).toDF("id", "s", "score")
      .repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // name sorts AFTER the v1 part- files: a provider inferring from one
    // path-ordered sampled footer would pick the OLD schema and silently
    // drop `score` (the added- prefix would mask the bug by sorting first)
    val target = new java.io.File(dir, "zz-added-evolved.parquet")
    java.nio.file.Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files :+ target.getName, head).get

    val viaApi = TableManifest.readTable(spark, dir)
    assert(viaApi.columns.toSet == Set("id", "s", "score"),
      s"readTable merges the evolved schema: ${viaApi.columns.toSeq}")
    val viaProvider = spark.read.format("graft-manifest").load(dir)
    assert(viaProvider.columns.toSet == Set("id", "s", "score"),
      s"provider must see the evolved column too: ${viaProvider.columns.toSeq}")
    val got = viaProvider.select("id", "s", "score")
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5))))
  }

  test("a provider APPEND carrying a wider schema widens the declared schema in the same commit") {
    val dir = java.nio.file.Files
      .createTempDirectory("gm-evolve-write").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .repartition(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    val declared0 = TableManifest.readSchema(spark, dir).get
    assert(declared0.fieldNames.toSet == Set("id", "s"))
    // the write-side evolution path: a DataFrame append through the
    // provider with an EXTRA column — appendFiles merges the write schema
    // into the carried one in the SAME CAS commit, so no reader window
    // exists where the new files are listed but their column is hidden
    Seq((3L, "c", 0.5)).toDF("id", "s", "score")
      .write.format("graft-manifest").mode("append").save(dir)
    val declared = TableManifest.readSchema(spark, dir).get
    assert(declared.fieldNames.toSet == Set("id", "s", "score"),
      s"append widened the DECLARED schema: ${declared.fieldNames.toSeq}")
    val got = spark.read.format("graft-manifest").load(dir)
      .select("id", "s", "score")
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5))))
    // a NARROWER append cannot shrink the declared schema
    Seq((4L, "d")).toDF("id", "s")
      .write.format("graft-manifest").mode("append").save(dir)
    assert(TableManifest.readSchema(spark, dir).get.fieldNames.toSet ==
      Set("id", "s", "score"), "narrow append must not shrink the schema")
  }
}
