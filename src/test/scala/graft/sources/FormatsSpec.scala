package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-format ingestion surface: CSV/JSON with schema enforcement and
  * corrupt-row quarantine ([[Ingest]]), plus the ORC read/write path with
  * predicate pushdown — the format coverage beyond parquet/text/graft-log. */
class FormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("CSV quarantine: typed good rows through, malformed lines kept verbatim") {
    val dir = Files.createTempDirectory("graft-csv").toFile.getAbsolutePath
    val lines = Seq(
      "1,alpha,0.5",
      "2,beta,0.75",
      "not-a-long,gamma,0.1", // bad id
      "3,delta,not-a-double", // bad score
      "4,epsilon,1.25")
    Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val (good, bad) = Ingest.csvWithQuarantine(spark, dir, schema)
    assert(good.count() == 3)
    assert(good.select(sum("id")).collect().head.getLong(0) == 1 + 2 + 4)
    val quarantined = bad.select(Ingest.CorruptCol).collect()
      .map(_.getString(0)).toSet
    assert(quarantined == Set(lines(2), lines(3)),
      s"quarantine must carry the raw lines verbatim: $quarantined")
  }

  test("JSON quarantine: schema-mismatched and unparseable lines quarantined") {
    val dir = Files.createTempDirectory("graft-json").toFile.getAbsolutePath
    val lines = Seq(
      """{"id": 1, "name": "alpha", "score": 0.5}""",
      """{"id": "NaN-id", "name": "bad", "score": 1.0}""", // type mismatch
      """{broken json""",
      "null", // parses to a NULL struct — must quarantine, not pass as all-null
      """{"id": 2, "name": "beta", "score": 0.25}""")
    Files.write(java.nio.file.Paths.get(dir, "part.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val (good, bad) = Ingest.jsonWithQuarantine(spark, dir, schema)
    assert(good.count() == 2 && bad.count() == 3)
    assert(bad.select(Ingest.CorruptCol).collect().map(_.getString(0))
      .contains("null"), "the literal null line must be quarantined verbatim")
    assert(good.select(collect_list("name")).collect().head
      .getSeq[String](0).toSet == Set("alpha", "beta"))
  }

  test("ORC round-trip preserves content; filters and columns push into the ORC scan") {
    val dir = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // content identity
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // pushdown: the scan itself must carry the predicate and prune columns
    val q = back.filter(col("lang") === "en").select("doc_id")
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan orc")).mkString
    assert(scan.contains("PushedFilters: [") && scan.contains("lang"),
      s"predicate not pushed into ORC scan: $scan")
    assert(!scan.contains("n_chars"), s"column pruning failed: $scan")
  }

  test("streaming JSON quarantine: both halves flow from one MemoryStream source") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      """{"id": 1, "name": "alpha", "score": 0.5}""",
      """{broken json""",
      """{"id": 2, "name": "beta", "score": 0.25}""",
      "null")
    val (good, bad) = Ingest.jsonSplit(mem.toDF().toDF("value"), schema)
    assert(good.isStreaming && bad.isStreaming,
      "the split must stay a streaming transformation")
    val gq = good.writeStream.format("memory").queryName("ingest_good")
      .outputMode("append").start()
    val bq = bad.writeStream.format("memory").queryName("ingest_bad")
      .outputMode("append").start()
    try {
      gq.processAllAvailable(); bq.processAllAvailable()
      val goodRows = spark.table("ingest_good").collect()
      assert(goodRows.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L))
      val badRows = spark.table("ingest_bad")
        .collect().map(_.getString(0)).toSet
      assert(badRows == Set("""{broken json""", "null"))
    } finally { gq.stop(); bq.stop() }
  }

  test("compressed CSV (gzip) writes and reads transparently") {
    val dir = Files.createTempDirectory("graft-csvgz").toFile.getAbsolutePath
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "lang")
    docs.write.mode("overwrite").option("codec", "gzip")
      .option("header", "true").csv(dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".csv.gz")),
      "expected gzip part files")
    val back = spark.read.option("header", "true")
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType))))
      .csv(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty)
  }
}
