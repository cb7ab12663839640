package graft.io

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format coverage beyond parquet/text: JSON-lines and CSV read
  * paths with explicit schemas (the shape external drops arrive in before
  * they are compacted to parquet). Round-trips the events table through
  * both formats and requires exact equality with the parquet original. */
class SourceFormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "user_id", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet

  test("JSON-lines round-trip with explicit schema") {
    val base = Files.createDirectories(
      Paths.get(s"target/tmp/sources_${System.nanoTime()}"))
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value", "props")
    val jsonDir = base.resolve("events_json").toString
    events.write.json(jsonDir)
    val back = spark.read.schema(schema).json(jsonDir)
    assert(canon(back) == canon(events))
  }

  test("CSV round-trip with explicit schema, quoting and header") {
    val base = Files.createDirectories(
      Paths.get(s"target/tmp/sources_${System.nanoTime()}"))
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value", "props")
    val csvDir = base.resolve("events_csv").toString
    // props is JSON carrying commas/quotes — the quote/escape options are
    // exactly what the round-trip verifies
    events.write.option("header", "true").option("escape", "\"").csv(csvDir)
    val back = spark.read.schema(schema)
      .option("header", "true").option("escape", "\"").csv(csvDir)
    assert(canon(back) == canon(events))
  }

  test("malformed CSV rows land in a corrupt-record column, not an abort") {
    val base = Files.createDirectories(
      Paths.get(s"target/tmp/sources_${System.nanoTime()}"))
    val f = base.resolve("bad.csv")
    Files.writeString(f,
      "event_id,user_id\n1,10\nnot_a_number,20\n3,30\n")
    val withCorrupt = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(withCorrupt)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(f.toString).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("event_id").isNotNull).count() == 2)
    df.unpersist()
  }
}
