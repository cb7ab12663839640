package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `Tables.load` timestamp contract across testdata generations.
  *
  * Round 8 lesson: the driver regenerated /root/testdata and `events.ts`
  * changed from parquet TIMESTAMP(NANOS) (read as int64 via nanosAsLong) to
  * timestamp[us] (read as TIMESTAMP_NTZ) — and the then-unconditional nano
  * rewrite stopped analyzing, silently disabling 31 of 130 oracle queries.
  * This spec writes the same logical events rows in all three physical types
  * and asserts `Tables.load` converges each to identical session-zoned
  * TimestampType values, and that an unsupported type fails with the named
  * loader error instead of a deep analysis exception.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // Two instants with sub-second parts: 2024-03-01T12:34:56.789012Z and
  // 2024-03-01T00:00:00.000001Z, as micros since epoch.
  private val micros = Seq(1709296496789012L, 1709251200000001L)

  private def writeEvents(dir: String, df: org.apache.spark.sql.DataFrame): String = {
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def tmp(): String =
    Files.createTempDirectory("tables-spec").toAbsolutePath.toString

  /** Load via the production path and return (dataType, micro values). */
  private def loaded(dir: String): (DataType, Seq[Long]) = {
    val df = Tables.load(spark, dir, "events")
    val tpe = df.schema("ts").dataType
    val vals = df.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted
    (tpe, vals)
  }

  test("nano-long events.ts normalizes to TimestampType micros") {
    val dir = tmp()
    // legacy generation: int64 nanoseconds since epoch
    writeEvents(dir, micros.map(_ * 1000L).toDF("ts"))
    val (tpe, vals) = loaded(dir)
    assert(tpe == TimestampType)
    assert(vals == micros.sorted)
  }

  test("timestamp_ntz events.ts normalizes to identical TimestampType rows") {
    val dir = tmp()
    // current generation: parquet timestamp[us] without tz → TIMESTAMP_NTZ
    writeEvents(dir,
      micros.toDF("us").select(
        timestamp_micros($"us").cast(TimestampNTZType).as("ts")))
    val (tpe, vals) = loaded(dir)
    assert(tpe == TimestampType)
    assert(vals == micros.sorted)
  }

  test("session-zoned events.ts passes through unchanged") {
    val dir = tmp()
    writeEvents(dir, micros.toDF("us").select(timestamp_micros($"us").as("ts")))
    val (tpe, vals) = loaded(dir)
    assert(tpe == TimestampType)
    assert(vals == micros.sorted)
  }

  test("unsupported events.ts type fails loudly with the loader error") {
    val dir = tmp()
    writeEvents(dir, Seq("2024-03-01").toDF("ts"))
    val e = intercept[IllegalArgumentException](
      Tables.load(spark, dir, "events"))
    assert(e.getMessage.contains("unsupported type for timestamp column"))
    assert(e.getMessage.contains("ts"))
  }

  test("driver testdata events loads and yields TimestampType") {
    val df = Tables.load(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }
}
