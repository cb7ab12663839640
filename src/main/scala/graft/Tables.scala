package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver testdata star schema (TESTDATA.md).
  *
  * Loads one parquet per table from an sf directory and registers temp views.
  * The `events.ts` column has shipped in different physical types across
  * testdata generations — parquet TIMESTAMP(NANOS) (read as an int64 long via
  * the nanos-as-long fallback), timestamp[us] (read as TIMESTAMP_NTZ), and
  * session-zoned TimestampType. Normalization therefore branches on the type
  * Spark actually read, so an upstream regeneration can never silently change
  * query semantics: every variant converges to the same session-zoned
  * microsecond TimestampType that downstream consumers (watermarks,
  * date_trunc, windows) expect, and an unrecognized type fails loudly.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from `dir`, normalizing the events timestamp column to
    * session-zoned TimestampType regardless of the physical parquet type. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df, "ts", s"$dir/$name.parquet")
    else df
  }

  /** Rewrite `col` to session-zoned TimestampType, branching on the type the
    * parquet reader produced. Unknown types fail with a named error rather
    * than letting an analysis exception surface deep inside a query plan. */
  private[graft] def normalizeTs(
      df: DataFrame, tsCol: String, where: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(tsCol).dataType match {
      // TIMESTAMP(NANOS) via nanosAsLong fallback: integer DIV, not `/` —
      // double division rounds 19-digit nano longs
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
      // timestamp[us] without tz metadata reads as TIMESTAMP_NTZ; the values
      // are UTC wall-clock, so reinterpret in the session zone (UTC for all
      // graft entrypoints) for parity with the nano-long path's output
      case TimestampNTZType =>
        df.withColumn(tsCol, to_timestamp(df.col(tsCol)))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"graft.Tables: unsupported type for timestamp column `$tsCol` in " +
          s"$where: $other (expected int64 nanos, timestamp_ntz, or timestamp)")
    }
  }

  /** Register all tables as temp views on this session (idempotent). */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
