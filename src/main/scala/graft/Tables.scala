package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver testdata star schema (TESTDATA.md).
  *
  * Loads one parquet per table from an sf directory and registers temp views.
  * The `events.ts` column is written as parquet TIMESTAMP(NANOS); Spark does
  * not read nano timestamps natively, so we enable the nanos-as-long fallback
  * and normalize back to a microsecond TimestampType column — every downstream
  * consumer (watermarks, date_trunc, windows) expects TimestampType.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from `dir`, normalizing nano-timestamp columns. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // integer DIV, not `/` — double division rounds 19-digit nano longs
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Register all tables as temp views on this session (idempotent). */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
