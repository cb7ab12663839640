package graft.streaming

import graft.model.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's streaming decode (ST1–ST2,
  * /root/reference/services/spark_streaming_processor.py:44-51): Kafka binary
  * `value` → string → `from_json` against the 9-field union schema.
  *
  * Works identically on a batch or streaming DataFrame — the caller picks the
  * source. Upgrade over the reference (SURVEY.md §1.2): the ISO-8601 string
  * timestamp is additionally parsed to a typed `event_ts` so watermarks and
  * event-time windows downstream are possible at all.
  */
object EventDecode {

  /** `df` must carry a binary or string `value` column (Kafka shape).
    * try_to_timestamp, not to_timestamp: under Spark 4's default ANSI mode a
    * single malformed timestamp would otherwise fail the whole microbatch —
    * corrupt records must degrade to null event_ts, never kill the stream. */
  def decode(df: DataFrame): DataFrame =
    withEventTime(df.select(col("value").cast("string").as("value"))
      .select(from_json(col("value"), Schemas.eventUnion).as("data"))
      .select("data.*"))

  /** The event-time half of [[decode]] alone, for rows that arrive already
    * parsed to the union schema — e.g. the good half of
    * `sources.Ingest.jsonSplit`, where the corrupt rows went to quarantine
    * instead of becoming all-null decode output.
    *
    * Two patterns, not one: Python's `datetime.isoformat()` — the
    * reference producer's serializer — OMITS the fractional part entirely
    * whenever microsecond == 0 (`2024-01-01T00:00:00`), so a rigid
    * `.SSSSSS` pattern would silently null the event time of every
    * on-the-second event and drop it from watermarked windows. */
  def withEventTime(parsed: DataFrame): DataFrame =
    parsed.withColumn("event_ts",
      coalesce(
        try_to_timestamp(col("timestamp"), lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
        try_to_timestamp(col("timestamp"), lit("yyyy-MM-dd'T'HH:mm:ss"))))
}
