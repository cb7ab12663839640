package graft.model

import org.apache.spark.sql.types._

/** Programmatic schemas mirroring the reference's explicit StructTypes. */
object Schemas {

  /** The streaming decode schema: the union of all 7 event types' fields —
    * 9 fields, the per-type ones nullable
    * (/root/reference/services/spark_streaming_processor.py:27-36).
    * `timestamp` stays a string at the wire, exactly as the reference;
    * EventDecode adds a parsed TimestampType column for watermarks. */
  val eventUnion: StructType = StructType(Seq(
    StructField("timestamp", StringType, nullable = true),
    StructField("event_name", StringType, nullable = true),
    StructField("user_id", StringType, nullable = true),
    StructField("item_id", StringType, nullable = true),
    StructField("cart_id", StringType, nullable = true),
    StructField("payment_method", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("genre", StringType, nullable = true),
    StructField("list_price", FloatType, nullable = true)))

  /** Catalog read-projection used by the simulator
    * (/root/reference/UserActivitySimulator.py:48-50). */
  val catalogProjection: StructType = StructType(Seq(
    StructField("ItemID", StringType, nullable = true)))
}
