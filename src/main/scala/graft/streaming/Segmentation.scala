package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consumer-segmentation analytics — the reference's stated purpose
  * (README.md:2 "consumer segmentation … real-time and batch") that its
  * streaming job never implements (ST4 gap: no writeStream, no watermark, no
  * state — /root/reference/services/spark_streaming_processor.py:38-59).
  * Completed here with watermarked event-time operators; each works on a
  * streaming OR batch DataFrame carrying `event_ts` + union-schema columns.
  *
  * State design for scale: all operators key state by (window ∨ session,
  * user) — state size is bounded by the watermark horizon, not the stream
  * length; Spark drops expired state at each trigger.
  */
object Segmentation {

  /** Tumbling event-time counts per event type. Late data beyond `watermark`
    * is dropped (the reference had no late-data story at all). */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLen), col("event_name"))
      .count()

  /** Sessionization: gap-based session per user (sign_in → … → sign_out with
    * `gap` of inactivity closing the session). Uses the native session_window
    * operator — merging-window state, watermark-expired. */
  def sessions(
      events: DataFrame,
      watermark: String = "10 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .withWatermark("event_ts", watermark)
      .groupBy(session_window(col("event_ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_name") === graft.model.Event.ItemViewName, 1)
          .otherwise(0)).as("n_views"),
        sum(when(col("event_name") === graft.model.Event.AddedToCartName, 1)
          .otherwise(0)).as("n_cart_adds"),
        // CheckoutName is "checkout_to_cart" (the reference's quirky name)
        // — the constant exists so a literal typo can't zero the funnel
        sum(when(col("event_name") === graft.model.Event.CheckoutName, 1)
          .otherwise(0)).as("n_checkouts"))

  /** Streaming deduplication: drop events with a duplicate id arriving
    * within the watermark horizon (at-least-once sources like Kafka emit
    * duplicates on retry; state is bounded by the watermark, the 100 TB
    * posture for streaming dedup — an unbounded `dropDuplicates` would
    * grow state forever). */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream attribution join: purchases matched to the same user's
    * views within `horizonMinutes` before the purchase. Both sides are
    * watermarked; the time-range predicate bounds the join state Spark
    * must retain on each side. */
  def streamAttribution(
      views: DataFrame,
      purchases: DataFrame,
      watermark: String = "10 minutes",
      horizonMinutes: Int = 60): DataFrame = {
    val v = views.withWatermark("event_ts", watermark)
      .select(col("user_id").as("v_user"), col("event_ts").as("v_ts"),
        col("item_id").as("viewed_item"))
    val p = purchases.withWatermark("event_ts", watermark)
      .select(col("user_id").as("p_user"), col("event_ts").as("p_ts"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
  }

  /** Stream-static enrichment (J2 — the reference's intended
    * `movies_catalog_enriched` join that never got built): left-join the
    * event stream against a static catalog dimension, broadcast so each
    * microbatch avoids a shuffle. */
  def enrich(events: DataFrame, catalog: DataFrame): DataFrame =
    events.join(
      broadcast(catalog.select(
        col("ItemID").as("catalog_item_id"),
        col("Title").as("title_enriched"),
        col("Genre").as("genre_enriched"),
        col("ListPrice").as("list_price_enriched"))),
      col("item_id") === col("catalog_item_id"),
      "left_outer")
      .drop("catalog_item_id")

  /** Cart-funnel conversion per event-time window:
    * item_view → added_to_cart → checkout_to_cart. */
  def funnel(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLen))
      .agg(
        sum(when(col("event_name") === graft.model.Event.ItemViewName, 1)
          .otherwise(0)).as("views"),
        sum(when(col("event_name") === graft.model.Event.AddedToCartName, 1)
          .otherwise(0)).as("cart_adds"),
        sum(when(col("event_name") === graft.model.Event.CheckoutName, 1)
          .otherwise(0)).as("checkouts"))
      .withColumn("view_to_cart",
        when(col("views") > 0, col("cart_adds").cast("double") / col("views")))
      .withColumn("cart_to_checkout",
        when(col("cart_adds") > 0, col("checkouts").cast("double") / col("cart_adds")))
}
