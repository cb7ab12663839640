package graft.gen

import graft.model.Event
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The reference's event simulator (S10;
  * /root/reference/UserActivitySimulator.py:73-118,
  * /root/reference/UserEvents.py:59-162) rebuilt as a declarative generator:
  * `spark.range(n)` + seeded column expressions in batch, and the `rate`
  * source with the same expressions for a live stream. Runs entirely on
  * executors — the reference's one-event-per-second driver loop becomes
  * "any rows/sec you ask for".
  *
  * Distribution parity: 6 event types uniformly chosen; `user_id` ∈
  * 1..1,000,000; `age` ∈ 18..95; `preferred_language` ∈ {eng, geo, ""}
  * (empty string included — /root/reference/UserEvents.py:66);
  * `payment_method` ∈ {Cash, Card}; timestamps are microsecond ISO-8601
  * strings (/root/reference/UserEvents.py:14); checkout's event_name is
  * "checkout_to_cart" (/root/reference/UserEvents.py:150).
  */
object EventGen {

  val eventNames: Seq[String] = Seq(
    Event.SignInName, Event.SignOutName, Event.ItemViewName,
    Event.AddedToCartName, Event.CheckoutName, Event.RegistrationName)

  private def pick(options: Seq[String], r: Column): Column =
    element_at(array(options.map(lit): _*), (r * options.size).cast("int") + 1)

  /** Deterministic batch of n events in the union-schema shape
    * (graft.model.Schemas.eventUnion + a typed `event_ts`). */
  def batch(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val base = spark.range(n).toDF("id")
    val name = pick(eventNames, rand(seed))
    val hasItem = (c: Column) => c.isin(Event.ItemViewName, Event.AddedToCartName)
    val hasCart = (c: Column) => c.isin(Event.AddedToCartName, Event.CheckoutName)
    base
      .withColumn("event_name", name)
      .withColumn("event_ts",
        timestamp_micros(lit(1704067200000000L) + (rand(seed + 1) * 86400000000L).cast("long")))
      .withColumn("timestamp",
        date_format(col("event_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withColumn("user_id",
        ((rand(seed + 2) * 1000000).cast("long") + 1).cast("string"))
      .withColumn("item_id",
        when(hasItem(col("event_name")),
          ((rand(seed + 3) * 8701).cast("long") + 1).cast("string")))
      .withColumn("cart_id",
        when(hasCart(col("event_name")), uuid()))
      .withColumn("payment_method",
        when(col("event_name") === Event.CheckoutName,
          pick(Seq("Cash", "Card"), rand(seed + 4))))
      .withColumn("age",
        when(col("event_name") === Event.RegistrationName,
          (rand(seed + 5) * 78).cast("int") + 18))
      .withColumn("masked_email",
        when(col("event_name") === Event.RegistrationName,
          concat(lit("user"), col("user_id"), lit("@"),
            pick(Seq("gmail.com", "yahoo.com", "outlook.com"), rand(seed + 6)))))
      .withColumn("preferred_language",
        when(col("event_name") === Event.RegistrationName,
          pick(Seq("eng", "geo", ""), rand(seed + 7))))
      .drop("id")
  }

  /** JSON-encoded view of a generated batch — the shape a Kafka value column
    * would carry, for exercising the streaming decode path. */
  def asJson(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      col("timestamp"), col("event_name"), col("user_id"), col("item_id"),
      col("cart_id"), col("payment_method"), col("age"), col("masked_email"),
      col("preferred_language"))).as("value"))

  /** Live variant: the rate source emitting `rowsPerSecond`, same columns.
    * (The container has no Kafka broker/connector; the rate source stands in
    * as the unbounded input — the decode/segmentation operators downstream
    * are source-agnostic.) */
  def stream(spark: SparkSession, rowsPerSecond: Int, seed: Long = 42L): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    val name = pick(eventNames, rand(seed))
    raw.select(col("timestamp").as("event_ts"), col("value").as("id"))
      .withColumn("event_name", name)
      .withColumn("timestamp",
        date_format(col("event_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withColumn("user_id",
        ((rand(seed + 2) * 1000000).cast("long") + 1).cast("string"))
      .withColumn("item_id",
        when(col("event_name").isin(Event.ItemViewName, Event.AddedToCartName),
          ((rand(seed + 3) * 8701).cast("long") + 1).cast("string")))
      .withColumn("cart_id",
        when(col("event_name").isin(Event.AddedToCartName, Event.CheckoutName), uuid()))
      .withColumn("payment_method",
        when(col("event_name") === Event.CheckoutName,
          pick(Seq("Cash", "Card"), rand(seed + 4))))
      // registration fields — "same columns" as batch() is a CONTRACT:
      // asJson and TypedEvents.registrations select these by name, and a
      // stream emitting consumer_registration events without them fails
      // analysis (or silently loses the fields' distribution)
      .withColumn("age",
        when(col("event_name") === Event.RegistrationName,
          (rand(seed + 5) * 78).cast("int") + 18))
      .withColumn("masked_email",
        when(col("event_name") === Event.RegistrationName,
          concat(lit("user"), col("user_id"), lit("@"),
            pick(Seq("gmail.com", "yahoo.com", "outlook.com"), rand(seed + 6)))))
      .withColumn("preferred_language",
        when(col("event_name") === Event.RegistrationName,
          pick(Seq("eng", "geo", ""), rand(seed + 7))))
      .drop("id")
  }
}
