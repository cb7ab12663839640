package graft.streaming

import graft.SparkSpec
import graft.gen.EventGen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("decode: JSON union → typed columns + parsed event_ts (batch path)") {
    val events = EventGen.batch(spark, 500, seed = 7)
    val decoded = EventDecode.decode(EventGen.asJson(events)).cache()
    assert(decoded.count() == 500)
    assert(decoded.schema.fieldNames.toSeq.take(9).toSet == Set(
      "timestamp", "event_name", "user_id", "item_id", "cart_id",
      "payment_method", "title", "genre", "list_price"))
    // every row's ISO string parses
    assert(decoded.filter(col("event_ts").isNull).count() == 0)
    // quirk preserved: checkout arrives as checkout_to_cart, never "checkout"
    assert(decoded.filter(col("event_name") === "checkout").count() == 0)
    assert(decoded.filter(col("event_name") === "checkout_to_cart").count() > 0)
    decoded.unpersist()
  }

  test("decode + windowed counts run as a real streaming query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val jsons = EventGen.asJson(EventGen.batch(spark, 200, seed = 11))
      .collect().map(_.getString(0))
    mem.addData(jsons.toSeq)
    val counts = Segmentation.windowedCounts(
      EventDecode.decode(mem.toDF().withColumnRenamed("value", "value")),
      watermark = "1 day", windowLen = "1 hour")
    val q = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      assert(rows.map(_.getLong(2)).sum == 200L)
      assert(rows.forall(_.getLong(2) > 0))
    } finally q.stop()
  }

  test("sessionization groups a user's burst into one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    // one user, 3 events within 30min gap, then one far later → 2 sessions
    def ev(ts: String, name: String) =
      s"""{"timestamp":"$ts","event_name":"$name","user_id":"u1"}"""
    mem.addData(Seq(
      ev("2024-01-01T10:00:00.000000", "sign_in"),
      ev("2024-01-01T10:10:00.000000", "item_view"),
      ev("2024-01-01T10:20:00.000000", "sign_out"),
      ev("2024-01-01T15:00:00.000000", "sign_in")))
    val sess = Segmentation.sessions(
      EventDecode.decode(mem.toDF()), watermark = "1 day", gap = "30 minutes")
    val q = sess.writeStream.format("memory")
      .queryName("sessions").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sorted.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("decode tolerates corrupt and non-JSON input (nulls, not crashes)") {
    import spark.implicits._
    val mixed = Seq(
      """{"timestamp":"2024-01-01T10:00:00.000000","event_name":"sign_in","user_id":"u1"}""",
      """{"broken json""",
      "not json at all",
      "",
      """{"timestamp":"oops-not-a-ts","event_name":"sign_in","user_id":"u2"}""")
      .toDF("value")
    val out = EventDecode.decode(mixed).collect()
    assert(out.length == 5) // row-preserving: bad rows become null columns
    val byUser = out.flatMap(r => Option(r.getString(r.fieldIndex("user_id"))))
    assert(byUser.toSet == Set("u1", "u2"))
    // unparsable timestamp string → null event_ts, row survives
    val u2 = out.find(r => r.getString(r.fieldIndex("user_id")) == "u2").get
    assert(u2.isNullAt(u2.fieldIndex("event_ts")))
  }

  test("stream-static enrichment joins the catalog without shuffling the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val catalog = Seq(
      ("1", "Movie One", "Drama", 9.99f),
      ("2", "Movie Two", "Comedy", 4.99f))
      .toDF("ItemID", "Title", "Genre", "ListPrice")
    val mem = MemoryStream[String]
    mem.addData(Seq(
      """{"timestamp":"2024-01-01T10:00:00.000000","event_name":"item_view","user_id":"u1","item_id":"1"}""",
      """{"timestamp":"2024-01-01T10:01:00.000000","event_name":"item_view","user_id":"u2","item_id":"77"}"""))
    val enriched = Segmentation.enrich(EventDecode.decode(mem.toDF()), catalog)
    val q = enriched.writeStream.format("memory")
      .queryName("enriched").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getString(r.fieldIndex("item_id")) ->
          Option(r.getString(r.fieldIndex("title_enriched")))).toMap
      assert(rows("1").contains("Movie One"))
      assert(rows("77").isEmpty) // left outer: unknown items survive, null-enriched
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicate ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    def ev(id: String, ts: String) =
      s"""{"timestamp":"$ts","event_name":"item_view","user_id":"$id"}"""
    mem.addData(Seq(
      ev("u1", "2024-01-01T10:00:00.000000"),
      ev("u1", "2024-01-01T10:00:00.000000"), // exact duplicate
      ev("u2", "2024-01-01T10:01:00.000000")))
    val deduped = Segmentation.dedupStream(
      EventDecode.decode(mem.toDF()), Seq("user_id", "timestamp"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      // duplicate arrives again in a later batch, still within watermark
      mem.addData(Seq(ev("u1", "2024-01-01T10:00:00.000000")))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").collect()
      assert(rows.length == 2, s"expected 2 deduped rows, got ${rows.length}")
    } finally q.stop()
  }

  test("stream-stream attribution join matches views within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[String]
    val pMem = MemoryStream[String]
    def ev(name: String, user: String, ts: String, item: String = "i1") =
      s"""{"timestamp":"$ts","event_name":"$name","user_id":"$user","item_id":"$item"}"""
    vMem.addData(Seq(
      ev("item_view", "u1", "2024-01-01T10:00:00.000000", "早"),
      ev("item_view", "u1", "2024-01-01T11:30:00.000000", "late"),
      ev("item_view", "u2", "2024-01-01T10:00:00.000000")))
    pMem.addData(Seq(
      ev("checkout_to_cart", "u1", "2024-01-01T12:00:00.000000")))
    val joined = Segmentation.streamAttribution(
      EventDecode.decode(vMem.toDF()),
      EventDecode.decode(pMem.toDF()),
      horizonMinutes = 60)
    val q = joined.writeStream.format("memory")
      .queryName("attribution").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("attribution").collect()
      // only u1's 11:30 view is within 60min of the 12:00 purchase
      assert(rows.length == 1)
      assert(rows(0).getString(rows(0).fieldIndex("viewed_item")) == "late")
    } finally q.stop()
  }

  test("funnel conversion ratios") {
    val events = EventGen.batch(spark, 2000, seed = 13)
      .withColumn("event_ts", to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    val f = Segmentation.funnel(events, windowLen = "1 day").collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val views = r.getLong(r.fieldIndex("views"))
      val adds = r.getLong(r.fieldIndex("cart_adds"))
      if (views > 0) {
        val conv = r.getDouble(r.fieldIndex("view_to_cart"))
        assert(math.abs(conv - adds.toDouble / views) < 1e-12)
      }
    }
  }
}
