package graft.io

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import graft.model._
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Confluent-wire-format Avro codec (magic byte 0x00 + 4-byte big-endian
  * schema id + Avro binary body), matching the reference's Schema-Registry
  * producer (/root/reference/services/kafka_event_publisher.py:17-55).
  *
  * The container ships only avro-java (no spark-avro connector jar), so the
  * record encode/decode is done directly against the Avro runtime inside
  * `mapPartitions` — writer and encoder are reused per partition, replacing
  * the reference's per-message produce+flush with batched executor-side work.
  * Schemas are built programmatically, byte-compatible with the .avsc files
  * in /root/reference/schemas (verified by AvroSpec round-trips).
  */
object ConfluentAvro {

  val Magic: Byte = 0x0

  /** Avro schema per event type ≅ the 7 .avsc files. */
  def schemaFor(eventName: String): Schema = {
    val fields: Seq[(String, String)] = eventName match {
      case Event.SignInName | Event.SignOutName =>
        Seq("timestamp" -> "string", "event_name" -> "string", "user_id" -> "string")
      case Event.ItemViewName =>
        Seq("timestamp" -> "string", "event_name" -> "string",
          "user_id" -> "string", "item_id" -> "string")
      case Event.AddedToCartName =>
        Seq("timestamp" -> "string", "event_name" -> "string",
          "user_id" -> "string", "item_id" -> "string", "cart_id" -> "string")
      case Event.CheckoutName =>
        Seq("timestamp" -> "string", "event_name" -> "string",
          "user_id" -> "string", "cart_id" -> "string", "payment_method" -> "string")
      case Event.RegistrationName =>
        Seq("timestamp" -> "string", "event_name" -> "string",
          "user_id" -> "string", "age" -> "int",
          "masked_email" -> "string", "preferred_language" -> "string")
      case Event.CatalogName =>
        Seq("timestamp" -> "string", "event_name" -> "string",
          "movie_id" -> "string", "title" -> "string",
          "genre" -> "string", "list_price" -> "float")
      case other => throw new IllegalArgumentException(s"unknown event: $other")
    }
    // record names pinned to the reference .avsc files VERBATIM
    // (/root/reference/schemas/*.avsc) — a record-name change is a
    // backward-incompatible schema under Confluent's default compatibility
    // mode, so a derived name ("SignIn" vs the registry's "SignInEvent")
    // would be rejected at registration (or silently allocate a new id)
    // against a registry populated by the reference stack
    val recordName = eventName match {
      case Event.SignInName => "SignInEvent" // sign_in.avsc:2
      case Event.SignOutName => "SignOutEvent"
      case Event.ItemViewName => "ItemViewEvent"
      case Event.AddedToCartName => "AddedToCartEvent"
      case Event.CheckoutName => "CheckoutEvent" // checkout.avsc:2
      case Event.RegistrationName => "ConsumerRegistration"
      case _ => "MovieCatalogEnriched" // only CatalogName reaches here
    }
    val sb = new StringBuilder
    sb.append(s"""{"type":"record","name":"$recordName","fields":[""")
    sb.append(fields.map { case (n, t) =>
      s"""{"name":"$n","type":"$t"}"""
    }.mkString(","))
    sb.append("]}")
    new Schema.Parser().parse(sb.toString)
  }

  /** Frame an Avro body in the Confluent wire format. */
  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(5 + body.length)
    buf.put(Magic).putInt(schemaId).put(body)
    buf.array()
  }

  /** Split a Confluent frame into (schemaId, avro body). */
  def unframe(msg: Array[Byte]): (Int, Array[Byte]) = {
    require(msg.length >= 5 && msg(0) == Magic, "not a Confluent Avro frame")
    val buf = ByteBuffer.wrap(msg)
    buf.get()
    val id = buf.getInt
    (id, java.util.Arrays.copyOfRange(msg, 5, msg.length))
  }

  def serialize(schema: Schema, fields: Seq[(String, Any)]): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fields.foreach { case (k, v) => rec.put(k, v) }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def deserialize(schema: Schema, body: Array[Byte]): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(body, null)
    new GenericDatumReader[GenericRecord](schema).read(null, dec)
  }

  /** Kafka-shaped publish frames for the enriched-catalog diff: one
    * (key, value) binary row per event, serialized executor-side with
    * per-partition writer reuse. Message key = movie_id (reference rule:
    * user_id else movie_id else "unknown",
    * /root/reference/services/kafka_event_publisher.py:44). */
  def catalogFrames(events: DataFrame, schemaId: Int): DataFrame = {
    import events.sparkSession.implicits._
    val schemaJson = schemaFor(Event.CatalogName).toString
    events.select("timestamp", "event_name", "movie_id", "title", "genre", "list_price")
      .as[(String, String, String, String, String, Float)]
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        it.map { case (ts, name, id, title, genre, price) =>
          val rec = new GenericData.Record(schema)
          rec.put("timestamp", ts); rec.put("event_name", name)
          rec.put("movie_id", id); rec.put("title", title)
          rec.put("genre", genre); rec.put("list_price", price)
          val out = new ByteArrayOutputStream()
          val enc = EncoderFactory.get().binaryEncoder(out, null)
          writer.write(rec, enc)
          enc.flush()
          val key = if (id == null) "unknown" else id
          (key.getBytes("UTF-8"), frame(schemaId, out.toByteArray))
        }
      }.toDF("key", "value")
  }

  /** Produce path against the registry seam: the schema id is whatever the
    * resolver assigns for the subject (Confluent naming: `<topic>-value`) —
    * the reference's register-then-cache flow
    * (/root/reference/services/kafka_event_publisher.py:24-40). */
  def catalogFramesResolved(
      events: DataFrame,
      resolver: SchemaResolver,
      topic: String = "catalog_update"): DataFrame =
    catalogFrames(events,
      resolver.register(s"$topic-value", schemaFor(Event.CatalogName)))

  /** Consume path: unframe each message, resolve its embedded schema id
    * through the seam (cached per partition — one resolver hit per distinct
    * id, the client-cache behavior), deserialize, and project back to typed
    * catalog columns. */
  def decodeCatalogFrames(frames: DataFrame, resolver: SchemaResolver): DataFrame = {
    import frames.sparkSession.implicits._
    frames.select("value").as[Array[Byte]]
      .mapPartitions { it =>
        val schemaCache = scala.collection.mutable.Map.empty[Int, Schema]
        it.map { msg =>
          val (id, body) = unframe(msg)
          val schema = schemaCache.getOrElseUpdate(id, resolver.schemaById(id))
          val rec = deserialize(schema, body)
          def s(f: String): String =
            Option(rec.get(f)).map(_.toString).orNull
          (s("timestamp"), s("event_name"), s("movie_id"), s("title"),
            s("genre"), rec.get("list_price").asInstanceOf[Float])
        }
      }.toDF("timestamp", "event_name", "movie_id", "title", "genre", "list_price")
  }
}
