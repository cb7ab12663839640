package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.model.Event
import org.apache.avro.Schema

class AvroSpec extends SparkSpec {

  test("programmatic schemas are byte-compatible with the reference .avsc files") {
    val refDir = Paths.get("/root/reference/schemas")
    assume(Files.isDirectory(refDir))
    val fileFor = Map(
      Event.SignInName -> "sign_in.avsc",
      Event.SignOutName -> "sign_out.avsc",
      Event.ItemViewName -> "item_view.avsc",
      Event.AddedToCartName -> "added_to_cart.avsc",
      Event.CheckoutName -> "checkout.avsc",
      Event.RegistrationName -> "consumer_registration.avsc",
      Event.CatalogName -> "movies_catalog_enriched.avsc")
    fileFor.foreach { case (name, file) =>
      val ref = new Schema.Parser().parse(
        Files.readString(refDir.resolve(file)))
      val ours = ConfluentAvro.schemaFor(name)
      // field names + types in order define the Avro binary layout
      assert(
        ours.getFields.toString == ref.getFields.toString,
        s"$name field layout differs from $file")
    }
  }

  test("Confluent frame round-trips (magic byte + BE schema id + body)") {
    val schema = ConfluentAvro.schemaFor(Event.SignInName)
    val body = ConfluentAvro.serialize(schema, Seq(
      "timestamp" -> "2024-01-01T00:00:00.000001",
      "event_name" -> "sign_in",
      "user_id" -> "42"))
    val framed = ConfluentAvro.frame(1234, body)
    assert(framed(0) == 0x0)
    val (id, decoded) = ConfluentAvro.unframe(framed)
    assert(id == 1234)
    val rec = ConfluentAvro.deserialize(schema, decoded)
    assert(rec.get("user_id").toString == "42")
    assert(rec.get("event_name").toString == "sign_in")
  }

  test("catalogFrames serializes the enriched diff executor-side") {
    import spark.implicits._
    val events = Seq(
      ("2024-01-01T00:00:00.000001", "movie_catalog_enriched", "7",
        "Movie #7", "Genre1", 7.25f))
      .toDF("timestamp", "event_name", "movie_id", "title", "genre", "list_price")
    val frames = ConfluentAvro.catalogFrames(events, schemaId = 99).collect()
    assert(frames.length == 1)
    val key = new String(frames(0).getAs[Array[Byte]]("key"), "UTF-8")
    assert(key == "7") // key = movie_id when no user_id (SURVEY §8.5)
    val (id, body) = ConfluentAvro.unframe(frames(0).getAs[Array[Byte]]("value"))
    assert(id == 99)
    val rec = ConfluentAvro.deserialize(
      ConfluentAvro.schemaFor(Event.CatalogName), body)
    assert(rec.get("title").toString == "Movie #7")
    assert(rec.get("list_price") == 7.25f)
  }
}
