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
      // the RECORD NAME is part of registry-level compatibility: a name
      // drift is a backward-incompatible change under Confluent's default
      // mode even when the binary layout is identical
      assert(ours.getFullName == ref.getFullName,
        s"$name record name ${ours.getFullName} differs from $file's " +
          ref.getFullName)
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

  test("registry seam: stable ids per (subject, schema); unknown id rejected") {
    val reg = new InMemorySchemaRegistry
    val catalog = ConfluentAvro.schemaFor(Event.CatalogName)
    val signIn = ConfluentAvro.schemaFor(Event.SignInName)
    val id1 = reg.register("catalog_update-value", catalog)
    val id2 = reg.register("catalog_update-value", catalog) // re-register = same id
    val id3 = reg.register("events-value", signIn)
    assert(id1 == id2 && id1 != id3)
    assert(reg.schemaById(id3).getFields.toString == signIn.getFields.toString)
    assertThrows[IllegalArgumentException](reg.schemaById(9999))
  }

  test("produce→log→consume round-trip: resolver-framed messages through the graft-log source") {
    import spark.implicits._
    val reg = new InMemorySchemaRegistry
    val events = (1 to 5).map(i =>
      (s"2024-01-01T00:00:00.00000$i", "movie_catalog_enriched", s"$i",
        s"Movie #$i", "Drama", i.toFloat))
      .toDF("timestamp", "event_name", "movie_id", "title", "genre", "list_price")

    // produce: executor-side framing, registry-assigned id, one log segment
    val dir = Files.createTempDirectory("graftlog-avro").toFile.getAbsolutePath
    val n = graft.sources.FileLogSink.publish(
      ConfluentAvro.catalogFramesResolved(events, reg), dir)
    assert(n == 5)

    // consume: DSv2 batch read + resolver-driven unframe/deserialize
    val read = spark.read.format("graft-log").load(dir)
    val decoded = ConfluentAvro.decodeCatalogFrames(read, reg)
      .orderBy("movie_id").collect()
    assert(decoded.length == 5)
    assert(decoded.map(_.getAs[String]("title")).toSeq ==
      (1 to 5).map(i => s"Movie #$i"))
    assert(decoded.map(_.getAs[Float]("list_price")).toSeq ==
      (1 to 5).map(_.toFloat))
  }
}
