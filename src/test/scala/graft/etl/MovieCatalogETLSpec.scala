package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class MovieCatalogETLSpec extends SparkSpec {

  /** Synthesized Movies.txt per FIXTURES.md A1: ITEM blocks with dirty
    * prices, duplicate keys, missing Title/Genre. */
  private def fixture(nItems: Int): (String, String) = {
    val sb = new StringBuilder
    (1 to nItems).foreach { i =>
      sb.append(s"ITEM $i\n")
      if (i % 7 != 0) sb.append(s"Title = Movie #$i\n")
      if (i % 5 != 0) sb.append(s"Genre = Genre${i % 3}\n")
      i % 4 match {
        case 0 => sb.append(s"ListPrice = ${i}99USD$$$i.99\n") // dirty form
        case 1 => sb.append(s"ListPrice = $i.50\n") // no '$' ⇒ 0.0
        case 2 => // missing entirely ⇒ 0.0 via clean()
        case 3 => sb.append(s"ListPrice = $$$i.25\n")
      }
      sb.append(s"Actor = Actor${i % 11}\n")
      sb.append(s"Actor = ShadowedActor$i\n") // duplicate key: first wins
      sb.append("\n")
    }
    val dir = Files.createDirectories(Paths.get("target/tmp/etl"))
    val f = dir.resolve(s"movies_$nItems.txt")
    Files.writeString(f, sb.toString)
    (f.toString, sb.toString)
  }

  test("end-to-end: block parse → pivot → clean, exact at any split layout") {
    val (path, _) = fixture(60)
    // Force many small input splits so blocks straddle split boundaries —
    // the case the reference's window trick gets wrong (SURVEY §7.4 #1).
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
    try {
      val catalog = MovieCatalogETL.run(spark, path).cache()
      assert(catalog.count() == 60)
      val rows = catalog.collect().map(r =>
        r.getString(r.fieldIndex("item_id")) -> r).toMap
      // first-wins duplicate key
      assert(rows("1").getString(rows("1").fieldIndex("Actor")) == "Actor1")
      // dirty price: i=4 → "499USD$4.99" → 4.99
      assert(rows("4").getFloat(rows("4").fieldIndex("ListPrice")) == 4.99f)
      // no-$ price: i=5 → 0.0
      assert(rows("5").getFloat(rows("5").fieldIndex("ListPrice")) == 0.0f)
      // missing price: i=6 → 0.0
      assert(rows("6").getFloat(rows("6").fieldIndex("ListPrice")) == 0.0f)
      // $-prefixed price: i=7 → 7.25
      assert(rows("7").getFloat(rows("7").fieldIndex("ListPrice")) == 7.25f)
      // fillna: i=7 (7%7==0) has no Title
      assert(rows("7").getString(rows("7").fieldIndex("Title")) == "Unknown")
      // fillna genre: i=5 (5%5==0) has no Genre
      assert(rows("5").getString(rows("5").fieldIndex("Genre")) == "Unknown Genre")
      // non-filled columns stay null (SURVEY §8.4): no Director column here,
      // but Actor is present for all rows — Title/Genre nulls were the only fills
      catalog.unpersist()
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("item ids are marker ordinals (1..n), strings after pivot") {
    val (path, _) = fixture(25)
    val catalog = MovieCatalogETL.run(spark, path)
    val ids = catalog.collect()
      .map(r => r.getString(r.fieldIndex("item_id")).toLong).sorted
    assert(ids.sameElements(1L to 25L))
    assert(catalog.schema("item_id").dataType.typeName == "string")
  }

  test("catalog diff keeps only unpublished items") {
    import spark.implicits._
    val (path, _) = fixture(20)
    val catalog = MovieCatalogETL.run(spark, path)
      .withColumnRenamed("item_id", "ItemID")
    val published = Seq("1", "2", "3", "17").toDF("movie_id")
    val fresh = CatalogDiff.newItems(catalog, published)
    assert(fresh.count() == 16)
    val events = CatalogDiff.enrichedEvents(fresh)
    assert(events.columns.toSeq == Seq(
      "timestamp", "event_name", "movie_id", "title", "genre", "list_price"))
    assert(events.collect().forall(_.getString(1) == "movie_catalog_enriched"))
  }
}
