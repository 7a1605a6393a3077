package graft

import graft.adsb.AdsbSchemas
import org.apache.spark.sql.functions._

/** A13: raw feed DOCUMENTS → wire records, engine-side — the
  * container explode the reference does in its Python scraper
  * (scraper.py:195,319,431 for readsb-style feeds, :626-655 for
  * OpenSky's positional state vectors).
  */
class FeedDocumentSpec extends SparkSpecBase {
  import spark.implicits._

  test("readsb feed document explodes to wire records, skipping no-position aircraft") {
    val doc =
      """{"now": 1700000000.5, "messages": 42,
        | "aircraft": [
        |  {"hex":"AB12CD","flight":"UAL1 ","lat":40.0,"lon":-75.0,"alt_baro":"3500","gs":250.5},
        |  {"hex":"NOPOS1","flight":"GHOST"},
        |  {"hex":"EF56GH","flight":"BAW9 ","lat":51.5,"lon":-0.1,"alt_baro":"ground","gs":0.0}
        | ]}""".stripMargin.replace("\n", "")
    val recs = AdsbSchemas.parseFeedDocument(
      Seq(doc).toDF("json"), "json", AdsbSchemas.rawLocalSchema)
    assert(recs.count() == 2) // no-position aircraft skipped
    val normalized = AdsbSchemas.normalizeLocal(
      recs.withColumn("source", lit("local"))
        .withColumn("scrape_time", lit("2024-01-10 00:00:00").cast("timestamp")))
    val rows = normalized.select("icao24", "alt_baro").orderBy("icao24").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ab12cd", "ef56gh"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(3500, 0)) // 'ground' → 0
  }

  test("the regional feed's 'ac' container is supported") {
    val doc = """{"ac": [{"hex":"AA","lat":1.0,"lon":2.0}, {"hex":"BB"}]}"""
    val recs = AdsbSchemas.parseFeedDocument(
      Seq(doc).toDF("json"), "json", AdsbSchemas.rawRegionalSchema, container = "ac")
    assert(recs.select("hex").as[String].collect().toSeq == Seq("AA"))
  }

  test("malformed feed documents yield zero records, never an exception") {
    val docs = Seq("{not json", """{"aircraft": "not-an-array"}""", "",
      """{"aircraft": []}""").toDF("json")
    assert(AdsbSchemas.parseFeedDocument(docs, "json",
      AdsbSchemas.rawLocalSchema).count() == 0)
    assert(AdsbSchemas.parseOpenSkyStates(
      Seq("{bad", """{"states": null}""").toDF("json"), "json").count() == 0)
  }

  test("OpenSky positional state vectors parse by index with the scraper's cleanups") {
    val doc =
      """{"time": 1700000001, "states": [
        |  ["ab12cd", "UAL1    ", " United States ", 1700000000, 1700000001,
        |   -75.1, 40.2, 3500.5, false, 250.0, 180.0, -5.5, [1, 2], 3600.0, "1200", 1, 2],
        |  ["dead00", null, null, null, 1700000001,
        |   null, null, null, true, null, null, null, null, null, null, 0, 0]
        | ]}""".stripMargin.replace("\n", "")
    val out = AdsbSchemas.parseOpenSkyStates(Seq(doc).toDF("json"), "json")
    val rows = out.collect()
    assert(rows.length == 1) // null lat/lon dropped, like the scraper
    val r = rows.head
    assert(r.getAs[String]("icao24") == "ab12cd")
    assert(r.getAs[String]("origin_country") == "United States") // trimmed
    assert(r.getAs[Double]("lon") == -75.1 && r.getAs[Double]("lat") == 40.2)
    assert(r.getAs[Int]("spi") == 1)
    assert(r.getAs[scala.collection.Seq[Int]]("sensors").toSeq == Seq(1, 2))
    assert(r.getAs[Int]("position_source") == 2)
    assert(r.getAs[Long]("api_time") == 1700000001L)

    // and the parsed records feed the OpenSky MV unchanged
    val normalized = AdsbSchemas.normalizeOpenSky(
      out.withColumn("source", lit("opensky"))
        .withColumn("scrape_time", lit("2024-01-10 00:00:00").cast("timestamp")))
    val n = normalized.select("icao24", "alt_baro", "ground_speed").collect().head
    assert(n.getString(0) == "ab12cd")
    assert(n.getInt(1) == (3500.5 * 3.28084).toInt) // meters → feet
  }
}
