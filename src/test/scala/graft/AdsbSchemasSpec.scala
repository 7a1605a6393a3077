package graft

import graft.adsb.AdsbSchemas
import org.apache.spark.sql.functions._

/** Full-schema pipeline specs: raw JSON feed lines through the
  * reference's MV semantics, per source.
  */
class AdsbSchemasSpec extends SparkSpecBase {
  import spark.implicits._

  private val localJson = Seq(
    // normal airborne report
    """{"hex":" ABC123 ","type":"adsb_icao","flight":" BAW12  ","r":"G-ABCD","t":"A320",
       "desc":"AIRBUS A-320","ownOp":"BA","year":"2001","lat":51.47,"lon":-0.45,
       "alt_baro":"37000","alt_geom":37500,"gs":450.5,"track":270.1,"baro_rate":-64,
       "nav_modes":[" AUTOPILOT ","","tcas"],"mlat":[],"tisb":[],
       "squawk":"2200","alert":false,"spi":false,"seen":0.1,"seen_pos":0.4,
       "r_dst":12.5,"r_dir":184.0,"source":"local","scrape_time":"2026-01-01T00:00:00Z"}""",
    // on ground, sparse fields
    """{"hex":"DEF456","alt_baro":"ground","lat":51.1,"lon":-0.2,
       "source":"local","scrape_time":"2026-01-01T00:00:05Z"}""",
    // invalid: lat out of range → dropped
    """{"hex":"BAD999","lat":95.0,"lon":0.0,"source":"local","scrape_time":"2026-01-01T00:00:05Z"}""",
    // invalid: no hex → dropped
    """{"lat":50.0,"lon":0.0,"source":"local","scrape_time":"2026-01-01T00:00:05Z"}""")
    .map(_.replaceAll("\n\\s*", ""))

  test("local pipeline: parse → normalize matches the reference MV") {
    val raw = AdsbSchemas.parseJson(localJson.toDF("value"), "value",
      AdsbSchemas.rawLocalSchema)
    val out = AdsbSchemas.normalizeLocal(raw)
    val rows = out.collect().map(r => r.getAs[String]("icao24") -> r).toMap
    assert(rows.keySet == Set("abc123", "def456"))
    val a = rows("abc123")
    assert(a.getAs[String]("callsign") == "baw12")          // trim+lower
    assert(a.getAs[String]("registration") == "G-ABCD")
    assert(a.getAs[Int]("alt_baro") == 37000)
    assert(a.getAs[Int]("vertical_rate") == -64)            // baro_rate renamed
    assert(a.getAs[Float]("distance") == 12.5f)             // r_dst renamed
    assert(a.getAs[scala.collection.Seq[String]]("nav_modes").toSeq == Seq("autopilot", "tcas"))
    val g = rows("def456")
    assert(g.getAs[Int]("alt_baro") == 0)                   // 'ground'
    assert(g.getAs[Float]("ground_speed") == -9999.0f)      // sentinel
    assert(g.getAs[String]("callsign") == "")               // '' fill
    assert(out.columns.length == 64)                        // full storage schema
    assert(out.columns.contains("db_flags"))
  }

  test("opensky pipeline: metric→imperial conversion and enum decode") {
    val json = Seq(
      """{"icao24":"AB12CD","callsign":"DLH9X  ","lat":50.0,"lon":8.5,
         "baro_altitude":10000.0,"geo_altitude":10200.0,"velocity":250.0,
         "true_track":45.5,"vertical_rate":-5.2,"squawk":"1000","spi":0,
         "origin_country":"Germany","time_position":1700000000,"last_contact":1700000010,
         "on_ground":false,"sensors":[],"position_source":2,
         "source":"opensky","scrape_time":"2026-01-01T00:00:00Z"}""",
      """{"icao24":"GRND01","lat":50.0,"lon":8.0,"on_ground":true,
         "source":"opensky","scrape_time":"2026-01-01T00:00:00Z"}""")
      .map(_.replaceAll("\n\\s*", ""))
    val raw = AdsbSchemas.parseJson(json.toDF("value"), "value",
      AdsbSchemas.rawOpenSkySchema)
    val out = AdsbSchemas.normalizeOpenSky(raw).collect()
      .map(r => r.getAs[String]("icao24") -> r).toMap
    val a = out("ab12cd")
    assert(a.getAs[String]("callsign") == "DLH9X")                  // upper+trim
    assert(a.getAs[Int]("alt_baro") == (10000.0f * 3.28084).toInt)  // m→ft
    assert(math.abs(a.getAs[Float]("ground_speed") - 250.0f * 1.94384f) < 0.5f) // m/s→kn
    assert(a.getAs[String]("position_source") == "MLAT")            // enum decode
    assert(a.getAs[java.sql.Timestamp]("time_position").getTime == 1700000000000L)
    val g = out("grnd01")
    assert(g.getAs[Int]("alt_baro") == 0)       // null baro + on_ground → 0
    assert(g.getAs[Int]("alt_geom") == -9999)   // null → sentinel
  }

  test("regional and global-stream pipelines produce their schema shapes") {
    val raw = AdsbSchemas.parseJson(localJson.toDF("value"), "value",
      AdsbSchemas.rawRegionalSchema)
    val reg = AdsbSchemas.normalizeRegional(
      raw.withColumn("dst", lit(3.0f)).withColumn("dir", lit(90.0f)))
    assert(reg.columns.contains("distance") && reg.columns.contains("registration"))
    assert(reg.count() == 2)

    val gsRaw = AdsbSchemas.parseJson(localJson.toDF("value"), "value",
      AdsbSchemas.rawGlobalStreamSchema)
    val gs = AdsbSchemas.normalizeGlobalStream(gsRaw)
    assert(!gs.columns.contains("registration")) // stream feed has no registry meta
    assert(gs.columns.contains("wind_speed"))
    assert(gs.count() == 2)
  }

  test("A14: malformed feed lines dead-letter with the raw payload, valid lines parse") {
    val mixed = Seq(
      """{"hex": "abc123", "lat": 51.0, "lon": -0.1}""",
      """not json at all""",
      """{"hex": "def456", "lat": }""",          // truncated value
      """{"hex": "ghi789", "lat": 10.0, "lon": 10.0}""").toDF("value")
    val (ok, errors) = AdsbSchemas.parseJsonWithErrors(
      mixed, "value", AdsbSchemas.rawLocalSchema)
    assert(ok.select("hex").as[String].collect().toSet == Set("abc123", "ghi789"))
    val raws = errors.select("raw").as[String].collect().toSet
    assert(raws == Set("not json at all", """{"hex": "def456", "lat": }"""),
      "dead-letter frame must preserve the exact raw payload for replay")
    // nothing lost, nothing duplicated
    assert(ok.count() + errors.count() == 4)
  }
}
