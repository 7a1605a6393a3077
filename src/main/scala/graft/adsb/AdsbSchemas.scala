package graft.adsb

import graft.operators.AdsbNormalize._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's four source schemas and their Kafka→storage
  * normalization MVs, column-for-column, as Spark transforms. A user
  * of the reference can point these at the same JSON feeds
  * (`from_json(rawSchema*)`) and get the same storage rows.
  *
  * References (all under /root/reference/schema/):
  * - local:        schema-local.sql:26-100 (wire), 199-293 (MV)
  * - regional:     schema-regional.sql (wire cols: local minus
  *                 track_rate/roll/weather block, dst/dir naming)
  * - globalStream: schema-global-stream.sql:26-91 (wire), 181-266 (MV)
  * - openSky:      schema-global-opensky.sql:22-46 (wire), 101-141
  *                 (MV with metric→imperial conversion)
  */
object AdsbSchemas {

  // ---------- wire (Kafka JSON) schemas ----------

  /** readsb-style aircraft.json fields common to local/regional/stream. */
  private val commonWire: Seq[StructField] = Seq(
    StructField("hex", StringType), StructField("type", StringType),
    StructField("flight", StringType),
    StructField("lat", DoubleType), StructField("lon", DoubleType),
    StructField("alt_baro", StringType), StructField("alt_geom", IntegerType),
    StructField("gs", FloatType), StructField("track", FloatType),
    StructField("baro_rate", IntegerType), StructField("geom_rate", IntegerType),
    StructField("ias", IntegerType), StructField("mach", FloatType),
    StructField("squawk", StringType), StructField("emergency", StringType),
    StructField("category", StringType),
    StructField("alert", BooleanType), StructField("spi", BooleanType),
    StructField("nav_qnh", FloatType), StructField("nav_altitude_mcp", IntegerType),
    StructField("nav_altitude_fms", IntegerType), StructField("nav_heading", FloatType),
    StructField("nav_modes", ArrayType(StringType)),
    StructField("version", IntegerType), StructField("nic", IntegerType),
    StructField("rc", IntegerType), StructField("nic_baro", IntegerType),
    StructField("nac_p", IntegerType), StructField("nac_v", IntegerType),
    StructField("sil", IntegerType), StructField("sil_type", StringType),
    StructField("gva", IntegerType), StructField("sda", IntegerType),
    StructField("rssi", FloatType), StructField("messages", IntegerType),
    StructField("mlat", ArrayType(StringType)), StructField("tisb", ArrayType(StringType)),
    StructField("seen_pos", FloatType), StructField("seen", FloatType),
    StructField("mag_heading", FloatType), StructField("true_heading", FloatType),
    StructField("tas", IntegerType), StructField("oat", IntegerType),
    StructField("tat", IntegerType), StructField("ws", IntegerType),
    StructField("wd", IntegerType), StructField("track_rate", FloatType),
    StructField("roll", FloatType), StructField("lastPosition", StringType),
    StructField("calc_track", IntegerType), StructField("gpsOkLat", DoubleType),
    StructField("gpsOkLon", DoubleType), StructField("gpsOkBefore", DoubleType),
    StructField("source", StringType), StructField("scrape_time", TimestampType))

  /** schema-local.sql:26-100 — adds registration/ownership metadata
    * and receiver-relative r_dst/r_dir.
    */
  val rawLocalSchema: StructType = StructType(commonWire ++ Seq(
    StructField("r", StringType), StructField("t", StringType),
    StructField("desc", StringType), StructField("ownOp", StringType),
    StructField("year", StringType),
    StructField("r_dst", FloatType), StructField("r_dir", FloatType),
    StructField("dbFlags", IntegerType)))

  /** schema-regional.sql — local's metadata, dst/dir naming, no
    * weather/attitude extras.
    */
  val rawRegionalSchema: StructType = StructType(commonWire
    .filterNot(f => Seq("track_rate", "roll", "tas", "oat", "tat", "ws", "wd",
      "lastPosition", "calc_track", "gpsOkLat", "gpsOkLon", "gpsOkBefore")
      .contains(f.name)) ++ Seq(
    StructField("r", StringType), StructField("t", StringType),
    StructField("desc", StringType), StructField("ownOp", StringType),
    StructField("year", StringType),
    StructField("dst", FloatType), StructField("dir", FloatType),
    StructField("dbFlags", IntegerType)))

  /** schema-global-stream.sql:26-91 — no aircraft-registry metadata. */
  val rawGlobalStreamSchema: StructType = StructType(commonWire)

  /** schema-global-opensky.sql:22-46 — OpenSky REST states (metric). */
  val rawOpenSkySchema: StructType = StructType(Seq(
    StructField("icao24", StringType), StructField("callsign", StringType),
    StructField("lat", DoubleType), StructField("lon", DoubleType),
    StructField("baro_altitude", FloatType), StructField("geo_altitude", FloatType),
    StructField("velocity", FloatType), StructField("true_track", FloatType),
    StructField("vertical_rate", FloatType),
    StructField("squawk", StringType), StructField("spi", IntegerType),
    StructField("origin_country", StringType),
    StructField("time_position", IntegerType), StructField("last_contact", IntegerType),
    StructField("on_ground", BooleanType), StructField("sensors", ArrayType(IntegerType)),
    StructField("position_source", IntegerType),
    StructField("source", StringType), StructField("scrape_time", TimestampType)))

  // ---------- normalization MVs ----------

  private def fI(n: String): Column = fillInt(col(n)).as(n)
  private def fF(n: String, as: String = null): Column =
    coalesce(col(n).cast("float"), lit(IntSentinel.toFloat))
      .as(if (as == null) n else as)
  private def fS(n: String, as: String = null): Column =
    fillString(col(n)).as(if (as == null) n else as)
  private def fB(n: String): Column = fillBool(col(n)).as(n)
  private def arr(n: String, as: String = null): Column =
    cleanArray(col(n)).as(if (as == null) n else as)

  /** The validity filter every MV applies (schema-local.sql:289-293). */
  private def valid(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull && col("lat").isNotNull && col("lon").isNotNull &&
      col("lat").between(-90, 90) && col("lon").between(-180, 180))

  /** Columns shared by the readsb-style MVs (schema-local.sql:199-293). */
  private def readsbCommon: Seq[Column] = Seq(
    normKey(fillString(col("hex"))).as("icao24"),
    fS("type"),
    normKey(fillString(col("flight"))).as("callsign"),
    col("lat"), col("lon"),
    parseAltBaro(col("alt_baro")).as("alt_baro"),
    fI("alt_geom"),
    fF("gs", "ground_speed"),
    fF("track"),
    coalesce(col("baro_rate"), lit(IntSentinel)).as("vertical_rate"),
    fI("geom_rate"),
    fI("ias"), fF("mach"),
    fS("squawk"), fS("emergency"), fS("category"),
    fB("alert"), fB("spi"),
    fF("nav_qnh"), fI("nav_altitude_mcp"), fI("nav_altitude_fms"), fF("nav_heading"),
    arr("nav_modes"),
    fI("version"), fI("nic"), fI("rc"), fI("nic_baro"),
    fI("nac_p"), fI("nac_v"), fI("sil"), fS("sil_type"), fI("gva"), fI("sda"),
    fF("rssi"), fI("messages"),
    arr("mlat"), arr("tisb"),
    coalesce(col("seen_pos"), lit(0.0f)).as("seen_pos"),
    coalesce(col("seen"), lit(0.0f)).as("seen"),
    col("source"), col("scrape_time"),
    current_timestamp().as("ingestion_time"))

  private def registryMeta: Seq[Column] = Seq(
    fS("r", "registration"), fS("t", "aircraft_type"), fS("desc", "description"),
    fS("ownOp", "owner_operator"), fS("year"))

  /** schema-local.sql:199-293. */
  def normalizeLocal(raw: DataFrame): DataFrame =
    valid(raw, "hex").select(readsbCommon ++ registryMeta ++ Seq(
      fF("r_dst", "distance"), fF("r_dir", "direction"),
      fF("track_rate"), fF("roll"), fF("mag_heading"), fF("true_heading"),
      fI("tas"), fI("oat"), fI("tat"),
      coalesce(col("ws"), lit(IntSentinel)).as("wind_speed"),
      coalesce(col("wd"), lit(IntSentinel)).as("wind_direction"),
      coalesce(col("dbFlags"), lit(IntSentinel)).as("db_flags"),
      fS("lastPosition", "last_position"), fI("calc_track"),
      coalesce(col("gpsOkLat"), lit(IntSentinel.toDouble)).as("gps_ok_lat"),
      coalesce(col("gpsOkLon"), lit(IntSentinel.toDouble)).as("gps_ok_lon"),
      coalesce(col("gpsOkBefore"), lit(IntSentinel.toDouble)).as("gps_ok_before")): _*)

  /** schema-regional.sql MV (dst/dir naming, no weather extras). */
  def normalizeRegional(raw: DataFrame): DataFrame =
    valid(raw, "hex").select(readsbCommon ++ registryMeta ++ Seq(
      fF("dst", "distance"), fF("dir", "direction"),
      fF("mag_heading"), fF("true_heading"),
      coalesce(col("dbFlags"), lit(IntSentinel)).as("db_flags")): _*)

  /** schema-global-stream.sql:181-266. */
  def normalizeGlobalStream(raw: DataFrame): DataFrame =
    valid(raw, "hex").select(readsbCommon ++ Seq(
      fF("track_rate"), fF("roll"), fF("mag_heading"), fF("true_heading"),
      fI("tas"), fI("oat"), fI("tat"),
      coalesce(col("ws"), lit(IntSentinel)).as("wind_speed"),
      coalesce(col("wd"), lit(IntSentinel)).as("wind_direction"),
      fS("lastPosition", "last_position"), fI("calc_track"),
      coalesce(col("gpsOkLat"), lit(IntSentinel.toDouble)).as("gps_ok_lat"),
      coalesce(col("gpsOkLon"), lit(IntSentinel.toDouble)).as("gps_ok_lon"),
      coalesce(col("gpsOkBefore"), lit(IntSentinel.toDouble)).as("gps_ok_before")): _*)

  /** schema-global-opensky.sql:101-141 — metric→imperial, enum decode,
    * epoch→timestamp, uppercase callsign (OpenSky pads callsigns).
    */
  def normalizeOpenSky(raw: DataFrame): DataFrame =
    valid(raw, "icao24").select(
      normKey(fillString(col("icao24"))).as("icao24"),
      upper(trim(fillString(col("callsign")))).as("callsign"),
      col("lat"), col("lon"),
      fillBool(col("on_ground")).as("on_ground"),
      when(col("baro_altitude").isNull && col("on_ground"), 0)
        .when(col("baro_altitude").isNull, IntSentinel)
        .otherwise(metersToFeet(col("baro_altitude"))).as("alt_baro"),
      when(col("geo_altitude").isNull, IntSentinel)
        .otherwise(metersToFeet(col("geo_altitude"))).as("alt_geom"),
      coalesce(msToKnots(col("velocity")).cast("float"), lit(IntSentinel.toFloat))
        .as("ground_speed"),
      fF("true_track", "track"),
      coalesce((col("vertical_rate") * 196.85f).cast("float"), lit(IntSentinel.toFloat))
        .as("vertical_rate"),
      fS("squawk"),
      coalesce(col("spi") === 1, lit(false)).as("spi"),
      fS("origin_country"),
      epochToTs(coalesce(col("time_position"), lit(0))).as("time_position"),
      epochToTs(coalesce(col("last_contact"), lit(0))).as("last_contact"),
      col("sensors"),
      decodePositionSource(coalesce(col("position_source"), lit(0)))
        .as("position_source"),
      col("source"), col("scrape_time"),
      current_timestamp().as("ingestion_time"))

  /** Parse a raw JSON feed line into wire columns (the Kafka-table
    * step; use with `readStream.format("kafka")`'s `value` column).
    */
  def parseJson(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    df.select(from_json(col(jsonCol), schema).as("j")).select(col("j.*"))

  /** [[parseJson]] with the DEAD-LETTER contract a production feed
    * needs (the reference's Kafka tables set
    * `kafka_handle_error_mode='stream'` and route `_error != ''` rows
    * to an errors MV — schema-local.sql's error tables): malformed
    * lines do NOT poison the batch or vanish silently; they come back
    * on the second frame with the raw payload preserved for replay.
    * The split uses PERMISSIVE mode's `columnNameOfCorruptRecord`
    * contract, NOT a null-struct test: partially-malformed JSON
    * (`{"hex": "x", "lat": }`) parses to an all-null STRUCT, so a
    * null-struct predicate silently admits garbage rows as all-null
    * records (found by this function's own spec). With the corrupt
    * column in the parse schema, any row the parser had to bail on
    * carries its raw text there — one row-local pass, no exceptions,
    * streaming-safe (both frames are map-side filters of the same
    * microbatch).
    */
  def parseJsonWithErrors(df: DataFrame, jsonCol: String,
                          schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema already claims the corrupt-record column")
    val schema2 = schema.add(StructField("_corrupt_record", StringType))
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema2,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")))
    val ok = parsed.filter(col("__j._corrupt_record").isNull)
      .select(col("__j.*")).drop("_corrupt_record")
    val errors = parsed.filter(col("__j._corrupt_record").isNotNull)
      .select(col(jsonCol).as("raw"), current_timestamp().as("error_time"))
    (ok, errors)
  }

  /** Parse a raw readsb-style FEED DOCUMENT (`{now, messages,
    * aircraft: [...]}` — what the ultrafeeder/adsb.fi HTTP APIs
    * return) into one wire record per aircraft: the scraper's
    * container explode + no-position skip
    * (adsb-scraper/scraper.py:195,319,431), engine-side, so the raw
    * API response can be ingested without the Python middleman.
    * `container` is "aircraft" for local/global-stream feeds, "ac"
    * for the adsb.fi regional feed.
    */
  def parseFeedDocument(df: DataFrame, jsonCol: String, schema: StructType,
                        container: String = "aircraft"): DataFrame =
    df.select(from_json(col(jsonCol), StructType(Seq(
        StructField("now", DoubleType), StructField("messages", LongType),
        StructField(container, ArrayType(schema))))).as("j"))
      .select(explode(col(s"j.$container")).as("ac"))
      .select(col("ac.*"))
      .filter(col("lat").isNotNull && col("lon").isNotNull)

  /** Parse an OpenSky `/states/all` response — POSITIONAL state
    * vectors (`{time, states: [[icao24, callsign, ...], ...]}`) —
    * into named wire columns, mirroring the scraper's index map and
    * cleanups exactly (adsb-scraper/scraper.py:626-655): lat/lon-null
    * rows dropped, string fields null→'', origin_country trimmed,
    * spi truthy→boolean. Elements parse as strings (JSON scalars of
    * any type coerce) and cast per index.
    */
  def parseOpenSkyStates(df: DataFrame, jsonCol: String): DataFrame = {
    def s(i: Int) = element_at(col("s"), i + 1) // scraper indexes from 0
    df.select(from_json(col(jsonCol), StructType(Seq(
        StructField("time", LongType),
        StructField("states", ArrayType(ArrayType(StringType)))))).as("j"))
      .select(col("j.time").as("api_time"), explode(col("j.states")).as("s"))
      .filter(s(5).isNotNull && s(6).isNotNull)
      .select(
        coalesce(s(0), lit("")).as("icao24"),
        coalesce(s(1), lit("")).as("callsign"),
        trim(coalesce(s(2), lit(""))).as("origin_country"),
        s(3).cast("int").as("time_position"),
        s(4).cast("int").as("last_contact"),
        s(5).cast("double").as("lon"),
        s(6).cast("double").as("lat"),
        s(7).cast("float").as("baro_altitude"),
        s(8).cast("boolean").as("on_ground"),
        s(9).cast("float").as("velocity"),
        s(10).cast("float").as("true_track"),
        s(11).cast("float").as("vertical_rate"),
        from_json(coalesce(s(12), lit("[]")), ArrayType(IntegerType)).as("sensors"),
        s(13).cast("float").as("geo_altitude"),
        coalesce(s(14), lit("")).as("squawk"),
        // scraper emits 1/0 ints (`1 if state[15] else 0`) — keep the
        // wire dtype so normalizeOpenSky's `spi === 1` applies as-is
        coalesce(s(15).cast("boolean"), lit(false)).cast("int").as("spi"),
        s(16).cast("int").as("position_source"),
        col("api_time"))
  }
}
