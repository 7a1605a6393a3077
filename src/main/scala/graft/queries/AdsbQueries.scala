package graft.queries

import graft.operators.{AdsbNormalize, CurrentState}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** A/B/C/D groups of SURVEY §2 — the reference's ingest-normalization,
  * storage-layout, current-state and dashboard semantics, exercised on
  * the `events` table (user_id≈icao24, ts≈scrape_time, event_type≈
  * source, value≈speed/altitude, props≈raw JSON payload — SURVEY §3).
  */
object AdsbQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // A1: raw JSON payload → typed column (the Kafka-consumer parse).
    QueryDef("a1_json_ingest",
      (s, dir) => ev(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events ORDER BY event_id""")),

    // A2: ifNull sentinel fills (-9999 / '').
    QueryDef("a2_sentinel_fill",
      (s, dir) => ev(s, dir)
        .select(col("event_id"),
          AdsbNormalize.fillInt(
            when(col("event_type") === "error", lit(null))
              .otherwise(get_json_object(col("props"), "$.k").cast("int"))).as("k_filled"),
          AdsbNormalize.fillString(
            when(col("event_type") === "view", lit(null)).otherwise(col("event_type")))
            .as("type_filled"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        coalesce(CASE WHEN event_type = 'error' THEN NULL
                      ELSE CAST(json_extract_string(props, '$.k') AS INT) END, -9999) AS k_filled,
        coalesce(CASE WHEN event_type = 'view' THEN NULL ELSE event_type END, '') AS type_filled
        FROM events ORDER BY event_id""")),

    // A3: the alt_baro CASE parse ('ground'→0, NULL→-9999, else cast).
    QueryDef("a3_alt_parse",
      (s, dir) => {
        val altStr = when(col("event_type") === "signup", lit("ground"))
          .when(col("event_type") === "error", lit(null))
          .otherwise(col("value").cast("int").cast("string"))
        ev(s, dir)
          .select(col("event_id"), AdsbNormalize.parseAltBaro(altStr).as("alt_baro"))
          .orderBy("event_id")
      },
      Some("""WITH raw AS (
          SELECT event_id,
            CASE WHEN event_type = 'signup' THEN 'ground'
                 WHEN event_type = 'error' THEN NULL
                 ELSE CAST(CAST(trunc(value) AS INT) AS VARCHAR) END AS alt_str
          FROM events)
        SELECT event_id,
          CASE WHEN alt_str = 'ground' THEN 0
               WHEN alt_str IS NULL THEN -9999
               ELSE CAST(alt_str AS INT) END AS alt_baro
        FROM raw ORDER BY event_id""")),

    // A4: trimBoth(lower(x)) key normalization.
    QueryDef("a4_string_norm",
      (s, dir) => ev(s, dir)
        .select(col("event_id"),
          AdsbNormalize.normKey(concat(lit("  "), upper(col("event_type")), lit("\t")))
            .as("norm_key"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        lower(trim('  ' || upper(event_type) || chr(9))) AS norm_key
        FROM events ORDER BY event_id""")),

    // A5: position validity filter (lat/lon bounds, keys non-null).
    QueryDef("a5_validity_filter",
      (s, dir) => {
        val withPos = ev(s, dir)
          .withColumn("lat", col("value") - 100.0)
          .withColumn("lon", col("value") * 3.0 - 200.0)
        AdsbNormalize.validPosition(withPos, "user_id", "lat", "lon")
          .select("event_id", "lat", "lon")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, value - 100.0 AS lat, value * 3.0 - 200.0 AS lon
        FROM events
        WHERE user_id IS NOT NULL
        AND value - 100.0 BETWEEN -90 AND 90
        AND value * 3.0 - 200.0 BETWEEN -180 AND 180
        ORDER BY event_id""")),

    // A6: OpenSky metric→imperial conversions, truncating int casts.
    QueryDef("a6_unit_convert",
      (s, dir) => ev(s, dir)
        .select(col("event_id"),
          AdsbNormalize.metersToFeet(col("value")).as("alt_ft"),
          AdsbNormalize.msToKnots(col("value")).as("speed_kn"),
          AdsbNormalize.msToFpm(col("value")).as("rate_fpm"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        CAST(trunc(value * 3.28084) AS INT) AS alt_ft,
        value * 1.94384 AS speed_kn,
        CAST(trunc(value * 196.85) AS INT) AS rate_fpm
        FROM events ORDER BY event_id""")),

    // A7: Enum8 position_source decode.
    QueryDef("a7_enum_decode",
      (s, dir) => ev(s, dir)
        .select(AdsbNormalize.decodePositionSource(col("user_id") % 4).as("position_source"))
        .groupBy("position_source").agg(count(lit(1)).as("n"))
        .orderBy("position_source"),
      Some("""SELECT CASE user_id % 4 WHEN 0 THEN 'ADS-B' WHEN 1 THEN 'ASTERIX'
          WHEN 2 THEN 'MLAT' WHEN 3 THEN 'FLARM' ELSE 'UNKNOWN' END AS position_source,
        COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY position_source""")),

    // A8: epoch seconds → timestamp (fromUnixTimestamp).
    QueryDef("a8_epoch_ts",
      (s, dir) => ev(s, dir)
        .select(col("event_id"),
          unix_micros(AdsbNormalize.epochToTs(col("user_id") * 1000L + 1700000000L))
            .as("ts_us"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        epoch_us(CAST(to_timestamp(user_id * 1000 + 1700000000) AS TIMESTAMP)) AS ts_us
        FROM events ORDER BY event_id""")),

    // A9: arrayFilter(≠'', arrayMap(trim∘lower)) over a token array.
    QueryDef("a9_array_clean",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          AdsbNormalize.cleanArray(split(col("text"), " ")).as("arr"))
        .select(col("doc_id"), size(col("arr")).as("n_words"),
          element_at(col("arr"), 1).as("first_word"),
          element_at(col("arr"), -1).as("last_word"))
        .orderBy("doc_id"),
      Some("""WITH c AS (
          SELECT doc_id,
            list_filter(list_transform(string_split(text, ' '), w -> lower(trim(w))),
                        w -> w != '') AS arr
          FROM documents)
        SELECT doc_id, CAST(len(arr) AS INT) AS n_words,
          arr[1] AS first_word, arr[-1] AS last_word
        FROM c ORDER BY doc_id""")),

    // B1: PARTITION BY toYYYYMMDD(ts) day bucketing.
    QueryDef("b1_partition_day",
      (s, dir) => CurrentState.withDayPartition(ev(s, dir), "ts")
        .groupBy("day").agg(count(lit(1)).as("n"))
        .orderBy("day"),
      Some("""SELECT strftime(ts, '%Y%m%d') AS day, COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY day""")),

    // B3: TTL retention relative to dataset max(ts).
    QueryDef("b3_ttl_retention",
      (s, dir) => CurrentState.applyTtl(ev(s, dir), "ts", "7 DAYS")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
        WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
        GROUP BY event_type ORDER BY event_type""")),

    // B4: Distributed-table union of shards.
    QueryDef("b4_distributed_union",
      (s, dir) => {
        val e = ev(s, dir)
        val shard0 = e.filter(col("user_id") % 2 === 0)
        val shard1 = e.filter(col("user_id") % 2 === 1)
        CurrentState.distributedUnion(Seq(shard0, shard1))
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n FROM (
          SELECT * FROM events WHERE user_id % 2 = 0
          UNION ALL SELECT * FROM events WHERE user_id % 2 = 1) u
        GROUP BY event_type ORDER BY event_type""")),

    // C1: ReplacingMergeTree FINAL / LIMIT 1 BY key.
    QueryDef("c1_latest_state",
      (s, dir) => CurrentState.latestBy(ev(s, dir), Seq("user_id"), "ts", "event_id")
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id"),
      Some("""SELECT user_id, event_id, event_type, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1 ORDER BY user_id""")),

    // C2: latest view with recency window (filter BEFORE the shuffle).
    QueryDef("c2_latest_recent",
      (s, dir) => CurrentState.latestBy(
          CurrentState.recentOnly(ev(s, dir), "ts", "1 HOUR"),
          Seq("user_id"), "ts", "event_id")
        .select("user_id", "event_id", "value")
        .orderBy("user_id"),
      Some("""SELECT user_id, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR) t
        WHERE rn = 1 ORDER BY user_id""")),

    // C3: combined-sources union → latest per key (the combined MVs).
    QueryDef("c3_combined_latest",
      (s, dir) => {
        val e = ev(s, dir)
        val txn = e.filter(col("event_type").isin("purchase", "signup"))
          .select(col("user_id"), col("ts"), col("event_id"), col("value"),
            lit("txn").as("source"))
        val web = e.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("ts"), col("event_id"), col("value"),
            lit("web").as("source"))
        CurrentState.latestBy(
            CurrentState.distributedUnion(Seq(txn, web)),
            Seq("user_id"), "ts", "event_id")
          .select("user_id", "source", "event_id", "value")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, source, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM (
            SELECT user_id, ts, event_id, value, 'txn' AS source FROM events
              WHERE event_type IN ('purchase', 'signup')
            UNION ALL
            SELECT user_id, ts, event_id, value, 'web' AS source FROM events
              WHERE event_type IN ('click', 'view')) u) t
        WHERE rn = 1 ORDER BY user_id""")),

    // C4: argMax aggregation (CH argMax ≈ Spark max_by).
    QueryDef("c4_argmax",
      (s, dir) => ev(s, dir)
        .groupBy("user_id")
        .agg(max_by(col("event_id"), col("ts")).as("last_event_id"),
          max_by(col("value"), col("ts")).as("last_value"),
          unix_micros(max(col("ts"))).as("last_ts_us"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
        arg_max(event_id, ts) AS last_event_id,
        arg_max(value, ts) AS last_value,
        epoch_us(CAST(max(ts) AS TIMESTAMP)) AS last_ts_us
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // D1: dashboard moving-aircraft filter over latest state.
    QueryDef("d1_moving_filter",
      (s, dir) => CurrentState.latestBy(ev(s, dir), Seq("user_id"), "ts", "event_id")
        .filter(col("value") > 50)
        .select("event_id", "user_id", "value")
        .orderBy(col("value"), col("event_id")),
      Some("""SELECT event_id, user_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1 AND value > 50 ORDER BY value, event_id""")),

    // D2: per-key time series inside a dashboard time range. The range
    // filter goes through Tables.tsRange so it lands on whichever
    // time column is physically raw and pushes into the parquet scan
    // (row-group pruning at scale); a filter on the derived twin
    // alone wouldn't push.
    QueryDef("d2_time_series",
      (s, dir) => Tables.tsRange(ev(s, dir),
          "2024-01-10T00:00:00Z", "2024-01-12T00:00:00Z")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy("ts_us", "event_id"),
      Some("""SELECT event_id, user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
        AND event_type = 'click'
        ORDER BY ts_us, event_id""")),

    // D3: every-nth-row decimation (exact total-order variant).
    QueryDef("d3_nth_sample",
      (s, dir) => CurrentState.nthSample(ev(s, dir), 4, Seq(col("ts"), col("event_id")))
        .select("event_id", "rn")
        .orderBy("rn"),
      Some("""SELECT event_id, rn FROM (
          SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS rn FROM events) t
        WHERE rn % 4 = 0 ORDER BY rn""")),

    // D3b: the scale path for decimation — modulo on the unique id,
    // no global window, no shuffle at all (the reference's
    // rowNumberInAllBlocks() % n is equally order-arbitrary; the
    // dashboard only cares about the sampling rate).
    QueryDef("d3b_modulo_sample",
      (s, dir) => CurrentState.moduloSample(ev(s, dir), 40, "event_id")
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events WHERE event_id % 40 = 0 ORDER BY event_id""")),

    // D15: flight-track simplification by heading-change dead-band —
    // the first-pass thinning an ADS-B map layer actually runs: keep
    // a point iff the track TURNS there (in/out bearing change above
    // a threshold), the time gap to the previous kept-candidate
    // exceeds the resample interval, or it is a trajectory endpoint.
    // Collinear cruise points drop; geometry is preserved where it
    // changes. Pure window work: one key shuffle, lag/lead neighbors,
    // row-local trig. The turn angle is quantized (q6) before the
    // threshold compare so a 1-ulp libm difference at the boundary
    // cannot flip the keep decision across engines (the d4 lesson).
    QueryDef("d15_track_simplify",
      (s, dir) => {
        import graft.functions.GeoFunctions
        val lat = (col("value") % 90.0) - 45.0
        val lon = (col("value") * 2.0 % 360.0) - 180.0
        val pts = ev(s, dir).select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), lat.as("lat"), lon.as("lon"))
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val nbr = pts
          .withColumn("plat", lag("lat", 1).over(w))
          .withColumn("plon", lag("lon", 1).over(w))
          .withColumn("nlat", lead("lat", 1).over(w))
          .withColumn("nlon", lead("lon", 1).over(w))
          .withColumn("pts_us", lag("ts_us", 1).over(w))
        val bIn = GeoFunctions.bearingDeg(col("plat"), col("plon"), col("lat"), col("lon"))
        val bOut = GeoFunctions.bearingDeg(col("lat"), col("lon"), col("nlat"), col("nlon"))
        val diff = abs(bOut - bIn)
        val turn = when(diff > 180.0, lit(360.0) - diff).otherwise(diff)
        nbr.filter(col("plat").isNull || col("nlat").isNull ||
            QueryDefs.q6(turn) > 20.0 ||
            (col("ts_us") - col("pts_us")) > 600L * 1000000L)
          .select("event_id", "user_id", "ts_us")
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some {
        def bearing(lat1: String, lon1: String, lat2: String, lon2: String) =
          s"""(degrees(atan2(
              sin(radians($lon2 - $lon1)) * cos(radians($lat2)),
              cos(radians($lat1)) * sin(radians($lat2)) -
              sin(radians($lat1)) * cos(radians($lat2)) * cos(radians($lon2 - $lon1))
            )) + 360.0) % 360.0"""
        s"""WITH pos AS (
            SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
              (value % 90.0) - 45.0 AS lat, (value * 2.0 % 360.0) - 180.0 AS lon
            FROM events),
          nb AS (
            SELECT *, lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
              lead(lat) OVER w AS nlat, lead(lon) OVER w AS nlon,
              lag(ts_us) OVER w AS pts_us
            FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
          b AS (SELECT *, ${bearing("plat", "plon", "lat", "lon")} AS b_in,
              ${bearing("lat", "lon", "nlat", "nlon")} AS b_out FROM nb),
          t AS (SELECT *, CASE WHEN abs(b_out - b_in) > 180.0
              THEN 360.0 - abs(b_out - b_in) ELSE abs(b_out - b_in) END AS turn FROM b)
          SELECT event_id, user_id, ts_us FROM t
          WHERE plat IS NULL OR nlat IS NULL
            OR floor(turn * 1000000.0 + 0.5) / 1000000.0 > 20.0
            OR (ts_us - pts_us) > 600000000
          ORDER BY user_id, ts_us, event_id"""
      }),

    // D4: receiver-relative distance/direction table (the reference's
    // r_dst/r_dir columns + nearest-first dashboard panel). Rounded to
    // 6 decimals: transcendental libm results can differ by an ulp
    // between engines.
    QueryDef("d4_nearest",
      (s, dir) => {
        val lat = (col("value") % 90.0) - 45.0
        val lon = (col("value") * 2.0 % 360.0) - 180.0
        ev(s, dir)
          .select(col("event_id"),
            QueryDefs.q6(graft.functions.GeoFunctions.haversineKm(lit(40.0), lit(-75.0), lat, lon))
              .as("dist_km"),
            QueryDefs.q6(graft.functions.GeoFunctions.bearingDeg(lit(40.0), lit(-75.0), lat, lon))
              .as("bearing_deg"))
          .orderBy("event_id")
      },
      Some("""WITH pos AS (
          SELECT event_id, (value % 90.0) - 45.0 AS lat, (value * 2.0 % 360.0) - 180.0 AS lon
          FROM events)
        SELECT event_id,
          floor((2.0 * 6371.0088 * asin(least(1.0, sqrt(
            pow(sin(radians(lat - 40.0) / 2.0), 2.0) +
            cos(radians(40.0)) * cos(radians(lat)) *
            pow(sin(radians(lon - (-75.0)) / 2.0), 2.0))))) * 1000000.0 + 0.5) / 1000000.0 AS dist_km,
          floor(((degrees(atan2(
              sin(radians(lon - (-75.0))) * cos(radians(lat)),
              cos(radians(40.0)) * sin(radians(lat)) -
              sin(radians(40.0)) * cos(radians(lat)) * cos(radians(lon - (-75.0)))
            )) + 360.0) % 360.0) * 1000000.0 + 0.5) / 1000000.0 AS bearing_deg
        FROM pos ORDER BY event_id""")),

    // D11: per-group z-score anomaly flags. Variance from exact
    // decimal sums — var = (Σx² − (Σx)²/n)/(n−1) — so the doubles are
    // engine-identical without relying on stddev implementations.
    QueryDef("d11_anomaly_zscore",
      (s, dir) => {
        val e = ev(s, dir)
        val dsumsq = sum((col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)"))).cast("double")
        val dsum1 = sum(col("value").cast("decimal(18,2)")).cast("double")
        val stats = e.groupBy(col("event_type").as("et"))
          .agg(dsum1.as("s1"), dsumsq.as("s2"), count(lit(1)).as("n"))
          .withColumn("mean", col("s1") / col("n"))
          .withColumn("variance",
            (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
        e.join(broadcast(stats), col("event_type") === col("et"))
          .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
          .filter(abs(col("z")) > 1.8)
          .select(col("event_id"), col("event_type"), col("value"), QueryDefs.q6(col("z")).as("z"))
          .orderBy("event_id")
      },
      Some("""WITH stats AS (
          SELECT event_type AS et,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
            CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2,
            COUNT(*) AS n
          FROM events GROUP BY event_type),
        st2 AS (SELECT et, s1 / n AS mean, (s2 - s1 * s1 / n) / (n - 1) AS variance FROM stats)
        SELECT event_id, event_type, value,
          floor(((value - mean) / sqrt(variance)) * 1000000.0 + 0.5) / 1000000.0 AS z
        FROM events JOIN st2 ON event_type = et
        WHERE abs((value - mean) / sqrt(variance)) > 1.8
        ORDER BY event_id""")),

    // D12: geomap grid-cell density — the map-tile aggregation behind
    // a dashboard's position heat layer: instead of shipping raw
    // points, bin positions into equirectangular grid cells and
    // aggregate per cell (count + decimal-exact mean altitude). One
    // map-side-combined aggregation on a small integer key pair; at
    // 100 TB the shuffle carries one row per occupied cell. The cell
    // math is rational double arithmetic only (no trig), so floors are
    // engine-identical — a Web-Mercator y-tile would put ln/tan under
    // a floor, where an ulp can flip the cell.
    QueryDef("d12_grid_density",
      (s, dir) => {
        val lat = (col("value") % 90.0) - 45.0
        val lon = (col("value") * 2.0 % 360.0) - 180.0
        ev(s, dir)
          .select(floor((lon + 180.0) / 5.0).cast("int").as("cell_x"),
            floor((lit(90.0) - lat) / 5.0).cast("int").as("cell_y"),
            col("value"))
          .groupBy("cell_x", "cell_y")
          .agg(count(lit(1)).as("n_positions"),
            (sum(col("value").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("mean_value"))
          .orderBy("cell_y", "cell_x")
      },
      Some("""WITH pos AS (
          SELECT CAST(floor((((value * 2.0 % 360.0) - 180.0) + 180.0) / 5.0) AS INT) AS cell_x,
            CAST(floor((90.0 - ((value % 90.0) - 45.0)) / 5.0) AS INT) AS cell_y,
            value
          FROM events)
        SELECT cell_x, cell_y, COUNT(*) AS n_positions,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_value
        FROM pos GROUP BY cell_x, cell_y ORDER BY cell_y, cell_x""")),

    // D12b: MULTI-RESOLUTION geo rollup — one sketch serves every map
    // zoom level (the r15 verdict's what's-missing #5: a geomap user
    // zooms, and D12's single fixed grid costs a fresh scan per
    // level). Cells are QUADKEYS: the Morton interleave of the 4-bit
    // (x, y) bin indices at the finest level, with digit weight 4^i
    // for bit i — so `parent = child DIV 4` exactly (dropping the
    // least-significant base-4 digit halves both axis resolutions),
    // the same bit machinery as B14's Z-order layout. ONE FileScan
    // feeds ONE finest-grain aggregation (the only corpus shuffle,
    // ≤256 cells); each finest cell row then EXPLODES into its 5
    // (level, ancestor) pairs and a second, 1280-row aggregation
    // folds counts and exact decimal sums per level — so level-k
    // stats are Σ of level-(k+1) children by construction
    // (spec-pinned, plus the one-scan plan pin, in TimeSeriesSpec).
    // At 100 TB: the scan+finest agg is D12's cost; every zoom level
    // after that is arithmetic on occupied-cell metadata.
    QueryDef("d12b_grid_rollup",
      (s, dir) => {
        val lat = (col("value") % 90.0) - 45.0
        val lon = (col("value") * 2.0 % 360.0) - 180.0
        val ix = least(greatest(floor((lon + 180.0) / 22.5).cast("int"),
          lit(0)), lit(15))
        val iy = least(greatest(floor((lit(90.0) - lat) / 11.25).cast("int"),
          lit(0)), lit(15))
        val cell4 = (0 until 4).map { i =>
          (shiftright(ix, i).bitwiseAND(lit(1)) +
            shiftright(iy, i).bitwiseAND(lit(1)) * 2) * lit(1 << (2 * i))
        }.reduce(_ + _).cast("long")
        ev(s, dir)
          .select(cell4.as("cell4"), col("value"))
          .groupBy("cell4")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("s"))
          .select(explode(expr(
            "transform(sequence(0, 4), l -> struct(l as level, " +
              "cell4 div cast(pow(4, 4 - l) as long) as cell))")).as("lc"),
            col("n"), col("s"))
          .groupBy(col("lc.level").as("level"), col("lc.cell").as("cell"))
          .agg(sum(col("n")).as("n_positions"),
            (sum(col("s")).cast("double") / sum(col("n"))).as("mean_value"))
          .orderBy("level", "cell")
      },
      Some("""WITH pos AS (
          SELECT least(greatest(CAST(floor((((value * 2.0 % 360.0) - 180.0) + 180.0) / 22.5) AS INT), 0), 15) AS ix,
            least(greatest(CAST(floor((90.0 - ((value % 90.0) - 45.0)) / 11.25) AS INT), 0), 15) AS iy,
            value
          FROM events),
        fin AS (
          SELECT CAST(((ix >> 0) & 1) + 2 * ((iy >> 0) & 1)
               + (((ix >> 1) & 1) + 2 * ((iy >> 1) & 1)) * 4
               + (((ix >> 2) & 1) + 2 * ((iy >> 2) & 1)) * 16
               + (((ix >> 3) & 1) + 2 * ((iy >> 3) & 1)) * 64 AS BIGINT) AS cell4,
            COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s
          FROM pos GROUP BY 1),
        lv AS (
          SELECT l.level AS level, fin.cell4 // CAST(pow(4, 4 - l.level) AS BIGINT) AS cell, n, s
          FROM fin CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS level) l)
        SELECT level, cell, CAST(SUM(n) AS BIGINT) AS n_positions,
          CAST(SUM(s) AS DOUBLE) / CAST(SUM(n) AS BIGINT) AS mean_value
        FROM lv GROUP BY level, cell ORDER BY level, cell""")),

    // A12: dead-reckoning extrapolation — project each position
    // forward along its track by Δt (the reference dashboards show
    // live aircraft; extrapolation fills the gap between scrapes).
    // Flat-earth small-step approximation; rounded for libm parity.
    QueryDef("a12_dead_reckoning",
      (s, dir) => {
        val lat = (col("value") % 90.0) - 45.0
        val lon = (col("value") * 2.0 % 360.0) - 180.0
        val gsKn = col("value")
        val trackRad = radians(col("value") % 360.0)
        val dtH = lit(10.0) / 3600.0
        val dKm = gsKn * 1.852 * dtH
        val dLat = dKm * cos(trackRad) / 111.32
        val dLon = dKm * sin(trackRad) / (lit(111.32) * cos(radians(lat)))
        ev(s, dir)
          .select(col("event_id"),
            QueryDefs.q6(lat + dLat).as("lat_extrap"),
            QueryDefs.q6(lon + dLon).as("lon_extrap"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
          SELECT event_id,
            (value % 90.0) - 45.0 AS lat,
            (value * 2.0 % 360.0) - 180.0 AS lon,
            value AS gs_kn,
            radians(value % 360.0) AS track_rad
          FROM events)
        SELECT event_id,
          floor((lat + (gs_kn * 1.852 * (10.0 / 3600.0)) * cos(track_rad) / 111.32) * 1000000.0 + 0.5) / 1000000.0 AS lat_extrap,
          floor((lon + (gs_kn * 1.852 * (10.0 / 3600.0)) * sin(track_rad) / (111.32 * cos(radians(lat)))) * 1000000.0 + 0.5) / 1000000.0 AS lon_extrap
        FROM p ORDER BY event_id""")),

    // D5: time-bucketed rates (Grafana timeseries panels).
    QueryDef("d5_time_bucket",
      (s, dir) => ev(s, dir)
        .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour_us", "event_type"),
      Some("""SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""")),

    // D6: top-N per group (LIMIT n BY analog).
    QueryDef("d6_topn_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id"))
        ev(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("event_type", "rn", "event_id", "value")
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, rn, event_id, value FROM (
          SELECT event_type, event_id, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
          FROM events) t
        WHERE rn <= 3 ORDER BY event_type, rn""")),

    // D18: holding-pattern / loiter detection — per track, the
    // cumulative signed heading change over consecutive legs; a net
    // turn ≥ 360° is a closed loop (the classic circling/holding
    // screen behind a "loitering aircraft" panel). The d17 libm
    // lesson applied CONSTRUCTIVELY: each leg bearing quantizes to
    // WHOLE degrees immediately (floor; boundary hazard ~ulp/1° ≈
    // 1e-14/row vs q6's 1e-6 — none expected below ~10¹² rows), then
    // every downstream step — circular diff ((Δ+540) mod 360 − 180),
    // per-track sums, the ≥360 flag — is pure BIGINT arithmetic.
    // One key shuffle (the track window) + one map-side-combined agg.
    QueryDef("d18_holding_pattern",
      (s, dir) => {
        import graft.functions.GeoFunctions
        val lat = (col("value") % 90.0) - 45.0
        val lon = ((col("event_id") * 7) % 360).cast("double") - 179.5
        val pts = ev(s, dir).select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), lat.as("lat"), lon.as("lon"))
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val legs = pts
          .withColumn("nlat", lead("lat", 1).over(w))
          .withColumn("nlon", lead("lon", 1).over(w))
          .filter(col("nlat").isNotNull)
          .withColumn("b", floor(GeoFunctions.bearingDeg(
            col("lat"), col("lon"), col("nlat"), col("nlon"))).cast("long"))
        val turns = legs
          .withColumn("pb", lag("b", 1).over(w))
          .filter(col("pb").isNotNull)
          .withColumn("turn", ((col("b") - col("pb") + 540L) % 360L) - 180L)
        turns.groupBy("user_id")
          .agg(count(lit(1)).as("n_turns"),
            sum(col("turn")).as("net_turn_deg"),
            sum(abs(col("turn"))).as("total_turn_deg"))
          .withColumn("is_circling", abs(col("net_turn_deg")) >= 360L)
          .orderBy("user_id")
      },
      Some {
        val brg = """(degrees(atan2(
            sin(radians(nlon - lon)) * cos(radians(nlat)),
            cos(radians(lat)) * sin(radians(nlat)) -
            sin(radians(lat)) * cos(radians(nlat)) * cos(radians(nlon - lon))
          )) + 360.0) % 360.0"""
        s"""WITH pos AS (
            SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
              (value % 90.0) - 45.0 AS lat,
              CAST((event_id * 7) % 360 AS DOUBLE) - 179.5 AS lon
            FROM events),
          nbr AS (SELECT *,
              lead(lat) OVER w AS nlat, lead(lon) OVER w AS nlon
            FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
          legs AS (SELECT user_id, ts_us, event_id,
              CAST(floor($brg) AS BIGINT) AS b
            FROM nbr WHERE nlat IS NOT NULL),
          turns AS (SELECT user_id,
              ((b - lag(b) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                + 540) % 360) - 180 AS turn
            FROM legs),
          t2 AS (SELECT user_id, turn FROM turns WHERE turn IS NOT NULL)
          SELECT user_id, COUNT(*) AS n_turns,
            CAST(SUM(turn) AS BIGINT) AS net_turn_deg,
            CAST(SUM(abs(turn)) AS BIGINT) AS total_turn_deg,
            abs(SUM(turn)) >= 360 AS is_circling
          FROM t2 GROUP BY user_id ORDER BY user_id"""
      }),

    // D17: cross-track corridor occupancy — signed deviation of each
    // position from the great circle through two fixed waypoints
    // (asin(sin(d/R)·sin(Δθ))·R, the standard aviation XTD),
    // aggregated into 100-km corridor buckets: the "traffic across
    // the airway" distribution panel and the conformance-alert
    // input. Row-local trig in the scan's codegen stage + one
    // map-side-combined integer-key aggregation.
    // Portability — a measured lesson: the per-row q6-presented
    // spelling FAILED the sf1 gate (1 row in 1M off by exactly one
    // quantization step): Java and C libm transcendentals are each
    // ≤1-ulp-correct but not identical, and a ~1e-12 raw divergence
    // crossing a 1e-6 floor boundary flips the output — q6 only
    // launders ROUND-rule differences, it cannot launder raw-double
    // differences (expected boundary hits ≈ ulp/step per row ≈ 1 per
    // million). The histogram spelling divides by 100 km instead:
    // boundary-hit probability ~1e-14 per row, and the output is
    // integer counts — the same reasoning that makes d12's grid
    // exact. The op SEQUENCE is still spelled identically in both
    // engines (including the bearing's degrees→+360→%360→radians
    // round-trip, whose 'simplification' would change intermediate
    // rounding).
    QueryDef("d17_cross_track",
      (s, dir) => {
        val lat = (col("value") % 90.0) - 45.0
        val lon = ((col("event_id") * 7) % 360).cast("double") - 179.5
        val xt = graft.functions.GeoFunctions.crossTrackKm(
          lit(40.0), lit(-75.0), lit(50.0), lit(-60.0), lat, lon)
        ev(s, dir)
          .select(floor(xt / 100.0).cast("int").as("corridor_bucket"))
          .groupBy("corridor_bucket")
          .agg(count(lit(1)).as("n_positions"))
          .orderBy("corridor_bucket")
      },
      Some {
        def brg(lat1: String, lon1: String, lat2: String, lon2: String) =
          s"""radians((degrees(atan2(
              sin(radians($lon2 - $lon1)) * cos(radians($lat2)),
              cos(radians($lat1)) * sin(radians($lat2)) -
              sin(radians($lat1)) * cos(radians($lat2)) * cos(radians($lon2 - $lon1))
            )) + 360.0) % 360.0)"""
        val d13 = """(2.0 * 6371.0088 * asin(least(1.0, sqrt(
            pow(sin(radians(lat - 40.0) / 2.0), 2.0) +
            cos(radians(40.0)) * cos(radians(lat)) *
            pow(sin(radians(lon - (-75.0)) / 2.0), 2.0))))) / 6371.0088"""
        s"""WITH pos AS (
            SELECT event_id, (value % 90.0) - 45.0 AS lat,
              CAST((event_id * 7) % 360 AS DOUBLE) - 179.5 AS lon
            FROM events),
          xt AS (SELECT event_id,
              asin(sin($d13) *
                sin(${brg("40.0", "(-75.0)", "lat", "lon")} -
                    ${brg("40.0", "(-75.0)", "50.0", "(-60.0)")})) * 6371.0088 AS xt_km
            FROM pos)
          SELECT CAST(floor(xt_km / 100.0) AS INT) AS corridor_bucket,
            COUNT(*) AS n_positions
          FROM xt GROUP BY 1 ORDER BY corridor_bucket"""
      }),

    // D16: geofence — which aircraft are inside an airspace polygon
    // (the map-dashboard region filter / alerting predicate; cf. the
    // reference's map panels, adsb-scraper's lat/lon bounding-box
    // config). Even-odd ray casting against a fixed 5-vertex polygon:
    // per edge, `((yi>y) != (yj>y)) && (x < (xj-xi)*(y-yi)/(yj-yi)+xi)`
    // — counts parity = inside. Pure row-local rational double
    // arithmetic (compares + one divide per edge, no trig), generated
    // from ONE Scala vertex list into BOTH the Spark Column tree and
    // the oracle SQL, so every IEEE op is literally identical across
    // engines — no quantization needed, and the predicate sits in the
    // scan's codegen stage (a map-only filter at any scale; a real
    // deployment would AND a cheap bounding-box pre-filter that
    // parquet min/max stats can prune on, spelled here too).
    QueryDef("d16_geofence",
      (s, dir) => {
        val poly = GeofencePoly.vertices
        // lon from event_id, lat from value: d4's value-derived pair
        // is a 1-D manifold (lon = 2·lat ∓ 90) that misses any finite
        // polygon; decorrelated axes actually populate the airspace.
        val (lat, lon) = (
          (col("value") % 90.0) - 45.0,
          ((col("event_id") * 7) % 360).cast("double") - 179.5)
        val (latMin, latMax) = (poly.map(_._1).min, poly.map(_._1).max)
        val (lonMin, lonMax) = (poly.map(_._2).min, poly.map(_._2).max)
        ev(s, dir)
          .withColumn("lat", lat).withColumn("lon", lon)
          .filter(col("lat").between(latMin, latMax) &&
            col("lon").between(lonMin, lonMax))
          .filter(GeofencePoly.inside(col("lat"), col("lon")))
          .select(col("event_id"), col("user_id"),
            QueryDefs.q6(col("lat")).as("lat"), QueryDefs.q6(col("lon")).as("lon"))
          .orderBy("event_id")
      },
      Some {
        val poly = GeofencePoly.vertices
        val cross = poly.indices.map { i =>
          val (yi, xi) = poly(i)
          val (yj, xj) = poly((i + 1) % poly.length)
          s"""(CASE WHEN (($yi > lat) != ($yj > lat))
              AND lon < ($xj - $xi) * (lat - $yi) / ($yj - $yi) + $xi
              THEN 1 ELSE 0 END)"""
        }.mkString(" + ")
        val (latMin, latMax) = (poly.map(_._1).min, poly.map(_._1).max)
        val (lonMin, lonMax) = (poly.map(_._2).min, poly.map(_._2).max)
        s"""WITH pos AS (
            SELECT event_id, user_id, (value % 90.0) - 45.0 AS lat,
              CAST((event_id * 7) % 360 AS DOUBLE) - 179.5 AS lon
            FROM events),
          boxed AS (SELECT * FROM pos
            WHERE lat BETWEEN $latMin AND $latMax
              AND lon BETWEEN $lonMin AND $lonMax)
          SELECT event_id, user_id,
            ${QueryDefs.sqlQ6("lat")} AS lat, ${QueryDefs.sqlQ6("lon")} AS lon
          FROM boxed
          WHERE ($cross) % 2 = 1
          ORDER BY event_id"""
      }),

    // D16b: multi-polygon geofence JOIN — membership against a TABLE
    // of 28 zones (incl. overlapping ones: a position can belong to
    // several), the real airspace-alerting shape the single-literal
    // d16 special-cases (the reference dashboards' receiver-relative
    // region filter is d16's one-zone case). Scale spelling: one
    // literal UNION-bbox pre-filter on the scan (parquet-min/max
    // prunable were lat/lon physical columns), then a BROADCAST
    // nested-loop join of positions against the 28-row zone dim on
    // the per-zone bbox (the fact table never shuffles — plan-pinned
    // in GeofenceSpec: BroadcastNestedLoopJoin, no CartesianProduct),
    // then the row-local even-odd fold over the zone's broadcast edge
    // array (functions.aggregate — codegen'd, no UDF). Zones and all
    // edge literals render from ONE Scala list into both engines.
    QueryDef("d16b_geofence_many",
      (s, dir) => {
        import GeofenceZones._
        val (latC, lonC) = (
          (col("value") % 90.0) - 45.0,
          ((col("event_id") * 7) % 360).cast("double") - 179.5)
        // guarded spread: the bench input is one file/one row group, so
        // without it the whole 28-zone NLJ + even-odd fold runs as ONE
        // task (measured par=1.0, 10.5 task-s at sf0.1); a real
        // multi-split scan makes this the identity (ScaleOps.spread)
        val pos = graft.operators.ScaleOps.spread(ev(s, dir)
          .withColumn("lat", latC).withColumn("lon", lonC)
          .filter(col("lat").between(gLatMin, gLatMax) &&
            col("lon").between(gLonMin, gLonMax))
          .select("event_id", "user_id", "lat", "lon"))
        // r16 (guide §1.2 algorithm first, §4 codegen): the 28 zones
        // are PLAN-TIME literals, so membership needs no join at all.
        // The previous broadcast-NLJ spelling let the optimizer push
        // the even-odd fold INTO the join condition, evaluating the
        // full 5-edge fold for every (position, zone) PAIR — bbox
        // misses included (measured ~50 task-s at sf0.1). This
        // spelling is one codegen'd projection per position: per
        // zone, a literal-coefficient bbox screen AND-short-circuits
        // the fold (codegen And evaluates the fold only on bbox
        // hits), matching ids explode, and the same rows reach the
        // same aggregation — identical results (oracle-gated), no
        // join, no below-agg shuffle beyond the guarded spread.
        val zoneHits = array(withEdges.map {
          case (id, laMin, laMax, loMin, loMax, edges) =>
            val crossings = edges.map { case (yi, xi, yj, xj) =>
              when((lit(yi) > col("lat")) =!= (lit(yj) > col("lat")) &&
                col("lon") < (lit(xj) - lit(xi)) * (col("lat") - lit(yi)) /
                  (lit(yj) - lit(yi)) + lit(xi), 1).otherwise(0)
            }.reduce(_ + _)
            when(col("lat") >= laMin && col("lat") <= laMax &&
              col("lon") >= loMin && col("lon") <= loMax &&
              crossings % 2 === 1, lit(id)).otherwise(lit(null))
        }: _*)
        pos.select(col("user_id"),
            explode(filter(zoneHits, z => z.isNotNull)).as("zone_id"))
          .groupBy("zone_id")
          .agg(count(lit(1)).as("n_positions"),
            countDistinct(col("user_id")).as("n_aircraft"))
          .orderBy("zone_id")
      },
      Some {
        import GeofenceZones._
        val perZone = zones.map { case (id, vs) =>
          val (laMin, laMax) = (vs.map(_._1).min, vs.map(_._1).max)
          val (loMin, loMax) = (vs.map(_._2).min, vs.map(_._2).max)
          s"""SELECT $id AS zone_id, COUNT(*) AS n_positions,
            COUNT(DISTINCT user_id) AS n_aircraft
          FROM boxed
          WHERE lat BETWEEN ${dbl(laMin)} AND ${dbl(laMax)}
            AND lon BETWEEN ${dbl(loMin)} AND ${dbl(loMax)}
            AND (${sqlCross(id)}) % 2 = 1"""
        }.mkString("\n UNION ALL \n")
        s"""WITH pos AS (
            SELECT event_id, user_id, (value % 90.0) - 45.0 AS lat,
              CAST((event_id * 7) % 360 AS DOUBLE) - 179.5 AS lon
            FROM events),
          boxed AS (SELECT * FROM pos
            WHERE lat BETWEEN ${dbl(gLatMin)} AND ${dbl(gLatMax)}
              AND lon BETWEEN ${dbl(gLonMin)} AND ${dbl(gLonMax)})
          $perZone
          ORDER BY zone_id"""
      }),

    // D19–D22: the DASHBOARD-PARITY PACK — the reference's four
    // user-facing Grafana dashboards (dashboards/examples/
    // Current_Positions_{Global_Opensky,Global_Stream,Regional,
    // Local}.json) as ONE composed oracled query each, emitting the
    // panel's exact column set, rather than operator-by-operator.
    // The synthetic positions MV maps events → positions with the
    // repo's established derivations (lat/lon from d4, icao24 =
    // user_id, scrape_time = ts as epoch-us per the d2 precedent).
    // Composition order is the scale-right one everywhere: latest
    // FIRST (one key shuffle over raw events, rank-pruned), display
    // columns row-locally AFTER (over ~|aircraft| rows, not |events|),
    // dimension enrichment LAST as broadcast left joins.

    // D19: Current_Positions_Global_Opensky — latest per aircraft,
    // moving filter (gs > 0), the 10-column opensky panel including
    // origin_country (a dimension lookup: nation broadcast-joined).
    QueryDef("d19_dashboard_global_opensky",
      (s, dir) => {
        val latest = CurrentState.latestBy(ev(s, dir),
            Seq("user_id"), "ts", "event_id")
          .filter(col("value") > 0)
        val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        latest.withColumn("nk", col("user_id") % 25)
          .join(broadcast(nat), col("nk") === col("n_nationkey"), "left")
          .select(col("user_id").as("icao24"),
            QueryDefs.q6((col("value") % 90.0) - 45.0).as("lat"),
            QueryDefs.q6((col("value") * 2.0 % 360.0) - 180.0).as("lon"),
            unix_micros(col("ts")).as("scrape_time_us"),
            col("event_type").as("callsign"),
            floor(col("value") * 100).cast("int").as("alt_baro"),
            (col("event_id") % 360).cast("int").as("track"),
            col("value").as("ground_speed"),
            ((col("event_id") % 4001).cast("int") - 2000).as("vertical_rate"),
            coalesce(col("n_name"), lit("")).as("origin_country"))
          .orderBy("alt_baro", "icao24")
      },
      Some(s"""WITH latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) t
          WHERE rn = 1 AND value > 0)
        SELECT l.user_id AS icao24,
          ${QueryDefs.sqlQ6("(value % 90.0) - 45.0")} AS lat,
          ${QueryDefs.sqlQ6("(value * 2.0 % 360.0) - 180.0")} AS lon,
          epoch_us(CAST(ts AS TIMESTAMP)) AS scrape_time_us,
          event_type AS callsign,
          CAST(floor(value * 100) AS INT) AS alt_baro,
          CAST(event_id % 360 AS INT) AS track,
          value AS ground_speed,
          CAST(event_id % 4001 AS INT) - 2000 AS vertical_rate,
          COALESCE(n.n_name, '') AS origin_country
        FROM latest l LEFT JOIN nation n ON n.n_nationkey = l.user_id % 25
        ORDER BY alt_baro, icao24""")),

    // D20: Current_Positions_Global_Stream — the stream dashboard
    // reads the union-ingested table: distributedUnion of the two
    // source slices → latest → moving filter → the 8-column panel.
    QueryDef("d20_dashboard_global_stream",
      (s, dir) => {
        val e = ev(s, dir)
        val txn = e.filter(col("event_type").isin("purchase", "signup"))
        val web = e.filter(col("event_type").isin("click", "view"))
        CurrentState.latestBy(
            CurrentState.distributedUnion(Seq(txn, web)),
            Seq("user_id"), "ts", "event_id")
          .filter(col("value") > 0)
          .select(col("user_id").as("icao24"),
            QueryDefs.q6((col("value") % 90.0) - 45.0).as("lat"),
            QueryDefs.q6((col("value") * 2.0 % 360.0) - 180.0).as("lon"),
            unix_micros(col("ts")).as("scrape_time_us"),
            col("event_type").as("callsign"),
            floor(col("value") * 100).cast("int").as("alt_baro"),
            (col("event_id") % 360).cast("int").as("track"),
            col("value").as("ground_speed"))
          .orderBy("alt_baro", "icao24")
      },
      Some(s"""WITH unioned AS (
          SELECT * FROM events WHERE event_type IN ('purchase', 'signup')
          UNION ALL
          SELECT * FROM events WHERE event_type IN ('click', 'view')),
        latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM unioned) t
          WHERE rn = 1 AND value > 0)
        SELECT user_id AS icao24,
          ${QueryDefs.sqlQ6("(value % 90.0) - 45.0")} AS lat,
          ${QueryDefs.sqlQ6("(value * 2.0 % 360.0) - 180.0")} AS lon,
          epoch_us(CAST(ts AS TIMESTAMP)) AS scrape_time_us,
          event_type AS callsign,
          CAST(floor(value * 100) AS INT) AS alt_baro,
          CAST(event_id % 360 AS INT) AS track,
          value AS ground_speed
        FROM latest
        ORDER BY alt_baro, icao24""")),

    // D21: Current_Positions_Regional — latest + moving filter + the
    // feed metadata columns (registration/aircraft_type/description,
    // ifNull → '' per schema-regional.sql:181-183) enriched via a
    // broadcast dimension left join.
    QueryDef("d21_dashboard_regional",
      (s, dir) => {
        val latest = CurrentState.latestBy(ev(s, dir),
            Seq("user_id"), "ts", "event_id")
          .filter(col("value") > 0)
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        latest.withColumn("ck", col("user_id") % 150 + 1)
          .join(broadcast(dim), col("ck") === col("c_custkey"), "left")
          .select(col("user_id").as("icao24"),
            QueryDefs.q6((col("value") % 90.0) - 45.0).as("lat"),
            QueryDefs.q6((col("value") * 2.0 % 360.0) - 180.0).as("lon"),
            unix_micros(col("ts")).as("scrape_time_us"),
            col("event_type").as("callsign"),
            floor(col("value") * 100).cast("int").as("alt_baro"),
            (col("event_id") % 360).cast("int").as("track"),
            col("value").as("ground_speed"),
            coalesce(col("c_name"), lit("")).as("registration"),
            coalesce(col("c_mktsegment"), lit("")).as("aircraft_type"),
            coalesce(concat(col("c_name"), lit(" "), col("c_mktsegment")), lit(""))
              .as("description"))
          .orderBy("alt_baro", "icao24")
      },
      Some(s"""WITH latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) t
          WHERE rn = 1 AND value > 0)
        SELECT l.user_id AS icao24,
          ${QueryDefs.sqlQ6("(value % 90.0) - 45.0")} AS lat,
          ${QueryDefs.sqlQ6("(value * 2.0 % 360.0) - 180.0")} AS lon,
          epoch_us(CAST(ts AS TIMESTAMP)) AS scrape_time_us,
          event_type AS callsign,
          CAST(floor(value * 100) AS INT) AS alt_baro,
          CAST(event_id % 360 AS INT) AS track,
          value AS ground_speed,
          COALESCE(c.c_name, '') AS registration,
          COALESCE(c.c_mktsegment, '') AS aircraft_type,
          COALESCE(c.c_name || ' ' || c.c_mktsegment, '') AS description
        FROM latest l LEFT JOIN customer c ON c.c_custkey = l.user_id % 150 + 1
        ORDER BY alt_baro, icao24""")),

    // D22: Current_Positions_Local's nearest-aircraft table — latest
    // (NO moving filter, per the panel) with the receiver-relative
    // columns: Distance (haversine km from the fixed receiver) and
    // Direction (bearing), ordered nearest-first, emitting the
    // panel's exact capitalized aliases.
    QueryDef("d22_dashboard_local_nearest",
      (s, dir) => {
        val latest = CurrentState.latestBy(ev(s, dir),
            Seq("user_id"), "ts", "event_id")
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        val lat = (col("value") % 90.0) - 45.0
        val lon = (col("value") * 2.0 % 360.0) - 180.0
        latest.withColumn("ck", col("user_id") % 150 + 1)
          .join(broadcast(dim), col("ck") === col("c_custkey"), "left")
          .select(
            QueryDefs.q6(graft.functions.GeoFunctions
              .haversineKm(lit(40.0), lit(-75.0), lat, lon)).as("Distance"),
            QueryDefs.q6(graft.functions.GeoFunctions
              .bearingDeg(lit(40.0), lit(-75.0), lat, lon)).as("Direction"),
            col("event_type").as("Callsign"),
            floor(col("value") * 100).cast("int").as("Altitude"),
            col("value").as("Knots"),
            (col("event_id") % 360).cast("int").as("Heading"),
            coalesce(col("c_name"), lit("")).as("Registration"),
            coalesce(col("c_mktsegment"), lit("")).as("Type"),
            coalesce(concat(col("c_name"), lit(" "), col("c_mktsegment")), lit(""))
              .as("Description"))
          .orderBy("Distance", "Callsign")
      },
      Some(s"""WITH latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) t
          WHERE rn = 1),
        pos AS (
          SELECT *, (value % 90.0) - 45.0 AS lat, (value * 2.0 % 360.0) - 180.0 AS lon
          FROM latest)
        SELECT
          ${QueryDefs.sqlQ6("""2.0 * 6371.0088 * asin(least(1.0, sqrt(
            pow(sin(radians(lat - 40.0) / 2.0), 2.0) +
            cos(radians(40.0)) * cos(radians(lat)) *
            pow(sin(radians(lon - (-75.0)) / 2.0), 2.0))))""")} AS Distance,
          ${QueryDefs.sqlQ6("""(degrees(atan2(
              sin(radians(lon - (-75.0))) * cos(radians(lat)),
              cos(radians(40.0)) * sin(radians(lat)) -
              sin(radians(40.0)) * cos(radians(lat)) * cos(radians(lon - (-75.0)))
            )) + 360.0) % 360.0""")} AS Direction,
          event_type AS Callsign,
          CAST(floor(value * 100) AS INT) AS Altitude,
          value AS Knots,
          CAST(event_id % 360 AS INT) AS Heading,
          COALESCE(c.c_name, '') AS Registration,
          COALESCE(c.c_mktsegment, '') AS Type,
          COALESCE(c.c_name || ' ' || c.c_mktsegment, '') AS Description
        FROM pos p LEFT JOIN customer c ON c.c_custkey = p.user_id % 150 + 1
        ORDER BY Distance, Callsign"""))
  )
}

/** The fixed airspace polygon d16 tests against — vertices chosen
  * irrational-ish (non-round) so no synthetic position lands exactly
  * on an edge or vertex latitude. Shared by the Spark and oracle
  * sides so both engines evaluate the same literals.
  */
/** D16b's polygon TABLE — 28 pentagon zones (a 4×6 grid of varying
  * radius plus 4 offset zones that OVERLAP their grid neighbours, so
  * membership is a genuine join, not a partition). Vertices are
  * driver-computed doubles rendered as literals into BOTH engines
  * (Double.toString round-trips the exact IEEE value through either
  * parser), so every edge test is the same arithmetic on both sides.
  */
private[graft] object GeofenceZones {
  /** (zone_id, vertices) — pentagon around a grid center; radius
    * cycles 9.5/13.2/16.9°, lon stretched 1.6×. The 4 extra zones sit
    * between grid cells at max radius and overlap several neighbours.
    */
  val zones: Seq[(Int, Seq[(Double, Double)])] = {
    def pentagon(latc: Double, lonc: Double, rad: Double): Seq[(Double, Double)] =
      (0 until 5).map { k =>
        val th = 2 * math.Pi * k / 5 + 0.4
        (latc + rad * math.sin(th), lonc + 1.6 * rad * math.cos(th))
      }
    val grid = for (r <- 0 until 4; c <- 0 until 6) yield {
      val id = r * 6 + c
      (id, pentagon(-30.0 + r * 20 + 0.13, -145.0 + c * 58 + 0.29,
        9.5 + (id % 3) * 3.7))
    }
    val overlapping = (0 until 4).map { k =>
      (24 + k, pentagon(-20.0 + k * 20 + 0.37, -116.0 + k * 58 + 0.41, 16.9))
    }
    grid ++ overlapping
  }

  /** Edge list per zone as (yi, xi, yj, xj) plus the zone's bbox. */
  val withEdges: Seq[(Int, Double, Double, Double, Double,
      Seq[(Double, Double, Double, Double)])] =
    zones.map { case (id, vs) =>
      val edges = vs.indices.map { i =>
        val (yi, xi) = vs(i)
        val (yj, xj) = vs((i + 1) % vs.length)
        (yi, xi, yj, xj)
      }
      (id, vs.map(_._1).min, vs.map(_._1).max,
        vs.map(_._2).min, vs.map(_._2).max, edges)
    }

  /** Union bbox over all zones — the literal scan pre-filter. */
  val (gLatMin, gLatMax, gLonMin, gLonMax) =
    (zones.flatMap(_._2.map(_._1)).min, zones.flatMap(_._2.map(_._1)).max,
      zones.flatMap(_._2.map(_._2)).min, zones.flatMap(_._2.map(_._2)).max)

  /** Double literal for DuckDB: E-notation forces DOUBLE parsing
    * (a bare 17-digit literal parses as DECIMAL(18,17) and overflows
    * on comparison); the mantissa is Double.toString, so the parsed
    * value is bit-identical to the Scala double Spark gets.
    */
  def dbl(x: Double): String =
    if (x.toString.contains("E")) x.toString else x.toString + "E0"

  /** Per-zone even-odd crossing-count SQL (d16's spelling). */
  def sqlCross(zoneId: Int): String = {
    val vs = zones.find(_._1 == zoneId).get._2
    vs.indices.map { i =>
      val (yi, xi) = vs(i)
      val (yj, xj) = vs((i + 1) % vs.length)
      s"""(CASE WHEN ((${dbl(yi)} > lat) != (${dbl(yj)} > lat))
          AND lon < (${dbl(xj)} - ${dbl(xi)}) * (lat - ${dbl(yi)}) / (${dbl(yj)} - ${dbl(yi)}) + ${dbl(xi)}
          THEN 1 ELSE 0 END)"""
    }.mkString(" + ")
  }
}

private[graft] object GeofencePoly {
  val vertices: Seq[(Double, Double)] = Seq(
    (10.3, -40.7), (25.9, -10.1), (5.7, 20.3), (-15.1, 10.9), (-20.3, -25.7))

  /** Even-odd ray-cast membership as a Column predicate (shared by
    * d16 and its spec): odd crossing count of the +x ray from
    * (lat, lon) against the polygon edges.
    */
  def inside(lat: Column, lon: Column): Column = {
    val crossings = vertices.indices.map { i =>
      val (yi, xi) = vertices(i)
      val (yj, xj) = vertices((i + 1) % vertices.length)
      when((lit(yi) > lat) =!= (lit(yj) > lat) &&
        lon < (lit(xj) - xi) * (lat - yi) / (lit(yj) - yi) + xi, 1)
        .otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }
}
