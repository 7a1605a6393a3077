package graft

import graft.adsb.AdsbSchemas
import graft.operators.{CurrentState, ScaleOps}
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

/** The reference deployment, end to end, in one batch pass: raw feed
  * documents → wire records → MV normalization → day-partitioned
  * storage → compaction → TTL → latest-state views → the dashboard
  * queries. This is the "a reference user could switch" test: every
  * stage is the graft API, and the assertions mirror what the
  * reference's Grafana panels read.
  */
class EndToEndSpec extends SparkSpecBase {
  import spark.implicits._

  private def feedDoc(scrape: Int): String = {
    // three aircraft per scrape; C2C2C2 goes silent after scrape 0
    val planes = Seq(
      s"""{"hex":"A1A1A1","flight":"BAW1","lat":51.${scrape}0,"lon":-0.1,"alt_baro":"${36000 + scrape}","gs":450.0,"r_dst":${10 + scrape}.5}""",
      s"""{"hex":"B2B2B2","flight":"UAL2","lat":40.$scrape,"lon":-75.2,"alt_baro":"ground","gs":0.0,"r_dst":2.0}""") ++
      (if (scrape == 0) Seq(s"""{"hex":"C2C2C2","flight":"DLH3","lat":48.8,"lon":2.3,"alt_baro":"30000","gs":400.0,"r_dst":300.0}""")
       else Seq.empty) :+
      s"""{"hex":"NOPOS","flight":"GHOST$scrape"}"""
    s"""{"now": ${1700000000 + scrape * 60}, "messages": 99, "aircraft": [${planes.mkString(",")}]}"""
  }

  test("feed documents through storage lifecycle to the dashboard views") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_e2e"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    // 1. ingest: three scrapes of raw feed documents → storage rows
    val scrapes = (0 until 3).map { i =>
      AdsbSchemas.normalizeLocal(
        AdsbSchemas.parseFeedDocument(
            Seq(feedDoc(i)).toDF("json"), "json", AdsbSchemas.rawLocalSchema)
          .withColumn("source", lit("local"))
          .withColumn("scrape_time",
            timestamp_seconds(lit(1700000000L + i * 60))))
    }
    val storage = CurrentState.distributedUnion(scrapes)
    assert(storage.count() == 7) // 3+2+2 valid reports, no-position dropped

    // 2. storage: day-partitioned write + a second append batch, then
    // compaction merges the small files
    CurrentState.writePartitionedByDay(storage, "scrape_time", "icao24", out)
    CurrentState.withDayPartition(storage.limit(0), "scrape_time") // schema no-op
    val compacted = CurrentState.compactDayPartitions(spark, out, "icao24", "scrape_time")
    val stored = spark.read.parquet(out)
    assert(stored.count() == 7)

    // 3. current state: ReplacingMergeTree FINAL — one row per
    // aircraft, the newest report wins
    val latest = CurrentState.latestBy(stored, Seq("icao24"), "scrape_time", "messages")
    val byKey = latest.select("icao24", "alt_baro").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byKey == Map("a1a1a1" -> 36002, "b2b2b2" -> 0, "c2c2c2" -> 30000))

    // 4. the latest view's recency window (TTL 1 HOUR analog at 90s):
    // the silent aircraft drops out
    val recent = CurrentState.latestBy(
      CurrentState.recentOnly(stored, "scrape_time", "90 SECONDS"),
      Seq("icao24"), "scrape_time", "messages")
    assert(recent.select("icao24").as[String].collect().toSet == Set("a1a1a1", "b2b2b2"))

    // 5. dashboards: the moving filter and nearest-first table
    val moving = recent.filter(col("ground_speed") > 0)
    assert(moving.select("icao24").as[String].collect().toSeq == Seq("a1a1a1"))
    val nearest = latest.orderBy(col("distance"))
      .select("icao24").as[String].collect()
    assert(nearest.head == "b2b2b2") // 2 km receiver distance first

    // 6. receiver-relative geometry is computable for panels that
    // need it from lat/lon alone
    val withGeo = latest.withColumn("dist_km",
      GeoFunctions.haversineKm(lit(51.0), lit(-0.1), col("lat"), col("lon")))
    assert(withGeo.filter(col("icao24") === "a1a1a1")
      .select("dist_km").as[Double].collect().head < 30.0)
  }
}
