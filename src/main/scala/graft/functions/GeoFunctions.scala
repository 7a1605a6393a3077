package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Receiver-relative geometry, mirroring the reference's `distance`
  * (`r_dst`) and `direction` (`r_dir`) columns
  * (/root/reference/schema/schema-local.sql:131-133 — populated by the
  * receiver, recomputed here so any point can act as receiver).
  * Pure column arithmetic → whole-stage codegen, no UDFs.
  */
object GeoFunctions {
  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km (haversine). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
    lit(2.0 * EarthRadiusKm) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Initial bearing in degrees [0, 360). */
  def bearingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLon = radians(lon2 - lon1)
    val y = sin(dLon) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(dLon)
    (degrees(atan2(y, x)) + 360.0) % 360.0
  }

  /** Signed cross-track distance (km) of point P from the great
    * circle through A→B: asin(sin(d_AP/R) · sin(θ_AP − θ_AB)) · R.
    * Negative = left of track. The standard aviation deviation
    * metric (is this aircraft ON the airway).
    */
  def crossTrackKm(latA: Column, lonA: Column, latB: Column, lonB: Column,
                   lat: Column, lon: Column): Column = {
    val d13 = haversineKm(latA, lonA, lat, lon) / EarthRadiusKm
    val t13 = radians(bearingDeg(latA, lonA, lat, lon))
    val t12 = radians(bearingDeg(latA, lonA, latB, lonB))
    asin(sin(d13) * sin(t13 - t12)) * EarthRadiusKm
  }
}
