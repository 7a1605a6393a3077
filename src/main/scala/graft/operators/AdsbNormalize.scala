package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's Kafka→storage normalization layer, re-expressed as
  * declarative column transforms (whole-stage-codegen friendly; a
  * streaming plan can reuse every one of these unchanged).
  *
  * Reference semantics mirrored here:
  * - sentinel fills `ifNull(x, -9999 | '' | false)`
  *   (/root/reference/schema/schema-local.sql:213-283)
  * - `alt_baro` string parse: 'ground'→0, NULL→-9999, else cast
  *   (schema-local.sql:213-217)
  * - key normalization `trimBoth(lower(x))` (schema-local.sql:202-204)
  * - validity filter: keys non-null, lat∈[-90,90], lon∈[-180,180]
  *   (schema-local.sql:289-293)
  * - OpenSky metric→imperial conversion with truncating int casts
  *   (schema-global-opensky.sql:106-119)
  * - `position_source` Enum8 decode (schema-global-opensky.sql:125-132)
  * - epoch seconds → timestamp (schema-global-opensky.sql:122-123)
  * - array cleanup `arrayFilter(x≠'', arrayMap(trim∘lower, a))`
  *   (schema-local.sql:249-252)
  * - `now() AS ingestion_time` audit column (schema-local.sql:287)
  */
object AdsbNormalize {
  final val IntSentinel = -9999

  def fillInt(c: Column): Column = coalesce(c, lit(IntSentinel))
  def fillDouble(c: Column): Column = coalesce(c, lit(IntSentinel.toDouble))
  def fillString(c: Column): Column = coalesce(c, lit(""))
  def fillBool(c: Column): Column = coalesce(c, lit(false))

  /** 'ground' → 0, NULL → -9999, anything else → cast to int. */
  def parseAltBaro(c: Column): Column =
    when(c === "ground", lit(0))
      .when(c.isNull, lit(IntSentinel))
      .otherwise(c.cast("int"))

  /** trimBoth(lower(x)) key normalization. */
  def normKey(c: Column): Column = lower(trim(c))

  /** The MV's WHERE clause: identity keys present, position plausible. */
  def validPosition(df: DataFrame, key: String, lat: String, lon: String): DataFrame =
    df.filter(col(key).isNotNull &&
      col(lat).isNotNull && col(lon).isNotNull &&
      col(lat).between(-90, 90) && col(lon).between(-180, 180))

  /** Metric→imperial, truncating int casts exactly like `toInt32`:
    * Spark's cast(double→int) truncates toward zero (matches CH).
    */
  def metersToFeet(c: Column): Column = (c * 3.28084).cast("int")
  def msToKnots(c: Column): Column = c * 1.94384
  def msToFpm(c: Column): Column = (c * 196.85).cast("int")

  /** Enum8('ADS-B'=0,'ASTERIX'=1,'MLAT'=2,'FLARM'=3) decode. */
  def decodePositionSource(c: Column): Column =
    when(c === 0, "ADS-B").when(c === 1, "ASTERIX")
      .when(c === 2, "MLAT").when(c === 3, "FLARM")
      .otherwise("UNKNOWN")

  /** fromUnixTimestamp equivalent. */
  def epochToTs(c: Column): Column = timestamp_seconds(c)

  /** arrayFilter(x≠'', arrayMap(trim∘lower, a)). */
  def cleanArray(c: Column): Column =
    filter(transform(c, x => lower(trim(x))), x => x =!= "")

  /** now() audit column. */
  def withIngestionTime(df: DataFrame): DataFrame =
    df.withColumn("ingestion_time", current_timestamp())
}
