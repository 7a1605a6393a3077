package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test datasets.
  *
  * Scans are left fully declarative so Catalyst pushes filters and
  * prunes columns into the parquet reader (verify with
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` arrives in one of two physical spellings depending on
    * the dataset generation: parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read as a nanos long via
    * spark.sql.legacy.parquet.nanosAsLong and truncate to a
    * microsecond timestamp, lossless on whole-microsecond data), or a
    * plain TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ,
    * cast to the session-UTC timestamp, value-preserving). Branch on
    * the type actually read so both vintages of the driver data load
    * identically.
    *
    * Either way the normalized frame exposes the same two columns:
    * `ts` (microsecond timestamp) and `ts_ns` (epoch nanos long).
    * In the nanos spelling `ts_ns` IS the raw column, so range
    * predicates on it push into the parquet scan and prune row
    * groups; in the micros spelling the raw pushdown-friendly column
    * is `ts` and `ts_ns` is derived (a predicate on it evaluates
    * post-scan). At 100 TB that pushdown is the difference between
    * scanning a day and the archive, so time-range filters should go
    * through [[tsRange]], which targets whichever column is raw for
    * the data actually read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    }
  }

  /** Epoch nanos for a UTC instant — for pushdown-friendly `ts_ns`
    * range predicates.
    */
  def epochNanos(isoUtc: String): Long =
    java.time.Instant.parse(isoUtc).toEpochMilli * 1000000L

  /** Half-open time-range filter over a [[events]] frame, spelled on
    * BOTH `ts_ns` and `ts`: whichever column is physically raw for
    * the dataset in use pushes into the parquet scan and prunes row
    * groups (the bound literals constant-fold either way); the
    * redundant twin evaluates post-scan for free. Filtering only the
    * derived column would silently lose pushdown — at 100 TB that is
    * scanning the archive instead of a day.
    */
  def tsRange(df: DataFrame, fromIsoUtc: String, untilIsoUtc: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    val (lo, hi) = (epochNanos(fromIsoUtc), epochNanos(untilIsoUtc))
    df.filter(col("ts_ns") >= lo && col("ts_ns") < hi &&
      col("ts") >= timestamp_micros(lit(lo / 1000L)) &&
      col("ts") < timestamp_micros(lit(hi / 1000L)))
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
