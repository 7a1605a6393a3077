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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a nanos long
    * (spark.sql.legacy.parquet.nanosAsLong) and truncate to a regular
    * microsecond timestamp — the driver data is whole microseconds, so
    * this is lossless.
    *
    * The raw long stays exposed as `ts_ns`: a range predicate on the
    * derived timestamp cannot reach the parquet scan (it's wrapped in
    * the conversion expression), but one on `ts_ns` pushes down and
    * prunes row groups — at 100 TB that is the difference between
    * scanning a day and scanning the archive. Time-range queries
    * should filter on `ts_ns`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Epoch nanos for a UTC instant — for pushdown-friendly `ts_ns`
    * range predicates.
    */
  def epochNanos(isoUtc: String): Long =
    java.time.Instant.parse(isoUtc).toEpochMilli * 1000000L

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
