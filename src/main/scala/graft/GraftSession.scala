package graft

import org.apache.spark.sql.SparkSession

/** The recommended session setup for running graft at scale — the
  * conf a 1000-executor deployment wants, in one place:
  *
  * - AQE on with skew-join splitting (hot aircraft / hot documents
  *   get their shuffle partitions split at runtime; ScaleOps salting
  *   remains for aggregations, which AQE does not rebalance),
  * - post-shuffle partition coalescing (small stages don't pay the
  *   static shuffle-partition count),
  * - UTC session timezone (the reference stores UTC; local-tz
  *   day-partitioning would split days differently per cluster),
  * - graft's SQL functions + the latest-row optimizer rule
  *   (GraftExtensions).
  *
  * `spark.sql.shuffle.partitions` is NOT pinned here: local runs set
  * it to the core count, clusters to 2-3× total cores; with AQE
  * coalescing the exact value matters much less.
  */
object GraftSession {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new plans.GraftExtensions)

  /** Local development/test session at the given parallelism. */
  def local(cores: Int): SparkSession =
    builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
