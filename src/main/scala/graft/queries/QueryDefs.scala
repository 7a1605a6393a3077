package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One named, oracle-checked query. `oracle` is DuckDB SQL over the
  * same parquet tables (None → driver records a rows-only check).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDefs {
  /** Exact decimal(18,2) sum surfaced as double — bit-identical across
    * engines because every intermediate is exact (see SURVEY §6).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** The TPC-H discounted price, multiplied in exact decimal. */
  def discPrice(price: Column, discount: Column): Column =
    price.cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)"))

  /** Tie-stable 6-dp quantization: floor(x·1e6 + 0.5)/1e6 — four IEEE
    * ops every engine executes identically, so results are bit-exact
    * for ANY x. Use this (with [[sqlQ6]]) instead of `round(x, 6)` for
    * presentation rounding over many rows: round() resolves
    * millionth-boundary ties differently across engines (Spark
    * HALF_UP on the shortest decimal repr vs DuckDB's C-style x·1e6
    * path — 10 of 50k h7 rows flipped at sf1). Half-ties go toward
    * +∞, not away from zero; identically on both sides.
    */
  def q6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** DuckDB spelling of [[q6]]. */
  def sqlQ6(x: String): String =
    s"floor(($x) * 1000000.0 + 0.5) / 1000000.0"

  /** [[q6]] at 4 dp — for ratio-style report columns (recall). */
  def q4(c: Column): Column = floor(c * lit(1e4) + lit(0.5)) / lit(1e4)

  /** DuckDB spelling of [[q4]]. */
  def sqlQ4(x: String): String =
    s"floor(($x) * 10000.0 + 0.5) / 10000.0"

  /** DuckDB spelling of dsum. */
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** DuckDB spelling of discPrice. */
  def sqlDiscPrice(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($discount AS DECIMAL(18,2)))"

  /** Total order for a SMALL result of an expensive pipeline. A global
    * `orderBy` range-partitions: the sampling pass executes the child
    * once and the shuffle executes it AGAIN — doubling an expensive
    * upstream for a few thousand output rows. One round-robin exchange
    * into a single partition + in-partition sort gives the same total
    * order with exactly one execution. (Only for driver-sized results;
    * a big result wants the parallel range sort.)
    */
  def sortedSmall(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
