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
