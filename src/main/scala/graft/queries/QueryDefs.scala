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
}
