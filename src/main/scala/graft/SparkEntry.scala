package graft

import graft.queries.{AdsbQueries, EmbeddingQueries, PipelineQueries, QueryDef, RelationalQueries, StorageQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory
  * each query key maps to.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ AdsbQueries.defs ++
      PipelineQueries.defs ++ EmbeddingQueries.defs ++ TimeSeriesQueries.defs ++
      StorageQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Latest-position board: current state per aircraft (user), moving
    * only, nearest-first — the reference's flagship dashboard query.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.CurrentState.latestBy(
        sources.Tables.events(spark, "/root/testdata/sf0.001"),
        Seq("user_id"), "ts", "event_id")
      .filter(col("value") > 0)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("value")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** DuckDB-runnable oracle per query (absent → rows-only check). */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o)).toMap

  /** Columns the driver's rows-only harness cannot process: its
    * pandas row sort cannot factorize array/struct/map/binary cells
    * (r9: i7 recorded err instead of a row count). ONE definition
    * consumed by BOTH the Verify runtime guard and the OperatorsSpec
    * mirror, so the two can never drift apart.
    */
  def harnessHostileFields(schema: org.apache.spark.sql.types.StructType)
      : Seq[org.apache.spark.sql.types.StructField] = {
    import org.apache.spark.sql.types._
    schema.fields.toSeq.filter(f => f.dataType match {
      case _: ArrayType | _: MapType | _: StructType | BinaryType => true
      case _ => false
    })
  }
}
