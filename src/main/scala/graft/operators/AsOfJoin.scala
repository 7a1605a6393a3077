package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** ASOF join (ClickHouse `ASOF JOIN`, kdb aj): for every left row,
  * the latest right row with rightTime <= leftTime within the same
  * key.
  *
  * Implemented with the union-merge trick instead of a range join:
  * tag both sides, union, one window pass per key ordered by time
  * carrying the last-seen right payload forward, keep left rows.
  * Cost is ONE hash shuffle on the key + a per-partition sort —
  * O((L+R)·log) — where a naive inequality join is O(L·R) per key
  * and can't hash-partition. This is the 100 TB path; it is also
  * exactly how a sorted-merge ASOF executes.
  */
object AsOfJoin {

  /** Right payload columns are emitted as `asof_<name>` (all null when
    * no right row precedes the left row — LEFT ASOF semantics). The
    * payload travels as one struct, so all `asof_*` values always come
    * from the SAME right row. At equal timestamps the right row is
    * visible to the left row (CH `<=` semantics); among equal right
    * timestamps the latest by `rightTieBreak` wins.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], rightTieBreak: String): DataFrame =
    joinAsOfImpl(left, right, key, leftTime, rightTime, rightPayload,
      rightTieBreak, forward = false)

  /** [[joinAsOf]] with a match tolerance (pandas merge_asof's
    * `tolerance`): a preceding right row older than `tolerance`
    * (a SQL interval, e.g. "30 MINUTES") does not match — its
    * payload comes back null, exactly as if no right row preceded.
    * The stale-data guard for enrichment joins: a position should not
    * inherit an hours-old weather report.
    */
  def joinAsOfWithin(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     rightPayload: Seq[String], rightTieBreak: String,
                     tolerance: String): DataFrame = {
    // carry the matched right time if the caller didn't ask for it
    val appended = !rightPayload.contains(rightTime)
    val payload = if (appended) rightPayload :+ rightTime else rightPayload
    val joined = joinAsOfImpl(left, right, key, leftTime, rightTime,
        payload, rightTieBreak, forward = false)
      // freshness decided ONCE against the original matched time —
      // the payload columns are about to be overwritten
      .withColumn("__fresh",
        col(s"asof_$rightTime") >= col(leftTime) - expr(s"INTERVAL $tolerance"))
    rightPayload.foldLeft(joined) { (df, c) =>
        df.withColumn(s"asof_$c", when(col("__fresh"), col(s"asof_$c")))
      }
      .drop((if (appended) Seq(s"asof_$rightTime") else Seq.empty) :+ "__fresh": _*)
  }

  /** Forward ASOF (CH `ASOF JOIN ... ON l.t <= r.t`): for every left
    * row, the EARLIEST right row with rightTime >= leftTime in the
    * key. Same union-merge machinery as [[joinAsOf]], scanning time
    * descending; among right rows at the same instant the SMALLEST
    * `rightTieBreak` wins (the deterministic mirror of backward's
    * latest-wins).
    */
  def joinAsOfForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      rightPayload: Seq[String], rightTieBreak: String): DataFrame =
    joinAsOfImpl(left, right, key, leftTime, rightTime, rightPayload,
      rightTieBreak, forward = true)

  private def joinAsOfImpl(left: DataFrame, right: DataFrame, key: String,
                           leftTime: String, rightTime: String,
                           rightPayload: Seq[String], rightTieBreak: String,
                           forward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    val rStruct = right.select(col(key), col(rightTime).as("__t"),
      lit(1).as("__side"), col(rightTieBreak).cast("long").as("__tie"),
      struct(rightPayload.map(col): _*).as("__p"))
    val pType = rStruct.schema("__p").dataType
    val ordered = Seq("__t", "__side", "__tie", "__p")

    val lAligned = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(0))
      .withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__p", lit(null).cast(pType))
      .select((lCols ++ ordered).map(col): _*)
    val rAligned = lCols.foldLeft(rStruct) { (df, c) =>
        if (c == key) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select((lCols ++ ordered).map(col): _*)

    // Right rows sort before left rows at the same instant (__side
    // desc) so an equal-timestamp right row is matched in either
    // direction. Backward scans time ascending and the latest tie
    // wins (tie asc: it is scanned last); forward scans descending
    // and the smallest tie wins (tie desc: scanned last).
    val w = Window.partitionBy(col(key))
      .orderBy(
        (if (forward) col("__t").desc else col("__t").asc),
        col("__side").desc,
        (if (forward) col("__tie").desc else col("__tie").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionByName(rAligned)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select((lCols.map(col) ++
        rightPayload.map(c => col("__p").getField(c).as(s"asof_$c"))): _*)
  }
}
