package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed funnel analysis — ClickHouse `windowFunnel(window)(ts,
  * cond1, ..., condN)` semantics (reference dashboards build funnels
  * over event streams the same way): per key, the deepest event chain
  * step1 < step2 < ... < stepK whose LAST step falls within `windowUs`
  * of the chain's FIRST step.
  *
  * Exactness: a chain may start at ANY step-1 event. For a fixed
  * start, taking the EARLIEST valid next event at every step minimizes
  * the chain's end time, so greedy-per-start reaches depth K iff any
  * chain from that start does; maximizing over starts is then exact.
  *
  * Scale shape: each step is a hash join on the key with the time
  * bounds as residual filters, followed by a map-side-combined min per
  * (key, start) — work is Σ per-key |starts|·|step events|, bounded by
  * per-key event counts (the same locality ClickHouse exploits), never
  * a cross join, and no per-key event-list materialization.
  */
object Funnels {

  /** Per-key max funnel depth (1..steps.length) over keys that have at
    * least one step-1 event; keys without one are absent (depth 0 by
    * convention, like CH windowFunnel).
    */
  def windowFunnelDepth(events: DataFrame, keyCol: String, tsCol: String,
                        typeCol: String, steps: Seq[String],
                        windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val starts = events.filter(col(typeCol) === steps.head)
      .select(col(keyCol), col(tsCol).as("__t1")).distinct()
    // frontier k: (key, __t1, __t) = chains from each start reaching
    // step k, with the earliest possible step-k time
    var frontier = starts.withColumn("__t", col("__t1"))
    var reached = Seq(starts.select(col(keyCol), col("__t1"), lit(1).as("__d")))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val nextEv = events.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol).as("__tn"))
      frontier = frontier.join(nextEv, keyCol)
        .filter(col("__tn") > col("__t") &&
          col("__tn") <= col("__t1") + windowUs)
        .groupBy(col(keyCol), col("__t1"))
        .agg(min(col("__tn")).as("__t"))
      reached = reached :+
        frontier.select(col(keyCol), col("__t1"), lit(i + 1).as("__d"))
    }
    reached.reduce(_ unionByName _)
      .groupBy(col(keyCol)).agg(max(col("__d")).as("depth"))
  }
}
