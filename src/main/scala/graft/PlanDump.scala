package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: writes `.explain("formatted")`
  * output (plus the AQE-final executed plan after a noop run) for the
  * named queries to `plans/<tag>/<query>_<suffix>.txt`.
  *
  * `runMain graft.PlanDump <tag> <suffix> <query> [query ...]`
  * e.g. `runMain graft.PlanDump r16 before p29_deletion_audit`
  *
  * Runs at sf0.01 by default (plan SHAPE is what the files pin; the
  * bench carries the timings) — override with SPARK_GRAFT_SF_DIR.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query...>")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    new java.io.File(s"plans/$tag").mkdirs()
    for (name <- names) {
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      val executedFinal = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"),
        s"== explain(formatted), data=$dir ==\n$formatted\n" +
          s"== AQE-final executed plan (after noop run) ==\n$executedFinal\n")
      println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
