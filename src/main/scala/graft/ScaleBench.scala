package graft

import org.apache.spark.sql.SparkSession

/** Scale-stretch benchmark: time an explicit query-name list against an
  * arbitrary data directory (e.g. the documents-only `testdata/sf10`
  * built by `tools/gen_sf10_docs.py`), min of two timed passes after a
  * warm pass at sf0.001, one JSON line per run.
  *
  * Exists because `Bench` runs the FULL query set against full-table
  * dirs on every driver round — the 100x documents stretch only has
  * the documents table and only concerns the dedup/text families, so
  * it gets its own entry point instead of a conditional inside the
  * driver's hot path.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleBench <dir> <q1,q2,...>"
  */
object ScaleBench {

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      try run(SparkEntry.queries(name)(spark, warmDir))
      catch { case _: Throwable => () }
    }

    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      try run(SparkEntry.queries(name)(spark, dir))
      catch { case e: Throwable =>
        System.err.println(s"[scalebench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = timedPass()
    System.gc()
    val p2 = timedPass()
    def fmt(v: Double): String = f"$v%.3f"
    val qs = names.map(n => "\"" + n + "\":" + fmt(math.min(p1(n), p2(n))))
      .mkString("{", ",", "}")
    val passes = Seq(p1, p2).map(p =>
      names.map(n => "\"" + n + "\":" + fmt(p(n))).mkString("{", ",", "}"))
      .mkString("[", ",", "]")
    val total = names.map(n => math.min(p1(n), p2(n))).sum
    println(s"""{"metric":"scalebench","dir":"$dir","queries":$qs,"passes":$passes,"total":${fmt(total)},"unit":"sec"}""")
    spark.stop()
  }
}
