package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("e2_revenue_filter","e4_star_join","c1_latest_state","d2_time_series")) {
      println(s"========== $name")
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan.collectLeaves().foreach { leaf =>
        val s = leaf.toString.replace("\n", " ")
        val pf = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(s).getOrElse("PushedFilters: ?")
        val rs = "ReadSchema: [^,]+".r.findFirstIn(s).getOrElse("")
        println(s"  $pf | $rs")
      }
    }
    spark.stop()
  }
}
