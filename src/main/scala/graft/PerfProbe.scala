package graft
import org.apache.spark.sql.SparkSession
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm JIT on tiny data
    run(SparkEntry.queries("f2_dedup_ngram_jaccard")(spark, "/root/testdata/sf0.001"))
    graft.operators.Dedup.releaseCaches(spark)
    t("shingle cache populate") {
      graft.operators.Dedup.sharedShingleSet(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text", 4).count()
    }
    t("f2 with warm cache") { run(SparkEntry.queries("f2_dedup_ngram_jaccard")(spark, dir)) }
    t("f2 again") { run(SparkEntry.queries("f2_dedup_ngram_jaccard")(spark, dir)) }
    t("f3 warm") { run(SparkEntry.queries("f3_dedup_minhash_lsh")(spark, dir)) }
    t("f7 warm") { run(SparkEntry.queries("f7_dedup_components")(spark, dir)) }
    t("e4 star") { run(SparkEntry.queries("e4_star_join")(spark, dir)) }
    t("e4 again") { run(SparkEntry.queries("e4_star_join")(spark, dir)) }
    t("f6 winnow") { run(SparkEntry.queries("f6_winnowing")(spark, dir)) }
    t("f6 again") { run(SparkEntry.queries("f6_winnowing")(spark, dir)) }
    t("b2") { run(SparkEntry.queries("b2_clustered_layout")(spark, dir)) }
    t("b6") { run(SparkEntry.queries("b6_bucketed_join")(spark, dir)) }
    spark.stop()
  }
}
