package graft

import org.apache.spark.sql.functions._

/** E13f: deterministic HLL. The oracle proves cross-engine bit
  * equality; this spec proves the ESTIMATOR: accuracy inside the
  * published envelope on both branches (linear counting for small
  * sets, raw HLL for large), via the query definition itself.
  */
class HllSpec extends SparkSpecBase {
  import spark.implicits._

  private def estimate(nUsers: Int): Double = {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    val rows = (0 until nUsers * 3).map { i =>
      (i.toLong, (i % nUsers).toLong, "evt",
        new java.sql.Timestamp(1700000000000L + i), 1.0)
    }
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("e13f_hll_distinct")(spark, dir)
      .head().getAs[Double]("approx_users")
  }

  test("small-range branch (linear counting): near-exact at low cardinality") {
    val est = estimate(500)
    assert(math.abs(est - 500) / 500.0 < 0.05, s"est=$est for 500")
  }

  test("raw-HLL branch: inside 3 sigma (1.04/sqrt(4096) ~ 1.6%) at high cardinality") {
    val est = estimate(60000)
    assert(math.abs(est - 60000) / 60000.0 < 0.05, s"est=$est for 60000")
  }
}
