package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** F9b — the bucketed band index must (a) answer exactly like the
  * plain re-shuffling f9 path, and (b) join with ZERO exchange on the
  * index side even when broadcasting is impossible — the property
  * that makes incremental screening exchange-free on the corpus-sized
  * side at 100 TB, where the delta routinely exceeds the broadcast
  * threshold.
  */
class BucketedBandIndexSpec extends SparkSpecBase {

  private val table = "g_band_idx_spec"

  private def reset(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
  }

  test("bucketed screen == plain incremental screen, with zero index-side exchanges") {
    reset()
    val docs = Tables.documents(spark, sf)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    Dedup.writeBandIndex(
      Dedup.minhashBands(hist, "doc_id", "text", 4), table, 4)

    val plain = Dedup.incrementalNearDup(
        Dedup.minhashBands(hist, "doc_id", "text", 4), delta, "doc_id", "text", 4)
      .orderBy("delta_id", "hist_id").collect().toSeq
    assert(plain.nonEmpty, "screen should find near-dups in the test corpus")

    // Forbid broadcast so the pin proves the BUCKETED layout (not a
    // broadcast of the delta) is what keeps the index exchange-free.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.incrementalNearDupBucketed(
        spark, table, "doc_id", delta, "text", 4)
      val bucketed = df.orderBy("delta_id", "hist_id").collect().toSeq
      assert(bucketed == plain)

      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString.replace("\n", " ")
      // The index probe is a bucketed FileScan feeding the join with
      // NO Exchange above it: the plan's only hash exchanges are the
      // delta side entering the join and the final pair aggregation.
      assert("Bucketed: true".r.findFirstIn(p).isDefined, p.take(800))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges <= 2, s"expected <=2 exchanges (delta join input + pair agg), got $exchanges: ${p.take(1200)}")
      assert("BroadcastHashJoin".r.findFirstIn(p).isEmpty)
      // and no exchange sits between the index scan and the join:
      // the segment of the plan from the bucketed scan upward to the
      // join must not contain one. SMJ prints streamed side first;
      // the bucketed scan is on the build (second) side — assert no
      // Exchange AFTER the last Exchange-free bucketed scan marker.
      val idxSide = p.substring(p.lastIndexOf("Sort [band"))
      assert("Exchange".r.findFirstIn(idxSide).isEmpty,
        s"index side must be exchange-free: ${idxSide.take(600)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
