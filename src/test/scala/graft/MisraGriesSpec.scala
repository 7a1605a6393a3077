package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._

/** K21 Misra-Gries: the guarantee the e25b screen-verify query builds
  * on — any key with true count > n/(k+1) survives the summary under
  * ANY partitioning (merge order), with k far below the key
  * cardinality so truncation and the Agarwal merge rule actually
  * fire. The surviving low-frequency TAIL is allowed to differ
  * between partitionings; the guarantee is no-false-negatives above
  * the threshold, which is what makes screen + exact-verify ≡ the
  * exact heavy-hitter query.
  */
class MisraGriesSpec extends SparkSpecBase {

  // 10 000 rows: key 1 at 15%, key 2 at 6%, key 3 at exactly 1%,
  // the rest singletons (7800 distinct) — cardinality ≫ k = 8.
  private def stream: Seq[Long] =
    Seq.fill(1500)(1L) ++ Seq.fill(600)(2L) ++ Seq.fill(100)(3L) ++
      (0 until 7800).map(i => 1000L + i)

  private val K = 8

  test("keys above n/(k+1) survive the summary under any partitioning") {
    import spark.implicits._
    val n = stream.size
    for (parts <- Seq(1, 5, 32)) {
      val cands = stream.toDF("key").repartition(parts)
        .agg(MisraGries.misraGries64(col("key"), K).as("c"))
        .select(explode(col("c")).as("k"))
        .collect().map(_.getLong(0)).toSet
      assert(cands.size <= K, s"summary exceeded k at parts=$parts")
      // 15% > 6% > n/(k+1) = 11.1%... only key 1 is GUARANTEED; the
      // bound is tight: key 2 (6%) may or may not survive.
      assert(cands.contains(1L), s"heavy key lost at parts=$parts: $cands")
    }
  }

  test("screen + exact verify equals the exact heavy-hitter query at every partitioning") {
    import spark.implicits._
    val df = stream.toDF("key")
    val n = stream.size.toLong
    // exact keys with cnt > n/(K+1)
    val exact = df.groupBy("key").count()
      .filter(col("count") * (K + 1) > n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (parts <- Seq(1, 5, 32)) {
      val d = df.repartition(parts)
      val cand = d.agg(MisraGries.misraGries64(col("key"), K).as("c"))
        .select(explode(col("c")).as("key"))
      val got = d.join(broadcast(cand), "key")
        .groupBy("key").count()
        .filter(col("count") * (K + 1) > n)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exact, s"screen-verify diverged at parts=$parts")
    }
  }

  test("e25b wiring: hashed-token screen at production k reproduces exact counts") {
    // the real query shape on real data, small threshold so several
    // keys qualify; k ≫ vocab here (the sf-scale regime) — the
    // ORDER-INDEPENDENCE of the final output is the contract.
    val out = SparkEntry.queries("e25b_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty)
    assert(out.sortBy(_._1) sameElements out, "output must be word-sorted")
  }
}
