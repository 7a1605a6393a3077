package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

/** E14e: fixed-grid mergeable quantile sketch. The oracle proves the
  * SQL replay; this spec pins the three properties that make it a
  * SKETCH — partition invariance (merge commutes), explicit
  * half-corpus merge ≡ one-shot build, and the integer-rank read-out
  * landing in the true quantile's cell (error bounded by one grid
  * step by construction).
  */
class GridQuantileSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(7)
    (0 until 5000).map(i => (i.toLong, s"g${i % 3}", rnd.nextDouble() * 300 - 50))
  }

  test("sketch read-out is identical at 1, 5 and 32 partitions") {
    val results = Seq(1, 5, 32).map { p =>
      val df = corpus.toDF("id", "g", "v").repartition(p)
      ScaleOps.gridQuantiles(
          ScaleOps.gridQuantileSketch(df, "g", "v"), "g", Seq(25, 50, 75, 95))
        .orderBy("g").collect().map(_.toSeq).toSeq
    }
    assert(results.distinct.length == 1,
      "grid sketch must be a pure function of the value multiset")
  }

  test("merging two half-corpus sketches equals the one-shot sketch") {
    val df = corpus.toDF("id", "g", "v")
    val a = ScaleOps.gridQuantileSketch(df.filter(col("id") % 2 === 0), "g", "v")
    val b = ScaleOps.gridQuantileSketch(df.filter(col("id") % 2 === 1), "g", "v")
    // merge = counter addition per (group, cell)
    val merged = a.unionByName(b)
      .groupBy("g", "cell").agg(sum("c").as("c"))
    val oneShot = ScaleOps.gridQuantileSketch(df, "g", "v")
    assert(merged.orderBy("g", "cell").collect().map(_.toSeq).toSeq ==
      oneShot.orderBy("g", "cell").collect().map(_.toSeq).toSeq)
  }

  test("integer-rank read-out lands in the true quantile's cell") {
    val df = corpus.toDF("id", "g", "v")
    val q = ScaleOps.gridQuantiles(
        ScaleOps.gridQuantileSketch(df, "g", "v"), "g", Seq(25, 50, 75, 95))
      .collect().map(r => r.getString(0) -> r).toMap
    val byGroup = corpus.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    byGroup.foreach { case (g, vs) =>
      val row = q(g)
      assert(row.getLong(1) == vs.length) // n
      Seq(25, 50, 75, 95).zipWithIndex.foreach { case (pct, i) =>
        val rank = (vs.length.toLong * pct + 99) / 100 // ceil(q·n)
        val truth = vs((rank - 1).toInt)
        val cell = row.getLong(3 + i)
        assert(cell == math.floor(truth).toLong,
          s"$g p$pct: cell $cell but true rank-$rank value $truth is in cell ${math.floor(truth).toLong}")
      }
    }
  }
}
