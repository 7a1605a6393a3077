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

  test("sizing report: rank error is non-increasing over nested grids, zero on distinct singleton cells") {
    val df = corpus.toDF("id", "g", "v")
    val rep = ScaleOps.gridSizingReport(df, "g", "v",
      Seq(1, 2, 4, 8), Seq(50, 95)).collect()
    assert(rep.length == 4 * 3)
    rep.foreach(r => assert(r.getLong(4) >= 0 && r.getLong(5) >= 0, r.toString))
    rep.groupBy(_.getString(1)).foreach { case (grp, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      // nested grids (1|2|4|8): the finer answer cell sits at or
      // before the coarser one, so cum(answer) − target cannot grow
      sorted.sliding(2).foreach { case Array(coarse, fine) =>
        assert(fine.getLong(4) <= coarse.getLong(4),
          s"$grp p50: rank err grew ${coarse.getLong(4)} -> ${fine.getLong(4)} at G=${fine.getLong(0)}")
        assert(fine.getLong(5) <= coarse.getLong(5),
          s"$grp p95: rank err grew ${coarse.getLong(5)} -> ${fine.getLong(5)} at G=${fine.getLong(0)}")
        assert(fine.getLong(3) >= coarse.getLong(3), s"$grp: n_cells shrank")
      }
    }
    // degenerate exactness: distinct integer values on a unit grid put
    // every value in its own cell — the read-out is rank-exact
    val exact = ScaleOps.gridSizingReport(
      (0 until 1000).map(i => (i.toLong, "a", i.toDouble)).toDF("id", "g", "v"),
      "g", "v", Seq(1), Seq(50, 95)).collect()
    assert(exact.length == 1 &&
      exact(0).getLong(4) == 0L && exact(0).getLong(5) == 0L)
  }

  test("sizing report one-scan fold: folded coarse sketch equals the direct sketch, negatives included") {
    // the e14f one-scan contract: cell@G = floorDiv(cell@Gmax, Gmax/G)
    // bit-exactly for nesting power-of-two grids — including NEGATIVE
    // values, where a truncating DIV (unlike floor division) would
    // mis-fold cells
    import org.apache.spark.sql.functions._
    val df = (0 until 2000)
      .map(i => ("a", ((i * 37 % 401) - 200) / 8.0)).toDF("g", "v")
    for (g <- Seq(1, 2, 4)) {
      val k = 8 / g
      val direct = ScaleOps.gridQuantileSketch(df, "g", "v", g)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val folded = ScaleOps.gridQuantileSketch(df, "g", "v", 8)
        .groupBy(col("g"),
          expr(s"(cast(cell as bigint) - pmod(cast(cell as bigint), ${k}L))" +
            s" div ${k}L").as("cell"))
        .agg(sum(col("c")).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(folded == direct, s"fold to G=$g diverged from the direct sketch")
    }
    // non-nesting grids are refused loudly
    intercept[IllegalArgumentException](
      ScaleOps.gridSizingReport(df, "g", "v", Seq(3, 8), Seq(50)))
    // duplicate grids too — the explode would merge their counts into
    // one double-counted row instead of the old two duplicate rows
    intercept[IllegalArgumentException](
      ScaleOps.gridSizingReport(df, "g", "v", Seq(8, 8), Seq(50)))
  }
}
