package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** H22 — token-distribution drift report on controlled corpora:
  * identical distributions read zero, a planted skew reads positive
  * with the planted token on top, and the divergence is bounded and
  * monotone in the skew.
  */
class TokenDriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("identical slice distributions have zero JSD; report totals are exact") {
    // two slices, same token multiset each
    val docs = Seq(
      (1L, "alpha beta beta gamma", "a"),
      (2L, "alpha beta beta gamma", "b"))
      .toDF("doc_id", "text", "src")
    val rep = TextOps.tokenDriftReport(docs, "src")
      .orderBy("src").collect()
    assert(rep.length == 2)
    rep.foreach { r =>
      assert(r.getDouble(3) == 0.0, s"jsd6 nonzero for ${r.getString(0)}: $r")
      assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
      // every token's slice rate equals its corpus rate
      assert(r.getLong(7) == 0L, s"top delta nonzero: $r")
    }
  }

  test("a planted skewed token dominates the drift report and JSD is bounded by ln 2") {
    val base = "the quick brown fox jumps over the lazy dog"
    val skewed = base + (" zebra" * 12)
    // clean is the MAJORITY slice: the corpus mixture then sits near
    // clean's distribution, so the minority slice carrying the skew
    // must read as the mover (a slice that dominates the corpus is
    // always near the corpus — mixture weighting, not a bug)
    val docs = ((1L to 10L).map(i => (i, base, "clean")) :+
      (11L, skewed, "drifted"))
      .toDF("doc_id", "text", "src")
    val rep = TextOps.tokenDriftReport(docs, "src")
      .collect().map(r => r.getString(0) -> r).toMap
    val drifted = rep("drifted")
    val clean = rep("clean")
    assert(drifted.getString(4) == "zebra", s"top_w: $drifted")
    assert(drifted.getDouble(3) > 0.0 && drifted.getDouble(3) <= math.log(2.0))
    assert(clean.getDouble(3) > 0.0, "the complement slice drifts too (it lacks zebra)")
    assert(drifted.getDouble(3) > clean.getDouble(3),
      "the minority slice carrying the skew diverges more than the majority")
    // zebra's slice rate far above its corpus rate, and integer-exact:
    // 12 zebras / 21 tokens in the slice; 12 / 111 overall
    assert(drifted.getLong(5) == 12L * 1000000L / 21L)
    assert(drifted.getLong(6) == 12L * 1000000L / 111L)
  }

  test("drift grows with the skew (monotone in planted copies)") {
    def jsdFor(copies: Int): Double = {
      val base = "one two three four five six seven eight nine ten"
      val docs = Seq(
        (1L, base, "clean"),
        (2L, base + (" drift" * copies), "hot"))
        .toDF("doc_id", "text", "src")
      TextOps.tokenDriftReport(docs, "src")
        .filter(col("src") === "hot").head().getDouble(3)
    }
    val js = Seq(1, 4, 16).map(jsdFor)
    assert(js(0) < js(1) && js(1) < js(2), s"not monotone: $js")
  }
}
