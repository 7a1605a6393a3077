package graft

import graft.operators.Embeddings
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G2 robustness: recall@k of the LSH ANN paths against the G1
  * brute-force ground truth. Guards the single-probe recall cliff —
  * multi-probe (Hamming-1 bucket fan-out) must dominate single-probe
  * and clear an absolute floor on the test vectors.
  */
class AnnRecallSpec extends SparkSpecBase {

  private val K = 5
  private val NQ = 20 // query vectors: vec_id < NQ

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("qid").cast("long"), col("cid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test(s"multi-probe LSH recall@$K beats single-probe and clears the floor") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < NQ)
    val truth = pairs(Embeddings.knnBruteForce(emb, q, "vec_id", "embedding", K))
    val single = pairs(Embeddings.annLsh(emb, q, "vec_id", "embedding", 8, 64, K))
    val multi = pairs(Embeddings.annLshMultiProbe(emb, q, "vec_id", "embedding", 8, 64, K))

    val recallSingle = (truth & single).size.toDouble / truth.size
    val recallMulti = (truth & multi).size.toDouble / truth.size
    info(f"recall@$K single-probe=$recallSingle%.3f multi-probe=$recallMulti%.3f")

    assert(recallMulti >= recallSingle,
      f"multi-probe ($recallMulti%.3f) below single-probe ($recallSingle%.3f)")
    // Deterministic data + deterministic hyperplanes → these recalls
    // are fixed (measured: single=0.040, multi=0.140 — i.i.d. random
    // test vectors are LSH's worst case, there is no neighborhood
    // structure to exploit; real embedding corpora cluster and recall
    // rises accordingly). The floor sits just under the measured
    // multi-probe value to catch regressions (bucket fn change, probe
    // loss), not noise.
    assert(recallMulti >= 0.12, f"multi-probe recall collapsed: $recallMulti%.3f")

    // The SURVEY §5 sizing rule applied to this corpus (N≈500 →
    // 4 planes = 16 buckets of ~30) must dominate the 8-plane demo
    // constant, whose buckets are mostly singletons here — the
    // measurable version of "bucket counts scale with N".
    val sized = pairs(Embeddings.annLshMultiProbe(emb, q, "vec_id", "embedding", 4, 64, K))
    val recallSized = (truth & sized).size.toDouble / truth.size
    info(f"recall@$K rule-sized(4 planes)=$recallSized%.3f")
    assert(recallSized >= recallMulti,
      f"rule-sized recall ($recallSized%.3f) below demo-constant recall ($recallMulti%.3f)")
  }

  test("ivfProbeCells with nprobe=1 reproduces the ivfCellFold assignment") {
    import graft.functions.VectorFunctions
    val cb = VectorFunctions.codebook(8, 64)
    val emb = Tables.embeddings(spark, sf)
    val both = emb.select(
      VectorFunctions.ivfCellFold(col("embedding"), cb).as("cell"),
      element_at(VectorFunctions.ivfProbeCells(col("embedding"), cb, 1), 1)
        .as("probe1"))
    assert(both.filter(col("cell") =!= col("probe1")).count() == 0)
  }

  test("IVF-PQ recall is monotone in nprobe and exact when probing every cell") {
    import graft.functions.VectorFunctions
    val cb = VectorFunctions.codebook(8, 64)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < NQ)
    val truth = pairs(Embeddings.knnBruteForce(emb, q, "vec_id", "embedding", K))
    // rerank >> corpus removes the ADC-truncation variable: the result
    // is then the EXACT cosine top-k within the probed cells, so more
    // probed cells can only widen the candidate set (monotone recall),
    // and probing all 8 cells must reproduce brute force identically.
    def got(nprobe: Int): Set[(Long, Long)] =
      pairs(Embeddings.annIvfPq(emb, q, cb, "vec_id", "embedding",
        4, 16, 16, nprobe, 1000000, K))
    val r1 = (truth & got(1)).size.toDouble / truth.size
    val r4 = (truth & got(4)).size.toDouble / truth.size
    info(f"IVF-PQ recall@$K nprobe=1 $r1%.3f nprobe=4 $r4%.3f")
    assert(r4 >= r1, f"nprobe=4 ($r4%.3f) below nprobe=1 ($r1%.3f)")
    assert(got(8) == truth, "nprobe=all-cells with exhaustive rerank must equal brute force")
  }

  test("g8 recall report: trained IVF-PQ operating curve clears measured floors") {
    import graft.operators.Embeddings
    val emb = Tables.embeddings(spark, sf)
    val coarse = Embeddings.collectCodebook(
      Embeddings.kmeansCentroids(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 2))
    val cbs = Embeddings.trainPqCodebooks(emb, "vec_id", "embedding", 4, 16, 16, 2)
    val rep = Embeddings.recallReport(emb, emb.filter(col("vec_id") < 10),
        coarse, cbs, "vec_id", "embedding", 16, Seq(1, 8), 20, 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    info(s"trained IVF-PQ recall@10: nprobe=1 ${rep.get(1)} nprobe=8 ${rep.get(8)}")
    // Deterministic data + deterministic training → fixed values
    // (measured at sf0.01: 0.51 / 0.92 with the per-probe rerank
    // budget). Floors sit under the measured values to catch
    // regressions (probe loss, budget regression), not noise.
    assert(rep(8) >= rep.getOrElse(1, 0.0), "recall must not degrade with more probes")
    assert(rep(8) >= 0.85, s"full-probe recall collapsed: ${rep(8)}")
    assert(rep.getOrElse(1, 0.0) >= 0.40, s"single-probe recall collapsed: ${rep.get(1)}")
  }

  test("g11 dim-prefix screen: recall monotone in rerank and clears the floor") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < NQ)
    val truth = pairs(Embeddings.knnBruteForce(emb, q, "vec_id", "embedding", K))
    val recalls = Seq(16, 32, 64).map { rr =>
      val got = pairs(Embeddings.annDimPrefix(emb, q, "vec_id", "embedding", 16, rr, K))
      rr -> (truth & got).size.toDouble / truth.size
    }
    info(recalls.map { case (rr, r) => f"rerank=$rr $r%.3f" }.mkString(" "))
    // Deterministic data → fixed values (measured: 0.35 / 0.49 / 0.62
    // at sf0.001; ~same at sf0.01). A 16-dim prefix of an i.i.d.
    // 64-dim vector preserves ~1/4 of the signal — already 3.5× LSH
    // multi-probe's recall here, and the rerank knob buys the rest
    // monotonically. Floors sit under measured values.
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall must be monotone in rerank: $recalls")
    assert(recalls.toMap.apply(32) >= 0.40,
      s"rerank=32 recall collapsed: ${recalls.toMap.apply(32)}")
  }

  test("g16 nprobe sizing: chosen width monotone in target, met is exact integer arithmetic, cost tracks width") {
    val rows = SparkEntry.queries("g16_nprobe_sizing")(spark, sf)
      .orderBy("target").collect()
    assert(rows.length == 4)
    // harder targets never pick a NARROWER width
    val widths = rows.map(_.getInt(1))
    assert(widths.sliding(2).forall { case Array(a, b) => b >= a },
      s"nprobe not monotone in target: ${widths.toSeq}")
    rows.foreach { r =>
      val (target, met, hits, truth) =
        (r.getLong(0), r.getBoolean(2), r.getLong(3), r.getLong(4))
      assert(met == (hits * 100 >= target * truth),
        s"met flag disagrees with the integer test at target $target")
      // a met target must be met by the SMALLEST such width: every
      // narrower width in the g8 curve must miss it — checked via
      // the recall column being the achieved (not requested) value
      assert(r.getDouble(6) == math.floor(
        hits.toDouble / truth * 1e4 + 0.5) / 1e4)
    }
    // cost axis: the candidate pool grows with the chosen width
    val byWidth = rows.map(r => r.getInt(1) -> r.getLong(5)).toMap
    assert(byWidth.toSeq.sortBy(_._1).map(_._2).sliding(2)
      .forall { case Seq(a, b) => b >= a case _ => true },
      s"cand_rows not monotone in nprobe: $byWidth")
  }

  test("g16 zero-hit degenerate: every target still reports the widest width, met=false") {
    // rerankPerProbe = 0 keeps no candidates at any width — the exact
    // corner where a hits-only join would drop all widths and return
    // an empty report instead of the documented best-effort rows
    val emb = Tables.embeddings(spark, sf)
    val coarse = Embeddings.collectCodebook(
      Embeddings.kmeansCentroids(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 2))
    val cbs = Embeddings.trainPqCodebooks(emb, "vec_id", "embedding", 4, 16, 16, 2)
    val rep = Embeddings.nprobeSizingReport(emb, emb.filter(col("vec_id") < 10),
      coarse, cbs, "vec_id", "embedding", 16, Seq(1, 2, 4), 0, 10, Seq(50, 90))
      .collect()
    assert(rep.length == 2, s"expected one row per target: ${rep.toSeq}")
    rep.foreach { r =>
      assert(!r.getBoolean(2) && r.getInt(1) == 4 && r.getLong(3) == 0L,
        s"degenerate row wrong: $r")
    }
  }
}
