package graft

import graft.functions.VectorFunctions
import graft.operators.Embeddings
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Trained PQ codebooks (the PQ half of the "swap in trained
  * centroids" seam; the coarse half is G7b). Two load-bearing
  * claims:
  *
  *  1. training helps: per-subvector k-means codewords quantize the
  *     corpus with strictly lower reconstruction error than the md5
  *     demo codebook — the reason a production index trains at all;
  *  2. codebook quality never changes CORRECTNESS of the final
  *     answer when the rerank budget is exhaustive: ADC only orders
  *     candidates, the exact cosine rerank decides — so trained and
  *     demo codebooks must both reproduce brute force exactly.
  */
class PqTrainedSpec extends SparkSpecBase {

  private val MSub = 4
  private val K = 16
  private val SubDim = 16

  private def quantError(cbs: Seq[Seq[Array[Double]]]): Double = {
    val emb = Tables.embeddings(spark, sf)
    val errs = cbs.zipWithIndex.map { case (cb, m) =>
      val cbLit = typedLit(cb.map(_.toSeq))
      val code = VectorFunctions.pqSubCodeFrom(col("embedding"), cb, m, SubDim)
      VectorFunctions.l2Sq(
        slice(col("embedding"), m * SubDim + 1, SubDim),
        element_at(cbLit, code + 1))
    }.reduce(_ + _)
    emb.agg(avg(errs)).head.getDouble(0)
  }

  test("trained codebooks quantize with lower error than the md5 demo codebook") {
    val emb = Tables.embeddings(spark, sf)
    val trained = Embeddings.trainPqCodebooks(emb, "vec_id", "embedding",
      MSub, K, SubDim, 2)
    assert(trained.length == MSub)
    trained.foreach(cb => assert(cb.nonEmpty && cb.forall(_.length == SubDim)))
    val demo = (0 until MSub).map(m => VectorFunctions.pqCodebook(m, K, SubDim))
    val (et, ed) = (quantError(trained), quantError(demo))
    info(f"mean reconstruction error: trained=$et%.4f demo=$ed%.4f")
    assert(et < ed, f"training did not reduce quantization error: $et%.4f vs $ed%.4f")
  }

  test("exhaustive rerank makes the answer codebook-independent (== brute force)") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      df.select(col("qid").cast("long"), col("rank").cast("int"), col("cid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val truth = pairs(Embeddings.knnBruteForce(emb, q, "vec_id", "embedding", 5))
    val trained = Embeddings.trainPqCodebooks(emb, "vec_id", "embedding",
      MSub, K, SubDim, 2)
    val got = pairs(Embeddings.annPqAdcWith(emb, q, trained,
      "vec_id", "embedding", SubDim, 5, 1000000))
    assert(got == truth)
  }
}
