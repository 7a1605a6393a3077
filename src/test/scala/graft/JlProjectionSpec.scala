package graft

import graft.functions.{HashUtil, VectorFunctions}
import graft.operators.Embeddings
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** G15: Johnson–Lindenstrauss sign projection (Achlioptas 2003).
  * Pins (1) the projection against a direct Scala reference over the
  * same seeded matrix, (2) the matrix is genuinely ±1 and roughly
  * balanced (a parity bug that yields all +1 would silently degrade
  * to a dim-sum), (3) a recall floor for the served top-k against
  * brute-force truth on real testdata — the quality contract of the
  * compression lever.
  */
class JlProjectionSpec extends SparkSpecBase {
  import spark.implicits._

  private def refProject(v: Seq[Float], dOut: Int): Seq[Double] =
    (0 until dOut).map { j =>
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        val s = if (HashUtil.md5Prefix64(s"jl$j,$i") % 2L == 0L) 1.0 else -1.0
        acc += s * v(i).toDouble
        i += 1
      }
      acc
    }

  test("jlProject equals the direct reference fold on real vectors") {
    val rows = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.jlProject(col("embedding"), 16, 64).as("proj"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val got = r.getSeq[Double](2)
      val want = refProject(v, 16)
      assert(got === want, s"vec ${r.getLong(0)}")
    }
  }

  test("sign matrix is ±1 and balanced enough to mix dims") {
    val flat = (0 until 16).flatMap(j => VectorFunctions.jlSignRow(j, 64))
    assert(flat.forall(s => s == 1.0 || s == -1.0))
    val plus = flat.count(_ == 1.0)
    // md5 parity over 1024 draws: a degenerate constant matrix (the
    // parity-bug failure mode) is excluded; exact balance isn't needed
    assert(plus > 400 && plus < 624, s"plus=$plus of ${flat.size}")
    // rows are distinct (no seed-space collision)
    assert((0 until 16).map(j => VectorFunctions.jlSignRow(j, 64)).distinct.size == 16)
  }

  test("jl16/r32 recall@5 floor against brute-force truth") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
    val truth = Embeddings.knnBruteForce(emb, q, "vec_id", "embedding", 5)
      .select("qid", "cid")
    val served = Embeddings.annJl(emb, q, "vec_id", "embedding", 16, 64, 32, 5)
      .select("qid", "cid")
    val hits = served.join(truth, Seq("qid", "cid")).count()
    val total = truth.count()
    assert(total == 50)
    // measured 22/50 on this corpus (synthetic near-isotropic vectors
    // are JL's worst case — pairwise cosines concentrate near 0). A
    // random 32-candidate screen would land ~3/50; the floor pins the
    // projection is carrying real signal, with slack for seed drift.
    assert(hits >= 18, s"recall $hits/$total")
  }
}
