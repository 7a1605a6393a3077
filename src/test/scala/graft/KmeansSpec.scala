package graft

import graft.operators.Embeddings
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** G5: Lloyd k-means. The algorithmic invariant is monotonicity —
  * each (update centroids, reassign) round cannot increase the total
  * within-cluster squared distance: the assignment step minimizes
  * given centroids, the mean minimizes squared distance given the
  * assignment. Also pins the output contract (total assignment,
  * clusters drawn from the seed ids).
  */
class KmeansSpec extends SparkSpecBase {

  private def assigned(iters: Int) = Embeddings.kmeansLloyd(
    Tables.embeddings(spark, sf),
    Tables.embeddings(spark, sf).filter(col("vec_id") < 8),
    "vec_id", "embedding", iters)

  test("lloyd iterations never increase total SSE (G5)") {
    def sse(iters: Int): Double =
      assigned(iters).agg(sum(col("d"))).head.getDouble(0)
    val s1 = sse(1)
    val s2 = sse(2)
    val s3 = sse(3)
    assert(s2 <= s1 + 1e-9, s"iteration 2 increased SSE: $s1 -> $s2")
    assert(s3 <= s2 + 1e-9, s"iteration 3 increased SSE: $s2 -> $s3")
  }

  test("assignment is total and clusters come from the seed set") {
    val a = assigned(2)
    val n = Tables.embeddings(spark, sf).count()
    assert(a.count() == n)
    val clusters = a.select("cluster").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf((0L until 8L).toSet))
    assert(a.filter(col("d") < 0).count() == 0)
  }

  test("kmeansCentroids returns the centroids the final assignment used") {
    // Reassigning the corpus against the returned centroid frame must
    // reproduce kmeansLloyd's own assignment exactly — the seam that
    // lets trained centroids feed the literal-codebook ANN paths.
    val emb = Tables.embeddings(spark, sf)
    val init = emb.filter(col("vec_id") < 8)
    val cents = Embeddings.kmeansCentroids(emb, init, "vec_id", "embedding", 2)
    assert(cents.count() == 8)
    val cb = Embeddings.collectCodebook(cents)
    assert(cb.length == 8 && cb.forall(_.length == 64))

    // Fold-based IVF assignment over the collected codebook (cosine
    // ranking) vs the DataFrame path (ivfAssign over the same
    // centroid frame): same cells for every vector. Fold cell i maps
    // to cluster id i because collectCodebook orders by cluster.
    val foldCells = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.ivfCellFold(col("embedding"), cb)
          .cast("long").as("cell"))
    val dfCells = Embeddings.ivfAssign(emb,
        cents.select(col("cluster").as("vec_id"), col("cv").as("embedding")),
        "vec_id", "embedding")
      .select(col("vec_id"), col("cell"))
    assert(foldCells.join(dfCells.withColumnRenamed("cell", "cell2"), "vec_id")
      .filter(col("cell") =!= col("cell2")).count() == 0)
  }

  test("r16 trainer persistence: a second identical training returns identical artifacts") {
    // kmeansCentroids / trainPqCodebooks now persist their plan-keyed
    // frames so repeat consumers (g7b/g8/g16 share one spec) reuse one
    // materialization — the persisted path must be result-invisible.
    val emb = Tables.embeddings(spark, sf)
    val init = emb.filter(col("vec_id") < 8)
    val cb1 = Embeddings.collectCodebook(
      Embeddings.kmeansCentroids(emb, init, "vec_id", "embedding", 2))
    val cb2 = Embeddings.collectCodebook(
      Embeddings.kmeansCentroids(emb, init, "vec_id", "embedding", 2))
    assert(cb1.length == cb2.length &&
      cb1.zip(cb2).forall { case (a, b) => a.sameElements(b) })
    val pq1 = Embeddings.trainPqCodebooks(emb, "vec_id", "embedding", 4, 16, 16, 2)
    val pq2 = Embeddings.trainPqCodebooks(emb, "vec_id", "embedding", 4, 16, 16, 2)
    assert(pq1.size == pq2.size && pq1.zip(pq2).forall { case (s1, s2) =>
      s1.size == s2.size && s1.zip(s2).forall { case (a, b) => a.sameElements(b) }
    })
  }
}
