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
}
