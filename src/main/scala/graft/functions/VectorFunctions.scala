package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns.
  *
  * All folds are strict left-to-right (`aggregate` with a 0.0 init),
  * with per-element promotion to double, so results are bit-reproducible
  * across engines that fold in the same order — the property the
  * DuckDB oracle relies on.
  */
object VectorFunctions {

  /** Σ a_i*b_i as a strict left fold in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ a_i² (left fold, double). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity = dot/(‖a‖·‖b‖). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** v / ‖v‖ as array<double>. */
  def l2Normalize(a: Column): Column =
    transform(a, x => x.cast("double") / norm(a))

  /** Deterministic pseudo-random hyperplane weight in [-1, 1]:
    * w(plane, i) = ((md5prefix64("plane,i") mod 2001) - 1000)/1000.
    * Seeded from md5 so Spark, the oracle and any other engine agree.
    * The weights are constants, so they are materialized driver-side
    * once (a literal array) instead of re-hashing per row — at 100 TB
    * that saves dim·planes md5 calls per record.
    */
  def hyperplane(plane: Int, dim: Int): Column =
    typedLit((0 until dim).map { i =>
      ((HashUtil.md5Prefix64(s"$plane,$i") % 2001L) - 1000L).toDouble / 1000.0
    })

  /** LSH bucket id from `planes` hyperplane sign bits (bit j set iff
    * dot(v, hp_j) > 0). Buckets partition the space so all-pairs work
    * is Σ bucket² instead of N² — the 100 TB-scale ANN path.
    */
  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      when(dot(v, hyperplane(j, dim)) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
