package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** TRAINING for the hashed linear quality classifier (H14/K24) — the
  * step that turns H14's "weights are a stand-in for a trained
  * vector" caveat into an actual fit, the way `BpeTrainer` does for
  * H12's merge table. The model is the classic Naive-Bayes log-odds
  * baseline over hashing-trick features (the fastText-shaped
  * CCNet/GPT-3 quality-gate family): tokens hash into `k` buckets
  * (md5-prefix, unbounded vocabulary) and
  *
  *   w[b] = ln((c_pos[b]+1)/(T_pos+k)) − ln((c_neg[b]+1)/(T_neg+k))
  *
  * with add-1 smoothing — the same arithmetic family as P13's DSIR
  * bucket ratios, quantized to integer MICROS so the per-doc score
  * Σ w[bucket(token)] is an exact BIGINT dot product (portable
  * despite the transcendental ln).
  *
  * Scale shape: one corpus token explode, ONE map-side-combined
  * (bucket, label) aggregation (≤ 2k rows out), one broadcast totals
  * row — the corpus never shuffles on anything wider than the bucket
  * id. The weight table is k rows: driver-collectable by design (the
  * g5/g7b codebook contract), and serving is the SAME K24 compiled
  * kernel h14 uses — training swaps 64 literals, not the plan.
  */
object QualityClassifier {

  /** The (bucket, n_target, n_rest, weight_u) table, one row per
    * bucket in [0, k) — buckets unseen in training still get their
    * smoothing-only weight.
    */
  def trainWeights(docs: DataFrame, textCol: String, isTarget: Column,
                   k: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val tok = docs
      .select(isTarget.as("__t"), explode(TextOps.tokens(col(textCol))).as("w"))
      .select(col("__t"), pmod(HashFunctions.md5prefix64(col("w")), lit(k.toLong)).as("b"))
    val counts = tok.groupBy("b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("n_target"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("n_rest"))
    val full = spark.range(k).select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .na.fill(0L, Seq("n_target", "n_rest"))
    val totals = full.agg(sum("n_target").as("tt"), sum("n_rest").as("tr"))
    full.crossJoin(broadcast(totals))
      .withColumn("weight_u", floor(
        (log((col("n_target") + 1).cast("double") / (col("tt") + k).cast("double"))
          - log((col("n_rest") + 1).cast("double") / (col("tr") + k).cast("double")))
          * lit(1e6) + lit(0.5)).cast("long"))
      .select("b", "n_target", "n_rest", "weight_u")
  }

  /** Driver-side weight vector, bucket-ordered, for the K24 kernel —
    * k rows by construction (the codebook-collect contract).
    */
  def collectWeights(weights: DataFrame, k: Int = 64): Seq[Long] = {
    val m = weights.select("b", "weight_u")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(m.size == k, s"expected $k buckets, got ${m.size}")
    (0 until k).map(b => m(b.toLong))
  }

  /** Score every document with the TRAINED weights via the K24
    * compiled kernel — h14's exact serving path, learned literals.
    * Token-less docs are dropped (the exploded oracle spelling emits
    * no group for them — h14's declared contract).
    */
  def applyWeights(docs: DataFrame, idCol: String, textCol: String,
                   weights: Seq[Long]): DataFrame =
    docs
      .withColumn("__cs", HashFunctions.classifierScore(col(textCol), weights))
      .select(col(idCol), col("__cs.n_tokens").as("n_tokens"),
        col("__cs.score").as("score"))
      .filter(col("n_tokens") > 0)
      .withColumn("label", col("score") > 0)
}
