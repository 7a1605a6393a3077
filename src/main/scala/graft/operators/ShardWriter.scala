package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** P25 — the training-shard WRITER with manifest: closes the loop
  * from curation to the artifact a training run consumes. P4 plans
  * the packing (contiguous token-budget bins over doc_id order,
  * two-level prefix sum — no global window); this materializes the
  * plan as deterministic `shard=`-partitioned files plus a MANIFEST
  * table (shard → doc-id range, token count, 8-byte content
  * checksum, source mix) — the `b2_clustered_layout` write→read-back
  * treatment applied to the pipeline's OUTPUT.
  *
  * Determinism contract: same corpus ⇒ same plan (the prefix sum is
  * order-defined on unique doc_id), same per-shard row order (sorted
  * by doc_id within the shard write), same bytes — so a re-write is
  * byte-identical and a manifest diff between two runs means the
  * CORPUS changed, never the writer (spec-pinned). The manifest's
  * content hash is an order-independent XOR of per-doc
  * `md5prefix64(doc_id || ':' || text)` — recomputable from the
  * read-back files alone, which is what [[manifestFromFiles]] does:
  * it re-derives tokens and hashes from the file CONTENTS, trusting
  * only the layout, so a corrupted or tampered shard hash-mismatches
  * the planned manifest.
  *
  * Scale shape: the plan is P4's (one prefix sum, bucket-metadata
  * broadcast); the write shuffles each doc once to its shard; the
  * manifest is one map-side-combined aggregation at shard grain plus
  * a (shard, source) mix rollup. Nothing is driver-collected.
  */
object ShardWriter {

  /** P4's bin budget (tokens per shard). */
  val TokensPerShard = 4096L

  private[operators] def withSignals(docs: DataFrame): DataFrame =
    docs.withColumn("n_tokens",
        TextOps.bpeTokenCount(col("text")).cast("long"))
      .withColumn("doc_hash",
        graft.functions.HashFunctions.md5prefix64(
          concat(col("doc_id").cast("string"), lit(":"), col("text"))))

  /** The packing plan: P4's shard assignment over (doc_id, text,
    * source) plus the per-doc signals the manifest aggregates.
    * `orderCol` is the numeric total-order key the prefix sum packs
    * along — doc_id by default (today's contract); P26 passes a
    * composed (phase, doc_id) key so shards come out in CURRICULUM
    * order and a staged training run consumes them sequentially.
    * Extra input columns (e.g. the phase label) ride through to the
    * plan for the shard files and manifest mixes.
    *
    * `bucketSpan` is the prefix sum's two-level bucket width in
    * orderCol UNITS: 64 suits dense doc ids (≈64 docs/bucket); a
    * HASH-valued order key (P30's seeded shuffle) spans [0, 2⁶⁰), so
    * its span must be ~2⁶⁰/nBuckets or the offsets frame degenerates
    * to one bucket per doc (a corpus-sized broadcast).
    */
  def planShards(docs: DataFrame,
                 tokensPerShard: Long = TokensPerShard,
                 orderCol: String = "doc_id",
                 bucketSpan: Long = 64L): DataFrame =
    ScaleOps.prefixSum(withSignals(docs), orderCol, "n_tokens", bucketSpan)
      .withColumn("shard",
        floor((col("cum") - col("n_tokens")).cast("double") / tokensPerShard)
          .cast("long"))
      .drop("cum")

  /** Materialize a [[planShards]] frame as `shard=`-partitioned
    * parquet, one sorted file per shard (each shard's rows
    * hash-route to one task). mode=overwrite makes the re-write
    * idempotent: same corpus ⇒ byte-identical shard files.
    */
  def writeShards(planned: DataFrame, path: String,
                  extraCols: Seq[String] = Nil): Unit =
    planned
      .select(("doc_id" +: "text" +: "source" +: "n_tokens" +: "doc_hash" +:
        extraCols :+ "shard").map(col): _*)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Manifest at shard grain from any frame carrying (keys..., doc_id,
    * text, source): doc-id range, doc and token counts, XOR content
    * hash, and the per-source mix as a deterministic sorted string
    * (`src:count,...`) — harness- and SQL-friendly. Signals are
    * recomputed from the TEXT, never read from stored columns. The
    * default key is P25's global `shard`; J24's streaming emitter
    * passes (batch_id, shard) — shard ids are batch-scoped there.
    */
  def manifestOf(rows: DataFrame,
                 keys: Seq[String] = Seq("shard"),
                 mixCols: Seq[String] = Seq("source")): DataFrame = {
    // partition discovery infers shard=/batch_id= as INT; normalize
    // to LONG so plan-side and file-side manifests agree in schema
    val keyCols = keys.map(k => col(k).cast("long").as(k))
    val carry = (Seq("doc_id", "text", "source") ++ mixCols).distinct
    val sig = withSignals(rows.select(keyCols ++ carry.map(col): _*))
    val mixes = mixCols.map { mc =>
      sig.groupBy(keys.map(col) :+ col(mc): _*)
        .agg(count(lit(1)).as("n"))
        .groupBy(keys.map(col): _*)
        .agg(concat_ws(",",
          array_sort(collect_list(concat(col(mc), lit(":"), col("n")))))
          .as(s"${mc}_mix"))
    }
    mixes.foldLeft(
      sig.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"),
          sum(col("n_tokens")).as("n_tokens"),
          expr("bit_xor(doc_hash)").as("content_hash")))(
      (acc, m) => acc.join(m, keys))
  }

  /** The read-back manifest: recomputed from the files alone. Equal
    * to `manifestOf(planShards(corpus))` iff the round trip was
    * faithful — the p25 oracle's claim.
    */
  def manifestFromFiles(spark: SparkSession, path: String,
                        mixCols: Seq[String] = Seq("source")): DataFrame =
    manifestOf(spark.read.parquet(path), Seq("shard"), mixCols)
}
