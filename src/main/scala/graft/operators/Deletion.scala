package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** P29 / B15 — targeted deletion with PROPAGATION: remove a keyset of
  * document ids (or content fingerprints resolved to ids upstream)
  * from the primary layout AND every derived artifact, rewriting only
  * what the keyset touches.
  *
  * The reference's storage layer exposes this as mutation DDL
  * (`ALTER TABLE ... DELETE` over MergeTree parts — see the TTL/
  * engine clauses at /root/reference/schema/schema-local.sql:184-186
  * for the part layout the mutations rewrite); the LLM-pipeline need
  * is stronger: a takedown / opt-out / right-to-be-forgotten request
  * must provably vanish from the curated corpus, the dedup band
  * indexes, the ANN serving index, and the emitted training shards —
  * or the pipeline re-trains on data it promised to forget.
  *
  * Design, per store family:
  *
  *  - **Partitioned logs** (day layout B1, `batch_id=` streaming
  *    indexes J11/J14/J16/J26, `batch_id=/cell=` ANN stores J21,
  *    including J23's compacted `batch_id=-1` segment — it is just
  *    another partition value): [[purgeByKeys]]. One column-pruned
  *    scan (key + partition columns only) finds the touched
  *    partition tuples — driver-bounded METADATA, like
  *    `mergeIntoDayLayout`'s day list; one job rewrites ONLY those
  *    partitions (exact tuple predicate → partition pruning) into a
  *    hidden staging subtree; a driver FS loop then swaps each leaf
  *    in (B10's staged-rename discipline) or DROPS it when every row
  *    was deleted (the case dynamic partition overwrite silently
  *    gets wrong: an emptied partition never appears in the output,
  *    so its stale directory would survive as residue). Untouched
  *    partitions are never read past the key column and never
  *    written — at 100 TB a thousand-id takedown rewrites a handful
  *    of directories.
  *
  *  - **Token-budget shard stores** (P25/P26/P30): [[
  *    deleteFromShardStore]]. Packing is a prefix sum in `orderCol`
  *    order, so deleting a doc shifts every LATER doc's cumulative
  *    sum but none before it: shards strictly below the first shard
  *    containing a deleted doc are byte-identical between the
  *    incremental rewrite and a from-scratch re-plan of the
  *    surviving corpus (spec-pinned equality), so only the suffix —
  *    `shard >= firstAffected` — is re-planned (its prefix-sum base
  *    is the recomputed token total of the untouched prefix) and
  *    swapped; stale higher shard ids (the corpus shrank) are
  *    pruned. Cost: one suffix re-pack, not a corpus rewrite.
  *
  * Everything here is keyset-driven and deterministic, so the audit
  * query (`p29_deletion_audit`) can prove zero residue AND exact
  * surviving content (XOR content hash, partition counts, rewritten/
  * dropped partition counts) against a DuckDB oracle computed from
  * the base tables alone.
  */
object Deletion {

  /** What a purge did — driver-bounded partition metadata, returned
    * for audit composition (counts only; the tuples themselves stay
    * available via [[PurgeResult.rewritten]]/[[PurgeResult.dropped]]).
    */
  final case class PurgeResult(
      touched: Seq[Seq[Any]], rewritten: Seq[Seq[Any]],
      dropped: Seq[Seq[Any]]) {
    def nRewritten: Long = rewritten.size.toLong
    def nDropped: Long = dropped.size.toLong
  }

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Crash-window CONVERGENCE (the J23/`StreamIndexCompaction`
    * discipline applied to the purge): every entry point first walks
    * the store and heals any interrupted staged swap, so a rerun
    * after a crash at ANY point converges to the same final state as
    * an uninterrupted run (spec-pinned in `DeletionSpec`). The swap
    * protocol is rename(dst → .old_X); rename(.purge_X/staged → dst);
    * delete .old_X — its one dangerous window is between the two
    * renames, where dst exists ONLY as the hidden `.old_` backup and
    * a naive rerun would neither see the leaf nor re-stage it (the
    * keys are unreachable). Healing rules, in order:
    *
    *   1. `.old_X` with X missing  → restore (rename back): the swap
    *      died mid-window; the backup is the only copy. The
    *      subsequent purge re-discovers and re-stages it.
    *   2. `.old_X` with X present  → delete: the swap completed, only
    *      the backup cleanup was lost.
    *   3. any `.purge_*` leftover  → delete: staging is always
    *      re-derivable from the (restored) store.
    *
    * Rule 1 MUST run before rule 3 — in the mid-window state both
    * `.old_X` and `.purge_X` exist and the backup, not the stage, is
    * authoritative (the stage may be half-written). Single-writer
    * assumption, same as every staged-rename store here: two
    * concurrent purges of one store race their renames.
    */
  private def recoverSwaps(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    val entries =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException => return }
    val dirs = entries.filter(_.isDirectory).toSeq
    dirs.filter(_.getPath.getName.startsWith(".old_")).foreach { st =>
      val dst = new org.apache.hadoop.fs.Path(
        dir, st.getPath.getName.stripPrefix(".old_"))
      if (!fs.exists(dst)) renameOrThrow(fs, st.getPath, dst)
      else fs.delete(st.getPath, true)
    }
    dirs.filter(_.getPath.getName.startsWith(".purge_"))
      .foreach(st => fs.delete(st.getPath, true))
    dirs.filterNot { st =>
      val n = st.getPath.getName
      n.startsWith(".") || n.startsWith("_")
    }.foreach(st => recoverSwaps(fs, st.getPath))
  }

  /** Delete all rows whose `keyCol` appears in `keys` (single-column
    * frame, any name — broadcast: a deletion keyset is request-sized,
    * never corpus-sized) from the partitioned parquet store at
    * `path`, rewriting only partitions that contain a match. Works on
    * any partition depth (`partCols` in layout order). Leaf
    * directories whose every row matched are dropped outright.
    *
    * Each touched leaf is rewritten INDEPENDENTLY, from its own
    * files' schema: streaming stores are legitimately heterogeneous
    * across partitions (J23's consolidated `batch_id=-1` segment
    * carries `src_batch_id`; live batch partitions don't), and a
    * whole-store read-rewrite would either drop the segment's replay
    * watermark column or stamp null columns into live partitions,
    * depending on which file schema inference sampled. Per-leaf, the
    * bytes that survive are exactly the bytes that were there, minus
    * the deleted rows. The touched list is deletion-request-bounded,
    * so the per-leaf job count is too.
    */
  def purgeByKeys(spark: SparkSession, path: String, partCols: Seq[String],
                  keyCol: String, keys: DataFrame,
                  uniformSchema: Boolean = false): PurgeResult = {
    val root0 = new org.apache.hadoop.fs.Path(path)
    val fs0 = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal any interrupted prior purge BEFORE reading: a mid-swap
    // leaf is invisible to the scan and its keys would go undeleted
    recoverSwaps(fs0, root0)
    val store = spark.read.parquet(path)
    val delKeys = broadcast(
      keys.select(keys.columns.head).toDF("__del_key").distinct())
    // touched partitions: column-pruned scan of (key, partition cols)
    val touched = store
      .join(delKeys, col(keyCol) === col("__del_key"))
      .select(partCols.map(col): _*).distinct()
      .collect().map(r => partCols.indices.map(r.get)).toSeq
    if (touched.isEmpty) return PurgeResult(Nil, Nil, Nil)

    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafRel(t: Seq[Any]): String =
      partCols.zip(t).map { case (c, v) => s"$c=$v" }.mkString("/")

    if (uniformSchema) {
      // fast path for single-schema stores (the common case: day
      // layouts, band indexes, ANN cell stores that have never been
      // J23-compacted): ONE job scans exactly the touched leaves
      // (tuple-predicate partition pruning) and writes every
      // surviving leaf into a hidden staging subtree; the driver
      // then swaps leaves in (absent staged leaf = emptied ⇒ drop).
      // Touched-leaf count no longer costs a job each.
      //
      // The predicate is ONE InSet over a composite string key, not
      // an OR of per-tuple AND-chains: at a large takedown (10⁴
      // touched leaves) the OR-tree is a Catalyst expression-tree-
      // size hazard (the K20 lesson — quadratic analyze/canonicalize
      // walls), while `isin` over >10 literals folds to a single
      // InSet node with an O(1) hash probe. The key references only
      // partition columns, so file-source partition pruning still
      // evaluates it against partition VALUES at planning time and
      // scans exactly the touched leaves (plan-pinned in
      // DeletionSpec). String casts match hive-layout directory
      // values (int/long/date all round-trip); partition values are
      // non-null by store construction.
      val sep = "\u0001"
      val touchedKeys = touched.map(_.map(String.valueOf).mkString(sep))
      val pred = concat_ws(sep, partCols.map(c => col(c).cast("string")): _*)
        .isin(touchedKeys: _*)
      val staged = new org.apache.hadoop.fs.Path(root, ".purge_staging")
      fs.delete(staged, true)
      store.filter(pred)
        .join(delKeys, col(keyCol) === col("__del_key"), "left_anti")
        .write.mode("overwrite").partitionBy(partCols: _*)
        .parquet(staged.toString)
      val (rewritten, dropped) = touched.partition(t =>
        fs.exists(new org.apache.hadoop.fs.Path(staged, leafRel(t))))
      rewritten.foreach { t =>
        val rel = leafRel(t)
        val src = new org.apache.hadoop.fs.Path(staged, rel)
        val dst = new org.apache.hadoop.fs.Path(root, rel)
        val old = new org.apache.hadoop.fs.Path(
          dst.getParent, s".old_${dst.getName}")
        fs.delete(old, true)
        if (fs.exists(dst)) renameOrThrow(fs, dst, old)
        fs.mkdirs(dst.getParent)
        renameOrThrow(fs, src, dst)
        fs.delete(old, true)
      }
      dropped.foreach(t =>
        fs.delete(new org.apache.hadoop.fs.Path(root, leafRel(t)), true))
      fs.delete(staged, true)
      return PurgeResult(touched, rewritten, dropped)
    }

    // general path: each touched leaf rewritten INDEPENDENTLY from
    // its own files' schema — required for schema-heterogeneous
    // stores (J23's compacted batch_id=-1 segment carries
    // src_batch_id; live partitions don't)
    val results = touched.map { t =>
      val rel = leafRel(t)
      val dst = new org.apache.hadoop.fs.Path(root, rel)
      val kept = spark.read.parquet(dst.toString)
        .join(delKeys, col(keyCol) === col("__del_key"), "left_anti")
      if (kept.isEmpty) {
        fs.delete(dst, true)
        t -> false
      } else {
        // dot-prefixed staging/backup names: hidden from a concurrent
        // reader's file listing for the instant they exist
        val staged = new org.apache.hadoop.fs.Path(
          dst.getParent, s".purge_${dst.getName}")
        val old = new org.apache.hadoop.fs.Path(
          dst.getParent, s".old_${dst.getName}")
        fs.delete(staged, true); fs.delete(old, true)
        kept.write.mode("overwrite").parquet(staged.toString)
        renameOrThrow(fs, dst, old)
        renameOrThrow(fs, staged, dst)
        fs.delete(old, true)
        t -> true
      }
    }
    PurgeResult(touched,
      results.collect { case (t, true) => t },
      results.collect { case (t, false) => t })
  }

  /** Resolve a CONTENT-fingerprint deletion request to doc ids: a
    * takedown usually arrives as the content (or its hash), not as
    * ids — and content deletion must remove EVERY copy, not one doc.
    * `fps` is a single-column frame of md5prefix64(text) fingerprints
    * (request-sized, broadcast); the corpus joins once on its own
    * text fingerprint — row-local hash, no text ever shuffles — and
    * every matching id comes back, exact duplicates included.
    */
  def resolveByFingerprint(corpus: DataFrame, idCol: String,
                           textCol: String, fps: DataFrame): DataFrame =
    corpus.select(col(idCol),
        graft.functions.HashFunctions.md5prefix64(col(textCol)).as("__fp"))
      .join(broadcast(fps.select(fps.columns.head).toDF("__del_fp")
        .distinct()), col("__fp") === col("__del_fp"))
      .select(col(idCol))

  /** Delete `keys` (doc ids) from a [[ShardWriter]] store, re-packing
    * ONLY the suffix of shards at or after the first shard containing
    * a deleted doc. The suffix's prefix-sum base is the recomputed
    * (from text, never trusted from stored columns) token total of
    * the surviving prefix, so the incremental result is IDENTICAL —
    * byte-for-byte — to `writeShards(planShards(survivors))` from
    * scratch, while shards before the first affected id are never
    * touched on disk (DeletionSpec pins both claims). Returns
    * (rewritten shard ids, pruned stale shard ids).
    *
    * `orderCol`/`bucketSpan` MUST match the `planShards` parameters
    * the store was packed with: the prefix/suffix split is valid
    * precisely because packing is a prefix sum in `orderCol` order
    * (every doc in a shard below `firstAffected` precedes every
    * deleted doc in THAT order). P25 stores use the defaults; a P26
    * curriculum store passes its composed phase key, a P30 shuffled
    * store its seeded hash key and wide span — deleting with the
    * wrong order key would silently re-pack the suffix in the wrong
    * order and break the incremental==from-scratch contract, so the
    * order key rides through the survivors re-plan and the staged
    * re-write.
    */
  def deleteFromShardStore(spark: SparkSession, path: String, keys: DataFrame,
                           tokensPerShard: Long = ShardWriter.TokensPerShard,
                           orderCol: String = "doc_id",
                           bucketSpan: Long = 64L)
      : (Seq[Long], Seq[Long]) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal any interrupted prior delete before reading (same
    // convergence contract as purgeByKeys — see recoverSwaps)
    recoverSwaps(fs, root)
    val store = spark.read.parquet(path)
    require(orderCol == "doc_id" || store.columns.contains(orderCol),
      s"shard store at $path does not carry order column '$orderCol'")
    val delKeys = broadcast(
      keys.select(keys.columns.head).toDF("__del_key").distinct())
    // partition discovery infers `shard=` as INT — cast before getLong
    val hit = store.join(delKeys, col("doc_id") === col("__del_key"))
      .agg(min(col("shard").cast("long"))).head()
    if (hit.isNullAt(0)) return (Nil, Nil)
    val firstAffected = hit.getLong(0)
    val carry =
      (Seq("doc_id", "text", "source") ++
        (if (orderCol == "doc_id") Nil else Seq(orderCol))).distinct
    // prefix token base, recomputed from surviving text (the whole
    // prefix survives: packing is orderCol-ordered, so every doc
    // below the first affected shard precedes every deleted doc in
    // that order)
    val base = ShardWriter.withSignals(
        store.filter(col("shard") < firstAffected)
          .select(carry.map(col): _*))
      .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
    val survivors = store.filter(col("shard") >= firstAffected)
      .join(delKeys, col("doc_id") === col("__del_key"), "left_anti")
      .select(carry.map(col): _*)
    // same arithmetic as planShards with cum shifted by the base —
    // all-long addition, one double cast, so floor() agrees bit-wise
    // with the from-scratch plan
    val planned = ScaleOps.prefixSum(
        ShardWriter.withSignals(survivors), orderCol, "n_tokens", bucketSpan)
      .withColumn("shard",
        floor((lit(base) + col("cum") - col("n_tokens")).cast("double")
          / tokensPerShard).cast("long"))
      .drop("cum")
    val staged = new org.apache.hadoop.fs.Path(root, ".purge_staging")
    fs.delete(staged, true)
    ShardWriter.writeShards(planned, staged.toString,
      extraCols = if (orderCol == "doc_id") Nil else Seq(orderCol))
    val newIds = fs.listStatus(staged).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map(_.getPath.getName.stripPrefix("shard=").toLong).sorted
    val oldIds = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map(_.getPath.getName.stripPrefix("shard=").toLong)
      .filter(_ >= firstAffected)
    newIds.foreach { id =>
      val src = new org.apache.hadoop.fs.Path(staged, s"shard=$id")
      val dst = new org.apache.hadoop.fs.Path(root, s"shard=$id")
      val old = new org.apache.hadoop.fs.Path(root, s".old_shard=$id")
      fs.delete(old, true)
      if (fs.exists(dst)) renameOrThrow(fs, dst, old)
      renameOrThrow(fs, src, dst)
      fs.delete(old, true)
    }
    val stale = oldIds.filterNot(newIds.contains).sorted
    stale.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"shard=$id"), true))
    fs.delete(staged, true)
    (newIds, stale)
  }
}
