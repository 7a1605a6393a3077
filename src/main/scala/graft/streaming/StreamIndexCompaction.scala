package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** J23 — background merge for the `batch_id=`-partitioned streaming
  * screen/state indexes (the B9/MergeTree treatment applied to the
  * streaming sinks' layouts; reference analogue: the background part
  * merges the Kafka-MV tables rely on,
  * /root/reference/schema/schema-local.sql:183-187).
  *
  * Every streaming screen/state sink (J10/J11/J14/J16/J17/J20/J21)
  * appends one `batch_id=<id>` partition per microbatch, forever —
  * at production cadence that is thousands of tiny partitions per
  * day, and both the partition listing and the screen join degrade
  * with batch COUNT (the classic streaming small-file killer).
  * [[compactIndex]] rewrites CLOSED batch partitions into one
  * consolidated segment under the sentinel partition
  * `batch_id=-1` — a value no real microbatch ever owns (Spark batch
  * ids start at 0) — so every existing reader keeps working
  * unchanged: the screens' `batch_id != current` history filter
  * always admits the segment, and the merge-on-read aggregations
  * (J10/J20) see exactly one copy of every folded row.
  *
  * REPLAY CONTRACT (what makes compaction safe under the sinks'
  * dynamic-partition-overwrite idempotence):
  *
  *  - Only batches ≤ max(batch_id) − `keepRecent` are folded. Spark
  *    replays at most the trailing uncommitted microbatch after a
  *    failure, so any `keepRecent` ≥ 1 keeps every replayable batch's
  *    own partition intact for its overwrite; the default 2 adds a
  *    margin.
  *  - Defense in depth for a batch that WAS folded: compaction
  *    maintains a `_compacted_through` watermark (written atomically
  *    via temp+rename) that the sink helpers read; a replayed
  *    batch_id at or below it NOOPS — its outputs are already durable
  *    in the segment, and skipping also keeps the replay from
  *    screening against its own first-attempt rows (which carry the
  *    sentinel id, invisible to the `!= current` filter).
  *
  * CRASH SAFETY (the B10 staged-write + rename-swap discipline, made
  * IDEMPOTENT): the segment itself records provenance — every folded
  * row carries `src_batch_id`, set to the fold's high-water batch id —
  * and folds are CONTIGUOUS (everything ≤ cutoff not already folded),
  * so `max(src_batch_id)` read from the segment is the truth for
  * what is already folded, independent of the marker file. A rerun
  * after any crash point converges: batch dirs whose id ≤ that max
  * are deleted WITHOUT refolding (they are swap leftovers whose rows
  * the segment already holds); a staged dir is discarded and the
  * fold redone; a segment caught mid-swap (renamed to the backup
  * name but not replaced) is restored from the backup.
  *
  * The optional `merge` hook is the MergeTree "merge" half: agg-state
  * indexes (J10/J20/J22) shrink their segment to one row per
  * (group, cell/key) by re-aggregating the mergeable states —
  * byte-identical read-out, since merge-on-read is the same
  * commutative addition. Screens pass identity (their rows are
  * already one per surviving doc-band/hash).
  *
  * Scale shape: one fold reads O(closed batches) once and writes
  * O(distinct state/index rows) into `nFiles` files; after it, the
  * screens' history read is one segment + `keepRecent` small
  * partitions regardless of stream age. Run it as a periodic
  * maintenance job, like B9.
  */
object StreamIndexCompaction {

  /** Sentinel partition id for the consolidated segment: real Spark
    * microbatch ids are ≥ 0, so the screens' `batch_id != current`
    * filter can never exclude the segment.
    */
  val CompactedBatchId: Long = -1L

  private val MarkerName = "_compacted_through"

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The replay noop-guard watermark: the highest batch id folded
    * into `path`'s compacted segment, −1 if never compacted. Reads
    * one tiny marker file — no data scan — so the sink helpers can
    * afford it once per microbatch.
    */
  def compactedThrough(spark: SparkSession, path: String): Long = {
    val marker = new org.apache.hadoop.fs.Path(path, MarkerName)
    val fs = fsOf(spark, marker)
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path, through: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(root, s".$MarkerName.tmp")
    val marker = new org.apache.hadoop.fs.Path(root, MarkerName)
    val out = fs.create(tmp, true)
    try out.write(through.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(marker, false)
    if (!fs.rename(tmp, marker))
      throw new java.io.IOException(s"rename failed: $tmp -> $marker")
  }

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            src: org.apache.hadoop.fs.Path,
                            dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Compact `path`'s closed `batch_id=` partitions into the
    * consolidated `batch_id=-1` segment. Returns the new
    * compacted-through watermark (None when there was nothing to do).
    * Idempotent and crash-recoverable — see the object scaladoc for
    * the contract. `merge` re-aggregates the unioned segment rows
    * (identity for screens; the state-merging aggregation for
    * J10/J20/J22-style agg-state indexes); `nFiles` sizes the segment
    * layout; `subPartitionBy` preserves secondary partition columns
    * (J21's `cell=` — the serving scan's partition-prune must survive
    * compaction).
    */
  def compactIndex(spark: SparkSession, path: String, keepRecent: Int = 2,
                   merge: DataFrame => DataFrame = identity,
                   nFiles: Int = 1,
                   subPartitionBy: Seq[String] = Nil): Option[Long] = {
    require(keepRecent >= 1,
      "keepRecent must cover the streaming replay horizon (>= 1)")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return None

    val segDir = new org.apache.hadoop.fs.Path(root, s"batch_id=$CompactedBatchId")
    val oldDir = new org.apache.hadoop.fs.Path(root, ".old_compacted")
    val staged = new org.apache.hadoop.fs.Path(root, ".staged_compacted")

    // recover from a crashed prior swap: a segment renamed away but
    // never replaced is restored from its backup; a completed swap's
    // backup and any stale staging are discarded
    if (!fs.exists(segDir) && fs.exists(oldDir)) renameOrThrow(fs, oldDir, segDir)
    fs.delete(oldDir, true)
    fs.delete(staged, true)

    // partition METADATA only (dir names), never data, at the driver
    val ids = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.drop("batch_id=".length).toLong)
      .filter(_ >= 0)
      .sorted
    if (ids.isEmpty) return None
    val cutoff = ids.max - keepRecent
    val eligible = ids.filter(_ <= cutoff)
    if (eligible.isEmpty) return None

    // the segment is the truth for what is already folded (contiguous
    // folds => max(src_batch_id) determines the folded set); dirs at
    // or below it are crash leftovers — delete, never refold
    val priorMax =
      if (fs.exists(segDir))
        spark.read.parquet(segDir.toString)
          .agg(max(col("src_batch_id"))).head().getLong(0)
      else -1L
    val (leftovers, toFold) = eligible.partition(_ <= priorMax)
    leftovers.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"batch_id=$id"), true)
    }
    if (toFold.isEmpty) {
      if (priorMax >= 0 && priorMax > compactedThrough(spark, path))
        writeMarker(fs, root, priorMax)
      return if (leftovers.isEmpty) None else Some(priorMax)
    }
    val newMax = toFold.max

    val foldDirs = toFold.map(id => s"$path/batch_id=$id")
    val newRows = spark.read.option("basePath", path)
      .parquet(foldDirs: _*)
      .drop("batch_id")
    val unioned =
      if (fs.exists(segDir))
        spark.read.parquet(segDir.toString).drop("src_batch_id")
          .unionByName(newRows)
      else newRows
    val writer = merge(unioned)
      .withColumn("src_batch_id", lit(newMax))
      .coalesce(nFiles)
      .write.mode("overwrite")
    (if (subPartitionBy.nonEmpty) writer.partitionBy(subPartitionBy: _*) else writer)
      .parquet(staged.toString)

    if (fs.exists(segDir)) renameOrThrow(fs, segDir, oldDir)
    renameOrThrow(fs, staged, segDir)
    toFold.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"batch_id=$id"), true)
    }
    fs.delete(oldDir, true)
    writeMarker(fs, root, newMax)
    Some(newMax)
  }

  /** The J10 agg-state merge hook: collapse the segment to one row
    * per (day, key) by summing the mergeable partial states — the
    * same addition [[AdsbStream.readAggState]] performs on read, so
    * read-out is unchanged while the segment shrinks from
    * O(batches × keys) to O(keys).
    */
  def mergeAggState(keyCol: String)(seg: DataFrame): DataFrame =
    seg.groupBy(col("day"), col(keyCol))
      .agg(sum(col("cnt_state")).as("cnt_state"),
        sum(col("sum_state")).cast("decimal(18,2)").as("sum_state"),
        min(col("min_ts_state")).as("min_ts_state"),
        max(col("max_state")).as("max_state"))

  /** The J20 quantile-sketch merge hook: counter addition per
    * (group, cell) — [[AdsbStream.readQuantileState]]'s own merge,
    * applied once at rest.
    */
  def mergeQuantileState(groupCol: String)(seg: DataFrame): DataFrame =
    seg.groupBy(col(groupCol), col("cell")).agg(sum(col("c")).as("c"))

  /** The J25 token-state merge hook: counter addition per
    * (slice, token) — [[AdsbStream.readDriftReport]]'s own read-time
    * merge applied once at rest, shrinking the log from
    * O(batches × vocab) to one row per (slice, token).
    */
  def mergeTokenState(sliceCol: String)(seg: DataFrame): DataFrame =
    seg.groupBy(col(sliceCol), col("w")).agg(sum(col("c_s")).as("c_s"))

  /** The J26 label-log merge hook: MIN per doc — exactly the
    * resolution [[AdsbStream.readNearDupLabels]] performs on read
    * (minus its label self-row synthesis, which stays a read-time
    * concern: the segment must keep only rows the log actually
    * asserted, so folding is lossless for every future
    * reconciliation membership scan). Min commutes and is
    * idempotent, so any fold boundary yields the same read-out; the
    * segment shrinks from O(batches × relabels) to one row per
    * paired doc.
    */
  def mergeMinLabel(idCol: String)(seg: DataFrame): DataFrame =
    seg.groupBy(col(idCol)).agg(min(col("label")).as("label"))
}
