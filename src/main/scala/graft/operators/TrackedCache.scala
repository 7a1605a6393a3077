package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-tracked persistence for frames that fan out to several
  * consumers inside one logical query (shingle sets, token explodes,
  * bucket series). Without a persist, every consumer re-executes the
  * shared subplan from the raw scan — the round-1 f2 defect class
  * (measured: 5 corpus scans for one query). Spark's CacheManager
  * keys entries on the canonicalized plan, so identical frames built
  * by different queries (e.g. the token explode shared by h7/h8/p7)
  * resolve to ONE materialization.
  *
  * Every persist registers per session so [[release]] can free the
  * block store between corpora in a long-lived session (round-2
  * ADVICE: unreleased caches accumulate until shutdown). In-flight
  * queries over released frames recompute rather than fail.
  */
object TrackedCache {

  private val persisted =
    new java.util.concurrent.ConcurrentHashMap[
      SparkSession, java.util.Queue[DataFrame]]()

  private val releaseHooks =
    new java.util.concurrent.ConcurrentHashMap[
      SparkSession, java.util.Queue[Runnable]]()

  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted
      .computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
      .add(p)
    p
  }

  /** Run `hook` at the session's next [[release]] — the corpus-epoch
    * boundary. Lets holders of derived session-scoped state (the
    * semanticDedup memo's checkpointed label RDDs) drop it when the
    * caches it rode on are dropped, instead of retaining it to
    * application end (r10 ADVICE).
    */
  def onRelease(spark: SparkSession, hook: Runnable): Unit =
    releaseHooks
      .computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[Runnable]())
      .add(hook)

  /** Unpersist `df` AND drop it from the session's tracked queue —
    * for owners that retire a frame mid-epoch (the semanticDedup
    * memo's cap eviction): a plain unpersist would leave the frame
    * object (and the plan + checkpoint RDD references inside it)
    * strongly held by the queue until the next [[release]].
    */
  def untrack(df: DataFrame): Unit = {
    df.unpersist()
    val q = persisted.get(df.sparkSession)
    if (q != null) q.remove(df)
  }

  /** Unpersist every tracked frame for `spark` and fire its release
    * hooks. Duplicate registrations unpersist harmlessly.
    */
  def release(spark: SparkSession): Unit = {
    val q = persisted.remove(spark)
    if (q != null) q.forEach(_.unpersist())
    val h = releaseHooks.remove(spark)
    if (h != null) h.forEach(_.run())
  }
}
