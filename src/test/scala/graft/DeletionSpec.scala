package graft

import graft.operators.{Deletion, ShardWriter}
import org.apache.spark.sql.functions._

/** P29/B15 specs: targeted deletion with propagation — untouched
  * partitions and shards stay byte-identical on disk; the incremental
  * shard re-pack equals a from-scratch re-plan of the survivors;
  * emptied partitions are dropped, not left as residue.
  */
class DeletionSpec extends SparkSpecBase {
  import spark.implicits._

  /** leaf-dir name -> sorted md5s of its parquet files (recursive one
    * level: works for `k=v` and `k=v/k2=v2` layouts).
    */
  private def leafHashes(path: String): Map[String, Seq[String]] = {
    def walk(d: java.io.File, rel: String): Seq[(String, java.io.File)] =
      d.listFiles().toSeq.flatMap {
        case f if f.isDirectory && f.getName.contains("=") =>
          walk(f, if (rel.isEmpty) f.getName else s"$rel/${f.getName}")
        case f if f.isFile && f.getName.endsWith(".parquet") =>
          Seq(rel -> f)
        case _ => Seq.empty
      }
    walk(new java.io.File(path), "").groupBy(_._1).map { case (rel, fs) =>
      rel -> fs.map { case (_, f) =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
      }.sorted
    }
  }

  private def docsDf = sources.Tables.documents(spark, sf)
    .select("doc_id", "text", "source")

  test("purgeByKeys: zero residue, untouched partitions byte-identical, emptied partition dropped") {
    val out = java.nio.file.Files.createTempDirectory("graft_del_log").toString
    // 4 partitions; partition 3 will be fully emptied
    docsDf.withColumn("batch_id", pmod(col("doc_id"), lit(4L)))
      .write.mode("overwrite").partitionBy("batch_id").parquet(out)
    val before = leafHashes(out)
    assert(before.keySet == Set("batch_id=0", "batch_id=1", "batch_id=2", "batch_id=3"))
    // delete: every doc of partition 3, plus two docs of partition 1
    val ids = docsDf.filter(col("doc_id") % 4 === 3).select("doc_id")
      .as[Long].collect().toSeq ++ Seq(1L, 5L)
    val res = Deletion.purgeByKeys(spark, out, Seq("batch_id"), "doc_id",
      ids.toDF("doc_id"))
    assert(res.dropped.map(_.head.toString) == Seq("3"))
    assert(res.rewritten.map(_.head.toString).sorted == Seq("1"))
    val after = leafHashes(out)
    assert(!after.contains("batch_id=3"), "emptied partition not dropped")
    assert(after("batch_id=0") == before("batch_id=0") &&
      after("batch_id=2") == before("batch_id=2"),
      "untouched partitions were rewritten")
    assert(after("batch_id=1") != before("batch_id=1"))
    val back = spark.read.parquet(out)
    assert(back.join(ids.toDF("doc_id"), Seq("doc_id")).count() == 0,
      "residue rows survived the purge")
    assert(back.count() == docsDf.count() - ids.distinct.size)
    // no-match purge is a no-op
    val noop = Deletion.purgeByKeys(spark, out, Seq("batch_id"), "doc_id",
      Seq(-1L, -2L).toDF("doc_id"))
    assert(noop.touched.isEmpty && leafHashes(out) == after)
  }

  test("purgeByKeys: nested (batch_id, cell) layout rewrites only touched leaves") {
    val out = java.nio.file.Files.createTempDirectory("graft_del_ann").toString
    docsDf.select(col("doc_id"),
        pmod(col("doc_id"), lit(2L)).as("batch_id"),
        pmod(col("doc_id") * 7, lit(3L)).as("cell"))
      .write.mode("overwrite").partitionBy("batch_id", "cell").parquet(out)
    val before = leafHashes(out)
    val res = Deletion.purgeByKeys(spark, out, Seq("batch_id", "cell"),
      "doc_id", Seq(6L).toDF("doc_id")) // 6: batch 0, cell 0
    assert(res.touched.map(t => (t(0).toString, t(1).toString)) ==
      Seq(("0", "0")))
    val after = leafHashes(out)
    assert(after.keySet == before.keySet)
    before.keySet.filterNot(_ == "batch_id=0/cell=0").foreach { k =>
      assert(after(k) == before(k), s"$k rewritten though untouched")
    }
    assert(after("batch_id=0/cell=0") != before("batch_id=0/cell=0"))
    assert(spark.read.parquet(out).filter(col("doc_id") === 6).count() == 0)
  }

  test("deleteFromShardStore: incremental == from-scratch; prefix shards untouched; stale ids pruned") {
    val store = java.nio.file.Files.createTempDirectory("graft_del_sh").toString
    val fresh = java.nio.file.Files.createTempDirectory("graft_del_fresh").toString
    // small budget so the sf0.001 corpus spreads over many shards
    val tps = 512L
    ShardWriter.writeShards(ShardWriter.planShards(docsDf, tps), store)
    val before = leafHashes(store)
    val nShardsBefore = before.size
    assert(nShardsBefore >= 4, s"want several shards, got $nShardsBefore")
    // delete a mid-corpus slice — enough tokens to shift later shard
    // boundaries and shrink the shard count
    val ids = (30L until 40L).toDF("doc_id")
    val (rewritten, stale) =
      Deletion.deleteFromShardStore(spark, store, ids, tps)
    assert(rewritten.nonEmpty)
    val firstAffected = rewritten.min
    assert(firstAffected > 0, "test wants a nonempty untouched prefix")
    val after = leafHashes(store)
    (0L until firstAffected).foreach { id =>
      assert(after(s"shard=$id") == before(s"shard=$id"),
        s"prefix shard $id changed on disk")
    }
    stale.foreach(id => assert(!after.contains(s"shard=$id")))
    assert(after.size == nShardsBefore - stale.size)
    // the strong claim: the incremental store equals a from-scratch
    // re-plan of the surviving corpus, byte-for-byte per shard
    val survivors = docsDf.join(ids, Seq("doc_id"), "left_anti")
    ShardWriter.writeShards(ShardWriter.planShards(survivors, tps), fresh)
    val scratch = leafHashes(fresh)
    assert(after == scratch, "incremental delete != from-scratch re-plan")
    // read-back residue zero
    assert(spark.read.parquet(store).join(ids, Seq("doc_id")).count() == 0)
    // no-match delete is a no-op
    val (r2, s2) = Deletion.deleteFromShardStore(spark, store,
      Seq(-5L).toDF("doc_id"), tps)
    assert(r2.isEmpty && s2.isEmpty && leafHashes(store) == after)
  }

  test("purgeByKeys uniformSchema fast path: identical result to the per-leaf path") {
    def build(dir: String): Unit =
      docsDf.withColumn("batch_id", pmod(col("doc_id"), lit(4L)))
        .write.mode("overwrite").partitionBy("batch_id").parquet(dir)
    val a = java.nio.file.Files.createTempDirectory("graft_del_u1").toString
    val b = java.nio.file.Files.createTempDirectory("graft_del_u2").toString
    build(a); build(b)
    val ids = (docsDf.filter(col("doc_id") % 4 === 3).select("doc_id")
      .as[Long].collect().toSeq ++ Seq(1L, 5L)).toDF("doc_id")
    val ra = Deletion.purgeByKeys(spark, a, Seq("batch_id"), "doc_id", ids)
    val rb = Deletion.purgeByKeys(spark, b, Seq("batch_id"), "doc_id", ids,
      uniformSchema = true)
    assert(ra.touched.map(_.map(_.toString)).sortBy(_.mkString) ==
      rb.touched.map(_.map(_.toString)).sortBy(_.mkString))
    assert(ra.dropped.map(_.map(_.toString)) == rb.dropped.map(_.map(_.toString)))
    val (da, db) = (spark.read.parquet(a), spark.read.parquet(b))
    assert(da.count() == db.count())
    assert(da.unionByName(db).except(da.intersect(db)).count() == 0 ||
      da.except(db).count() + db.except(da).count() == 0,
      "fast path and per-leaf path diverged in surviving rows")
    // untouched partitions stay byte-identical on the fast path too
    assert(!new java.io.File(s"$b/batch_id=3").exists)
  }

  test("resolveByFingerprint: content deletion catches every copy, id-based would not") {
    // two ids share identical content; the request carries ONE
    // fingerprint and both ids must resolve
    val docs = Seq((1L, "alpha beta gamma", "s0"), (2L, "delta epsilon", "s0"),
      (3L, "alpha beta gamma", "s1"), (4L, "zeta eta", "s1"))
      .toDF("doc_id", "text", "source")
    val fps = docs.filter(col("doc_id") === 1)
      .select(graft.functions.HashFunctions.md5prefix64(col("text")).as("fp"))
    val ids = Deletion.resolveByFingerprint(docs, "doc_id", "text", fps)
      .as[Long].collect().toSet
    assert(ids == Set(1L, 3L), s"resolved $ids")
    // propagated: a store purged by the resolved set holds no copy
    val out = java.nio.file.Files.createTempDirectory("graft_del_fp").toString
    docs.withColumn("batch_id", pmod(col("doc_id"), lit(2L)))
      .write.mode("overwrite").partitionBy("batch_id").parquet(out)
    Deletion.purgeByKeys(spark, out, Seq("batch_id"), "doc_id",
      ids.toSeq.toDF("doc_id"))
    val back = spark.read.parquet(out)
    assert(back.filter(col("text") === "alpha beta gamma").count() == 0)
    assert(back.count() == 2)
  }
}
