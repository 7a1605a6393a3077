package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The row-local MinHash signature path: identical signatures to the
  * exploded+aggregated variant, and — because it is a pure map
  * stage — directly usable inside a streaming plan (J9: streaming
  * near-dup screening against a static band index).
  */
class RowLocalMinhashSpec extends SparkSpecBase {
  import spark.implicits._

  test("row-local band signatures equal the exploded-aggregation variant") {
    val docs = Tables.documents(spark, sf)
    val a = Dedup.minhashBands(docs, "doc_id", "text", 4)
      .as[(Long, Int, String)].collect().toSet
    val b = Dedup.minhashBandsRowLocal(docs, "doc_id", "text", 4)
      .as[(Long, Int, String)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("signatures compute statelessly in a stream; a static index screens near-dups (J9)") {
    val docs = Tables.documents(spark, sf).limit(8)
      .select("doc_id", "text").as[(Long, String)].collect()

    // historical index: the first 3 documents' band signatures
    val index = Dedup.minhashBandsRowLocal(
      docs.take(3).toSeq.toDF("doc_id", "text"), "doc_id", "text", 4)
      .select("band", "sig")

    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text")
    // signature extraction + stream-static anti join: both stateless,
    // so the whole screen runs in the microbatch with no state store
    val survivors = Dedup.minhashBandsRowLocal(stream, "doc_id", "text", 4)
      .join(index, Seq("band", "sig"), "left_anti")
    val q = survivors.writeStream.format("memory").queryName("j9_out")
      .outputMode("append").start()
    try {
      input.addData(docs.toSeq: _*)
      q.processAllAvailable()
      val out = spark.table("j9_out").select("doc_id").distinct()
        .as[Long].collect().toSet
      val known = docs.take(3).map(_._1).toSet
      // every known doc's bands all matched the index → fully screened
      assert(out.intersect(known).isEmpty, s"known docs leaked: ${out.intersect(known)}")
      // unseen docs survive (their bands are not in the index)
      assert(out == docs.drop(3).map(_._1).toSet)
    } finally q.stop()
  }
}
