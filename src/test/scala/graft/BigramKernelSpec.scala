package graft

import graft.functions.{HashFunctions, HashUtil}
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** K27 — the one-pass per-doc bigram-count kernel behind h16/h19.
  * The contract: byte-equal counts to the HOF spelling it replaced
  * (tokenize → transform(sequence) → explode → count), at
  * (doc, DISTINCT bigram) grain with the multiplicity in `c`.
  */
class BigramKernelSpec extends SparkSpecBase {
  import spark.implicits._

  private def kernelPairs(text: String): Seq[(String, String, Long)] = {
    val arr = HashUtil.bigramCounts(UTF8String.fromString(text))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getLong(2))
    }
  }

  /** Reference: the plain per-occurrence pairing over the suite's
    * tokenizer contract, counted in Scala.
    */
  private def refPairs(text: String): Map[(String, String), Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    toks.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  test("kernel counts equal the per-occurrence reference on edge cases") {
    val cases = Seq(
      "", " ", "one", "a b", "a b a b a", "a a a a",
      "  leading and   trailing  ", "Mixed CASE mixed case MIXED",
      "tab\tand\nnewline separated words", "x y z x y z x y")
    for (t <- cases) {
      val got = kernelPairs(t)
      val ref = refPairs(t)
      assert(got.map(p => (p._1, p._2) -> p._3).toMap == ref, s"text: '$t'")
      // distinct grain: no bigram appears twice in the output
      assert(got.map(p => (p._1, p._2)).distinct.size == got.size, s"text: '$t'")
      // multiplicities sum to the occurrence count
      val occ = math.max(0, t.toLowerCase.split("\\s+").count(_.nonEmpty) - 1)
      assert(got.map(_._3).sum == occ, s"text: '$t'")
    }
  }

  test("kernel frame byte-equals the HOF explode spelling over the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val viaKernel = docs
      .select(col("doc_id"),
        explode_outer(HashFunctions.bigramCounts(col("text"))).as("bg"))
      .filter(col("bg").isNotNull)
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"),
        col("bg.c").as("c"))
    val viaHof = docs
      .withColumn("__ws", TextOps.tokens(col("text")))
      .filter(size(col("__ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(__ws) - 2),
           i -> named_struct('w1', element_at(__ws, i + 1),
                             'w2', element_at(__ws, i + 2)))""")).as("bg"))
      .groupBy(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val a = viaKernel.as[(Long, String, String, Long)].collect().sorted
    val b = viaHof.as[(Long, String, String, Long)].collect().sorted
    assert(a.length == b.length && a.sameElements(b),
      s"kernel ${a.length} rows vs HOF ${b.length}")
  }

  private def kernelTokens(text: String): Seq[(String, Long)] = {
    val arr = HashUtil.tokenCounts(UTF8String.fromString(text))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getLong(1))
    }
  }

  test("K28 token counts equal the per-occurrence reference on edge cases") {
    val cases = Seq(
      "", " ", "one", "a b a", "a a a a",
      "  leading and   trailing  ", "Mixed CASE mixed case MIXED",
      "tab\tand\nnewline separated words")
    for (t <- cases) {
      val got = kernelTokens(t)
      val ref = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      assert(got.toMap == ref, s"text: '$t'")
      assert(got.map(_._1).distinct.size == got.size, s"text: '$t'")
      assert(got.map(_._2).sum ==
        t.toLowerCase.split("\\s+").count(_.nonEmpty), s"text: '$t'")
    }
  }

  test("K28 token frame byte-equals the explode spelling over the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val viaKernel = docs
      .select(col("doc_id"),
        explode_outer(HashFunctions.tokenCounts(col("text"))).as("tc"))
      .filter(col("tc").isNotNull)
      .select(col("doc_id"), col("tc.w").as("w"), col("tc.c").as("c"))
    val viaHof = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val a = viaKernel.as[(Long, String, Long)].collect().sorted
    val b = viaHof.as[(Long, String, Long)].collect().sorted
    assert(a.length == b.length && a.sameElements(b),
      s"kernel ${a.length} rows vs HOF ${b.length}")
  }

  test("first-occurrence output order is deterministic") {
    val t = "b c a b c a b"
    assert(kernelPairs(t) == kernelPairs(t))
    // first occurrences: (b,c), (c,a), (a,b)
    assert(kernelPairs(t).map(p => (p._1, p._2)) ==
      Seq(("b", "c"), ("c", "a"), ("a", "b")))
    assert(kernelPairs(t).map(_._3) == Seq(2L, 2L, 2L))
  }
}
