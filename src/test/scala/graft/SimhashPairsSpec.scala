package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** F4b: banded Hamming LSH over SimHash. The load-bearing claim is
  * LOSSLESSNESS: with 4 16-bit bands over the 64-bit fingerprint,
  * any pair within Hamming distance 3 flips bits in at most 3 bands,
  * so it must agree exactly on at least one band (pigeonhole) — the
  * banded candidate join therefore finds EVERY true pair, and the
  * bit_count(xor) verify keeps exactly those. Checked against the
  * brute-force all-pairs answer on a corpus constructed to contain
  * genuine near-duplicates.
  */
class SimhashPairsSpec extends SparkSpecBase {

  test("banded simhash pairs equal brute-force Hamming<=3 pairs (F4b lossless)") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    // 4 docs per base text, each with one mutated token — clusters of
    // near-identical docs whose simhashes sit a few bits apart.
    val docs = (0 until 120).map { i =>
      val base = {
        val r = new scala.util.Random(i / 4)
        Vector.fill(40)(vocab(r.nextInt(vocab.size)))
      }
      val r = new scala.util.Random(1000 + i)
      val mut = base.updated(r.nextInt(base.size), vocab(r.nextInt(vocab.size)))
      (i.toLong, mut.mkString(" "))
    }.toDF("doc_id", "text")

    val got = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet

    val sim = Dedup.simhash64(docs, "doc_id", "text")
    val l = sim.select(col("doc_id").as("a"), col("simhash").as("sa"))
    val r = sim.select(col("doc_id").as("b"), col("simhash").as("sb"))
    val brute = l.crossJoin(r).filter(col("a") < col("b"))
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS INT)"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet

    assert(brute.nonEmpty, "test corpus must contain true near-dup pairs")
    assert(got == brute)
    Dedup.releaseCaches(spark)
  }

  test("simhashPairs rejects a radius the band count cannot cover") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", 4)
    }
  }
}
