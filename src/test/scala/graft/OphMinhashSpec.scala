package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-permutation MinHash (f11): densification fills all k slots,
  * identical docs collide on every band, and an appended-word
  * near-dup — which can perturb at most ONE slot, hence one band —
  * still collides on the remaining bands.
  */
class OphMinhashSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"w$i").mkString(" ")

  test("every doc yields all bands (rotation densification fills empty slots)") {
    // a short doc with very few shingles cannot populate 16 slots
    // sparsely-hashed; densification must still emit 4 complete bands
    val docs = Seq((1L, "a b c d e"), (2L, base)).toDF("doc_id", "text")
    val bands = Dedup.onePermBands(docs, "doc_id", "text", 4)
    val counts = bands.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 4L, 2L -> 4L))
  }

  test("identical docs collide on all bands; unrelated docs on none") {
    val docs = Seq((1L, base), (2L, base),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.onePermLshPairs(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 4L)))
  }

  test("appended-word near-dup perturbs at most one band") {
    val docs = Seq((1L, base), (2L, base + " extra")).toDF("doc_id", "text")
    val pairs = Dedup.onePermLshPairs(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.nonEmpty && pairs.head._3 >= 3L,
      s"expected >= 3 shared bands, got $pairs")
  }

  test("row-local K23 kernel bands are bit-identical to the exploded spelling") {
    val docs = ((1 to 30).map(i => (i.toLong, s"$base tail$i words here")) :+
      (99L, "a b c") :+ (100L, base)).toDF("doc_id", "text")
    val grouped = Dedup.onePermBands(docs, "doc_id", "text", 4)
      .as[(Long, Int, Long)].collect().toSet
    val rowLocal = Dedup.onePermBandsRowLocal(docs, "doc_id", "text", 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(rowLocal == grouped)
  }

  test("OPH finds the near-dup pairs the classic family finds on dup-heavy corpora") {
    // 4 exact-dup clusters of 3 + 8 unrelated docs: both families
    // must produce exactly the within-cluster pairs
    val rows = (0 until 4).flatMap { c =>
      val text = (1 to 30).map(i => s"c${c}w$i").mkString(" ")
      (0 until 3).map(j => (c * 3L + j, text))
    } ++ (0 until 8).map(j =>
      (100L + j, (1 to 30).map(i => s"u${j}x$i").mkString(" ")))
    val docs = rows.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    val classic = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", 4))
    val oph = pairSet(Dedup.onePermLshPairs(docs, "doc_id", "text", 4))
    assert(oph == classic)
    assert(classic.size == 4 * 3)  // 3 pairs per cluster of 3
  }
}
