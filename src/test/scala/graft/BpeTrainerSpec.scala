package graft

import graft.operators.BpeTrainer

class BpeTrainerSpec extends SparkSpecBase {

  private def train(texts: Seq[String], merges: Int) = {
    import spark.implicits._
    BpeTrainer.bpeTrain(texts.toDF("text"), "text", merges)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
  }

  test("merge order follows pair frequency and recurses onto merged symbols") {
    // "aaaa"×5: pairs (a,a)=15 -> merge1 (a,a). Re-segmented " aa aa":
    // (aa,aa)=5 -> merge2 recurses onto the MERGED symbol. Then the
    // now-single-symbol word drops out and (b,b)=2 from "bb" wins.
    val rows = train(Seq.fill(5)("aaaa") ++ Seq.fill(2)("bb"), 3)
    assert(rows.toSeq == Seq(
      (1, "a", "a", "aa", 15L),
      (2, "aa", "aa", "aaaa", 5L),
      (3, "b", "b", "bb", 2L)))
  }

  test("greedy left-to-right application: odd runs leave the tail unmerged") {
    // "aaa": " a a a" -> merge (a,a) applied greedily LTR gives
    // [aa, a], so round 2's top pair is (aa, a).
    val rows = train(Seq.fill(4)("aaa"), 2)
    assert(rows.toSeq == Seq(
      (1, "a", "a", "aa", 8L),
      (2, "aa", "a", "aaa", 4L)))
  }

  test("count ties break lexicographically on (lhs, rhs)") {
    val rows = train(Seq("cd cd ab ab"), 2)
    assert(rows(0)._2 == "a" && rows(0)._3 == "b", rows.mkString(","))
    assert(rows(1)._2 == "c" && rows(1)._3 == "d", rows.mkString(","))
  }

  test("training stops early when no adjacent pairs remain") {
    val rows = train(Seq("ab ab x y z"), 10)
    // one merge exhausts every multi-symbol word ("ab" -> 1 symbol;
    // x/y/z are single chars): exactly 1 merge row, not 10
    assert(rows.length == 1)
    assert(rows(0) == ((1, "a", "b", "ab", 2L)))
  }

  test("apply side: trained merges segment tokens to the expected symbol counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // merges from the first test's corpus, budget 2: (a,a), (aa,aa).
    // "aaaa" -> " aaaa" = 1 symbol; "bb" -> " b b" = 2 (its merge was
    // rank 3, outside the budget); "aaa" -> " aa a" = 2 (greedy LTR);
    // "ab" -> " a b" = 2 (no trained merge applies).
    val docs = (Seq.fill(5)("aaaa") ++ Seq.fill(2)("bb")).toDF("text")
    val merges = graft.operators.BpeTrainer.trainMerges(docs, "text", 2)
    assert(merges == Seq(("a", "a"), ("aa", "aa")))
    val got = Seq("aaaa", "bb", "aaa", "ab").toDF("w")
      .select(col("w"),
        graft.operators.BpeTrainer.bpeSymbolCount(col("w"), merges).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("aaaa" -> 1, "bb" -> 2, "aaa" -> 2, "ab" -> 2))
  }

  test("merges never cross symbol boundaries (no false substring matches)") {
    // vocab: "xa b" as tokens "xa" and "b" never exists as a word —
    // but "xab" does: after merging (x,a), the pair (xa, b) exists;
    // BEFORE that merge, (a,b) inside "xab" is a real char pair.
    // Construct: "xab"×3 and "ab"×2. Round 1: pairs (x,a)=3, (a,b)=5
    // -> merge (a,b) cnt 5. Round 2: "x ab" pairs (x,ab)=3 -> merge.
    val rows = train(Seq.fill(3)("xab") ++ Seq.fill(2)("ab"), 2)
    assert(rows.toSeq == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "x", "ab", "xab", 3L)))
  }
}
