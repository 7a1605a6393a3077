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

  // ---- byte-level (H12c/H12d) ----

  /** Plain-Scala reference byte-level BPE: same pre-tokenization
    * regex, UTF-8 hex byte symbols, greedy-LTR merge application via
    * java.lang.String.replace (non-overlapping left-to-right — the
    * exact semantics the engine's replace chain relies on).
    */
  private def refTrainBytes(texts: Seq[String],
      merges: Int): Seq[(Int, String, String, String, Long)] = {
    val pat = java.util.regex.Pattern.compile(BpeTrainer.BytePretokenPattern)
    val freqs = scala.collection.mutable.Map[String, Long]()
    texts.foreach { t =>
      val m = pat.matcher(t)
      while (m.find()) freqs(m.group()) = freqs.getOrElse(m.group(), 0L) + 1
    }
    var seqs: Map[String, Long] = freqs.toSeq.map { case (w, f) =>
      (" " + w.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString(" "),
        f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var k = 1
    var done = false
    while (k <= merges && !done) {
      val pairCnt = scala.collection.mutable.Map[(String, String), Long]()
      seqs.foreach { case (s, f) =>
        val ss = s.trim.split(" ")
        (0 until ss.length - 1).foreach { i =>
          pairCnt((ss(i), ss(i + 1))) =
            pairCnt.getOrElse((ss(i), ss(i + 1)), 0L) + f
        }
      }
      if (pairCnt.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairCnt.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((k, a, b, a + b, cnt))
        seqs = seqs.toSeq.map { case (s, f) =>
          s.replace(" " + a + " " + b, " " + a + b) -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        k += 1
      }
    }
    out.toSeq
  }

  private val multibyteCorpus = Seq(
    "héllo héllo wörld", "naïve café café", "日本語 の 日本語",
    "𝄞clef 𝄞clef 𝄞clef plain ascii ascii", "mixed café 𝄞clef")

  test("byte-level train matches a plain-Scala reference on multi-byte UTF-8 incl. astral") {
    import spark.implicits._
    val got = BpeTrainer
      .bpeTrainBytes(multibyteCorpus.toDF("text"), "text", 6)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val want = refTrainBytes(multibyteCorpus, 6)
    assert(got == want, s"\ngot  $got\nwant $want")
    // the corpus genuinely exercised multi-byte symbols: some merge
    // involves a non-ASCII lead byte (c3 of é/ö/ï, e6/e8 of CJK, or
    // f0 of the astral clef)
    assert(got.exists { case (_, l, r, _, _) =>
      (l + r).grouped(2).exists(h =>
        Integer.parseInt(h, 16) >= 0x80) }, s"all-ASCII merges only: $got")
  }

  test("byte-level apply: any string segments, unseen chars fall back to raw byte count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val merges =
      BpeTrainer.trainMergesBytes(multibyteCorpus.toDF("text"), "text", 6)
    // reference segmentation of each pretoken via the same replace chain
    def refCount(tok: String): Int = {
      val seq0 = " " + tok.getBytes("UTF-8")
        .map(b => f"${b & 0xff}%02x").mkString(" ")
      val seqN = merges.foldLeft(seq0) { case (s, (a, b)) =>
        s.replace(" " + a + " " + b, " " + a + b)
      }
      seqN.trim.split(" ").count(_.nonEmpty)
    }
    // "‽" (U+203D) never appears in training: 3 UTF-8 bytes, no merge
    // applies, so it still segments — the 256-symbol-base guarantee
    // h12's char-grain trainer can't give
    val toks = Seq("héllo", "𝄞clef", "café", "‽", "日本語")
    val got = toks.toDF("w")
      .select(col("w"), BpeTrainer.byteSymbolCount(col("w"), merges).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    toks.foreach(t => assert(got(t) == refCount(t), s"token $t"))
    assert(got("‽") == 3)
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
