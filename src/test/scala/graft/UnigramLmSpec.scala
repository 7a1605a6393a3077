package graft

import graft.operators.UnigramLm
import org.apache.spark.sql.functions._

/** H23 specs: the relational unigram-LM pipeline against a
  * plain-Scala reference implementation of the same contract
  * (integer-micro ln scores, tie-inclusive Viterbi usage counts,
  * char-floored M-step, top-N ∪ chars prune) on the battery docs —
  * so the row-local DP spelling can't drift from the algorithm.
  */
class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private val MaxLen = UnigramLm.MaxWordLen
  private val MaxPiece = UnigramLm.MaxPieceLen

  // ---- plain-Scala reference ------------------------------------
  private def refWordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .map(_.take(MaxLen)).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }

  private def lnMicro(num: Long, den: Long): Long =
    math.floor(math.log(num.toDouble / den.toDouble) * 1e6 + 0.5).toLong

  private def slots(w: String): Seq[(Int, Int, String)] =
    for {
      i <- 0 until w.length
      j <- (i + 1) to math.min(i + MaxPiece, w.length)
    } yield (i, j, w.substring(i, j))

  private def refSeed(words: Map[String, Long], cap: Int): Map[String, Long] = {
    val cnt = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, f) =>
      slots(w).foreach { case (_, _, p) => cnt(p) = cnt.getOrElse(p, 0L) + f }
    }
    val top = cnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(cap)
    val kept = (top ++ cnt.toSeq.filter(_._1.length == 1)).distinct.toMap
    val tot = kept.values.sum
    kept.map { case (p, c) => p -> lnMicro(c, tot) }
  }

  /** fwd/bwd DP + tie-inclusive usage under `scores`. */
  private def refUsage(words: Map[String, Long],
      scores: Map[String, Long]): Map[String, Long] = {
    val NegInf = UnigramLm.NegInf
    val usage = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, freq) =>
      val sl = slots(w).filter(s => scores.contains(s._3))
      val f = Array.fill(w.length + 1)(NegInf); f(0) = 0L
      for (j <- 1 to w.length; (i, jj, p) <- sl if jj == j)
        f(j) = math.max(f(j), f(i) + scores(p))
      val g = Array.fill(w.length + 1)(NegInf); g(w.length) = 0L
      for (i <- w.length - 1 to 0 by -1; (ii, j, p) <- sl if ii == i)
        g(i) = math.max(g(i), scores(p) + g(j))
      val best = f(w.length)
      sl.foreach { case (i, j, p) =>
        if (f(i) + scores(p) + g(j) == best)
          usage(p) = usage.getOrElse(p, 0L) + freq
      }
    }
    usage.toMap
  }

  private def refRescore(words: Map[String, Long],
      usage: Map[String, Long]): Map[String, Long] = {
    val chars = words.keySet.flatMap(_.toSeq.map(_.toString))
    val u = usage.filter(_._1.length > 1) ++
      chars.map(c => c -> math.max(usage.getOrElse(c, 0L), 1L))
    val tot = u.values.sum
    u.map { case (p, c) => p -> lnMicro(c, tot) }
  }

  private def refTrain(texts: Seq[String], vocabSize: Int,
      cap: Int): Map[String, Long] = {
    val words = refWordFreqs(texts)
    var scores = refSeed(words, cap)
    for (_ <- 1 to 2) scores = refRescore(words, refUsage(words, scores))
    val chars = words.keySet.flatMap(_.toSeq.map(_.toString))
    val top = scores.toSeq.sortBy { case (p, s) => (-s, p) }.take(vocabSize)
    (top ++ scores.toSeq.filter(kv => chars(kv._1))).distinct.toMap
  }

  test("train matches the plain-Scala reference on battery docs") {
    val texts = sources.Tables.documents(spark, sf)
      .select("text").as[String].collect().toSeq
    val expected = refTrain(texts, vocabSize = 40, cap = 200)
    val got = UnigramLm.train(
        sources.Tables.documents(spark, sf), "text", vocabSize = 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == expected,
      s"diff: extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet} " +
        s"changed=${got.collect { case (k, v) if expected.get(k).exists(_ != v) => k }}")
  }

  test("tokenize: pieces reassemble words; score/count recover from the composed metric") {
    val docs = sources.Tables.documents(spark, sf)
    val vocab = UnigramLm.train(docs, "text", vocabSize = 40)
    val stats = UnigramLm.tokenStats(docs, "doc_id", "text", vocab)
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (nTok, nPieces) = (r.getLong(1), r.getLong(2))
      assert(nTok >= 1 && nPieces >= nTok,
        "a word segments into >= 1 piece each")
      assert(nPieces <= nTok * MaxLen, "piece count bounded by chars")
      assert(r.getLong(3) < 0, "total log-likelihood must be negative")
    }
    // every doc accounted for
    assert(stats.length == docs.count())
  }

  test("viterbi prefers a high-scoring long piece over char spelling") {
    // a controlled vocabulary where "abcd" exists as one piece: the
    // composed metric must pick 1 piece, not 4 chars
    val docs = Seq((1L, "abcd abcd abcd ab cd")).toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 10)
    val pieces = vocab.select("piece").as[String].collect().toSet
    assert(pieces.contains("abcd"))
    val stats = UnigramLm.tokenStats(docs, "doc_id", "text", vocab).head()
    // 5 ws tokens; "abcd" x3 as single pieces, "ab" and "cd" segment
    // into at most 2 pieces each
    assert(stats.getLong(1) == 5)
    assert(stats.getLong(2) <= 3 + 2 + 2)
  }

  test("EM learns shared stems: multi-char pieces for morphological families") {
    // a corpus with real subword structure: two verb stems under
    // four suffixes each — the published unigram-LM behavior is that
    // frequent stems survive EM as multi-char pieces and the
    // tokenizer segments stem+suffix rather than char-spelling
    val text = Seq("playing played player plays",
      "walking walked walker walks").mkString(" ")
    val docs = Seq.tabulate(8)(i => (i.toLong, text)).toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 20)
    val pieces = vocab.select("piece").as[String].collect().toSet
    assert(pieces.contains("play") && pieces.contains("walk"),
      s"stems not learned; vocab=$pieces")
    val st = UnigramLm.tokenStats(docs, "doc_id", "text", vocab).head()
    val (nTok, nPieces) = (st.getLong(1), st.getLong(2))
    assert(nTok == 8)
    // 8 words, 47 chars: stem+suffix segmentation lands well under
    // char spelling (<= 3 pieces per word)
    assert(nPieces <= 24, s"tokenizer char-spelled: $nPieces pieces")
  }
}
