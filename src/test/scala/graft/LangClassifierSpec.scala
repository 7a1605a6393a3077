package graft

import graft.functions.HashFunctions
import graft.operators.{LangClassifier, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** H20/K29: trained multilingual language-ID. The oracle proves the
  * train→apply arithmetic replays cross-engine; this spec proves
  * (1) the K29 kernel is byte-equal to the composed bucket-array +
  * fold spelling on edge-case docs, (2) the MODEL does its job —
  * held-out accuracy is perfect on the labeled multilingual slice and
  * strictly dominates H3's stopword heuristic there (the claim that
  * justifies replacing the stage), and (3) the collect contract.
  */
class LangClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private def synth = LangClassifier.synthDocs(Tables.documents(spark, sf))

  private lazy val weights = LangClassifier.collectLangWeights(
    LangClassifier.trainLangWeights(
      synth.filter(pmod(col("doc_id"), lit(10)) < 7), "text", "lang"))

  test("K29 kernel scores are byte-equal to the composed bucket-array fold spelling") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""),                       // empty → one whole-text gram
      (3L, "ab"),                     // shorter than n → one clamped gram
      (4L, "  MiXeD   Case\tspaces "),
      (5L, "naïve café über żółć 中文 grüße"), // unicode / astral-adjacent
      (6L, "a"),
      (7L, "und der die das nicht"))
      .toDF("doc_id", "text")
    val kernel = LangClassifier.classify(docs, "doc_id", "text", weights)
      .select("doc_id", "n_grams", "s_de", "s_en", "s_es", "s_fr", "s_zh")

    // composed reference: materialized lowered text → bucket array →
    // one interpreted aggregate fold per language
    val lowered = docs.withColumn("__lt", lower(col("text")))
      .withColumn("__b", LangClassifier.charGramBuckets(col("__lt")))
    val composed = lowered.select(
      Seq(col("doc_id"), size(col("__b")).cast("long").as("n_grams")) ++
        LangClassifier.Langs.zipWithIndex.map { case (l, i) =>
          val wLit = array(weights(i).map(lit): _*)
          aggregate(col("__b"), lit(0L),
            (acc, b) => acc + element_at(wLit, b.cast("int") + 1)).as(s"s_$l")
        }: _*)
    val k = kernel.orderBy("doc_id").collect().map(_.toSeq)
    val c = composed.orderBy("doc_id").collect().map(_.toSeq)
    assert(k.toSeq == c.toSeq)
  }

  test("held-out accuracy is 100% on the labeled multilingual slice") {
    val hold = synth.filter(pmod(col("doc_id"), lit(10)) >= 7)
    val scored = LangClassifier.classify(hold, "doc_id", "text", weights)
      .join(hold.select("doc_id", "lang"), Seq("doc_id"))
    val (n, ok) = (scored.count(),
      scored.filter(col("pred_lang") === col("lang")).count())
    assert(n > 0)
    assert(ok == n, s"trained lang-ID misclassified ${n - ok} of $n held-out docs")
  }

  test("trained classifier strictly dominates the h3 stopword heuristic on the same slice") {
    val hold = synth.filter(pmod(col("doc_id"), lit(10)) >= 7)
    val trainedOk = LangClassifier.classify(hold, "doc_id", "text", weights)
      .join(hold.select("doc_id", "lang"), Seq("doc_id"))
      .filter(col("pred_lang") === col("lang")).count()
    // h3's heuristic on the identical labeled docs (it cannot even
    // express 'zh', and scores stopword ties alphabetically)
    val sc = TextOps.langScores(col("text"))
    val Seq(en, es, de, fr) = sc.map(_._2)
    val h3Ok = hold
      .withColumn("pred", TextOps.langPredict(en, es, de, fr))
      .filter(col("pred") === col("lang")).count()
    val n = hold.count()
    assert(trainedOk > h3Ok,
      s"trained $trainedOk/$n should beat heuristic $h3Ok/$n")
    assert(trainedOk == n)
  }

  test("collectLangWeights is (lang, bucket)-ordered and complete; unseen buckets carry smoothing-only weight") {
    val w = LangClassifier.trainLangWeights(
      synth.filter(pmod(col("doc_id"), lit(10)) < 7), "text", "lang")
    val rows = w.orderBy("lang", "b").collect()
    assert(rows.length == LangClassifier.Langs.length * LangClassifier.Buckets)
    // per language: exactly the 0..255 bucket grid, and at least one
    // unseen bucket whose weight is the smoothing-only value for that
    // language (24-word vocabularies cannot fill 256 trigram buckets)
    LangClassifier.Langs.foreach { l =>
      val lr = rows.filter(_.getString(0) == l)
      assert(lr.map(_.getLong(1)).toSeq == (0L until 256L))
      val unseen = lr.filter(_.getLong(2) == 0L)
      assert(unseen.nonEmpty, s"$l: 24 words cannot fill 256 buckets")
      assert(unseen.map(_.getLong(3)).distinct.length == 1)
    }
    assert(weights.length == LangClassifier.Langs.length)
    assert(weights.forall(_.length == LangClassifier.Buckets))
  }

  test("confusion tiers: light contamination stays on the dominant language, heavy lands on the contaminant") {
    val docs = Tables.documents(spark, sf)
    val hold = LangClassifier.synthDocsMixed(docs)
      .filter(pmod(col("doc_id"), lit(10)) >= 7)
    val scored = LangClassifier.classify(hold, "doc_id", "text", weights)
      .join(hold.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("tier", expr(LangClassifier.tierCase("doc_id")))
      .select("doc_id", "lang", "pred_lang", "tier")
      .as[(Long, String, String, String)].collect()
    val byTier = scored.groupBy(_._4)
    // clean + light (12 dominant vs 0/4 contaminant words): all
    // predictions stay on the dominant (labeled) language
    Seq("clean", "light").foreach { t =>
      val rows = byTier(t)
      assert(rows.nonEmpty && rows.forall(r => r._3 == r._2),
        s"$t tier drifted: ${rows.filter(r => r._3 != r._2).take(3).toSeq}")
    }
    // heavy (6 dominant vs 10 contaminant): the MAJORITY language is
    // the contaminant — a correct char-ngram classifier lands most
    // of these on the NEXT language in Langs order, off-diagonal
    val heavy = byTier("heavy")
    val next = LangClassifier.Langs.zipWithIndex.map { case (l, i) =>
      l -> LangClassifier.Langs((i + 1) % LangClassifier.Langs.length)
    }.toMap
    val onContaminant = heavy.count(r => r._3 == next(r._2))
    assert(heavy.nonEmpty && onContaminant * 3 >= heavy.length * 2,
      s"heavy tier: only $onContaminant/${heavy.length} on the contaminant language")
  }

  test("confusable slice: accuracy is a real (<100%) number at the high rate, degrades monotonically with overlap, and still dominates h3") {
    val docs = Tables.documents(spark, sf)
    // train on each slice's OWN 70% (noisy training — the CCNet
    // setting), evaluate on its held-out 30%; rate 0 = loanword-free
    // but short-doc-tiered, so the chain isolates the OVERLAP effect
    def okOf(ppm: Int): (Long, Long, org.apache.spark.sql.DataFrame) = {
      val slice = LangClassifier.synthDocsConfusable(docs, ppm)
      val w = LangClassifier.collectLangWeights(
        LangClassifier.trainLangWeights(
          slice.filter(pmod(col("doc_id"), lit(10)) < 7), "text", "lang"))
      val hold = slice.filter(pmod(col("doc_id"), lit(10)) >= 7)
      val scored = LangClassifier.classify(
        hold, "doc_id", "text", w, carry = Seq("lang"))
      (scored.count(),
        scored.filter(col("pred_lang") === col("lang")).count(), hold)
    }
    val (n0, ok0, _) = okOf(0)
    val (n15, ok15, _) = okOf(150000)
    val (n40, ok40, hold40) = okOf(400000)
    assert(n0 == n15 && n15 == n40 && n0 > 0) // same doc set each rate
    assert(ok0 >= ok15 && ok15 >= ok40,
      s"accuracy not monotone in overlap: $ok0 >= $ok15 >= $ok40 (n=$n0)")
    assert(ok40 < n40,
      s"40% overlap should yield a sub-100% operating number, got $ok40/$n40")
    assert(ok15 > ok40,
      s"15% vs 40% overlap should be distinguishable: $ok15 vs $ok40")
    // the trained model still beats h3's stopword-hit heuristic on
    // the HARD slice (h3 cannot even express zh, and loanwords score
    // as ties for it)
    val sc = TextOps.langScores(col("text"))
    val Seq(en, es, de, fr) = sc.map(_._2)
    val h3Ok = hold40.withColumn("pred", TextOps.langPredict(en, es, de, fr))
      .filter(col("pred") === col("lang")).count()
    assert(ok40 > h3Ok,
      s"trained $ok40/$n40 should beat heuristic $h3Ok/$n40 on the confusable slice")
  }

  test("argmax preference: ties resolve to the alphabetically earliest language") {
    // craft equal scores by classifying with ALL-ZERO weights: every
    // doc's five scores are 0 → the CASE chain must emit 'de'
    val zero = LangClassifier.Langs.map(_ => Seq.fill(LangClassifier.Buckets)(0L))
    val preds = LangClassifier.classify(
      Seq((1L, "whatever text")).toDF("doc_id", "text"), "doc_id", "text", zero)
      .select("pred_lang").as[String].collect()
    assert(preds.toSeq == Seq("de"))
  }
}
