package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** P20: Naive-Bayes log-odds training over hashed buckets + K24
  * serving. The oracle proves cross-engine arithmetic; this spec
  * proves the MODEL does its job — learned weights separate the
  * populations they were fit on — and pins the collect contract.
  */
class ClassifierTrainSpec extends SparkSpecBase {
  import spark.implicits._

  private val good = Vector("insight", "theorem", "analysis", "rigorous",
    "evidence", "method", "precise", "coherent")
  private val junk = Vector("zzz", "clickz", "spamwordz", "lorem",
    "asdfg", "qwerty", "blahz", "fillerz")

  private def corpus = {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 120).map { i =>
      val vocab = if (i % 2 == 0) good else junk
      val src = if (i % 2 == 0) "curated" else "crawl"
      (i.toLong, src, Seq.fill(20)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    rows.toDF("doc_id", "source", "text")
  }

  test("trained weights separate target-like from rest-like documents") {
    val df = corpus
    val w = QualityClassifier.collectWeights(
      QualityClassifier.trainWeights(df, "text", col("source") === "curated", 64))
    val scored = QualityClassifier.applyWeights(df, "doc_id", "text", w)
      .select("doc_id", "label").as[(Long, Boolean)].collect().toMap
    // disjoint vocabularies, NB log-odds: separation must be perfect
    (0 until 120).foreach { i =>
      assert(scored(i.toLong) == (i % 2 == 0),
        s"doc $i (${if (i % 2 == 0) "curated" else "crawl"}) misclassified")
    }
  }

  test("collectWeights is bucket-ordered and complete; unseen buckets carry smoothing-only weight") {
    val df = corpus
    val weights = QualityClassifier.trainWeights(
      df, "text", col("source") === "curated", 64)
    val rows = weights.orderBy("b").collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L))
    // every unseen bucket (0 target, 0 rest tokens) must get the
    // identical smoothing-only log-odds, not be dropped
    val unseen = rows.filter(r => r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(unseen.nonEmpty, "16 distinct words cannot fill 64 buckets")
    assert(unseen.map(_.getLong(3)).distinct.length == 1)
    val v = QualityClassifier.collectWeights(weights)
    assert(v.length == 64)
    assert(v == rows.map(_.getLong(3)).toSeq)
  }

  test("serving path: kernel scores equal the exploded groupBy spelling with trained weights") {
    val df = corpus
    val w = QualityClassifier.collectWeights(
      QualityClassifier.trainWeights(df, "text", col("source") === "curated", 64))
    val viaKernel = QualityClassifier.applyWeights(df, "doc_id", "text", w)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val warr = w.toArray
    val viaExplode = df
      .select(col("doc_id"),
        explode(graft.operators.TextOps.tokens(col("text"))).as("tk"))
      .withColumn("b", pmod(graft.functions.HashFunctions.md5prefix64(col("tk")), lit(64L)))
      .withColumn("wt", element_at(lit(warr), (col("b") + 1).cast("int")))
      .groupBy("doc_id").agg(sum("wt").as("score"))
      .as[(Long, Long)].collect().toMap
    assert(viaKernel == viaExplode)
  }
}
