package graft

/** H19 pins: interpolated Kneser–Ney bigram LM (D = 0.75).
  *
  * (1) The distribution property Σ_w2 p_KN(w2|w1) = 1 — exact by the
  * algebra ((c1 − D·N1+(w1·))/c1 + D·N1+(w1·)/c1 · Σ p_cont = 1), so
  * any mis-derived count (token vs type, follow vs precede) breaks it.
  * (2) The driver query's avg_nll against an INDEPENDENT plain-Scala
  * reference implementation on real corpus docs.
  */
class KneserNeySpec extends SparkSpecBase {

  private val D = 0.75

  // independent reference: counts from raw texts, maps in plain Scala
  private def tok(t: String): Array[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private case class Counts(c12: Map[(String, String), Long], c1: Map[String, Long],
                            n1p: Map[String, Long], nc: Map[String, Long], nt: Long,
                            vocab: Set[String])

  private def counts(texts: Seq[String]): Counts = {
    val bigrams = texts.flatMap { t =>
      val ws = tok(t)
      if (ws.length < 2) Nil else ws.sliding(2).map(a => (a(0), a(1))).toSeq
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    Counts(c12, c1,
      c12.keys.groupBy(_._1).map { case (k, v) => k -> v.size.toLong },
      c12.keys.groupBy(_._2).map { case (k, v) => k -> v.size.toLong },
      c12.size.toLong, texts.flatMap(tok).toSet)
  }

  private def pKn(c: Counts, w1: String, w2: String): Double = {
    val c12 = c.c12.getOrElse((w1, w2), 0L)
    val seen = if (c12 > 0) (c12.toDouble - D) / c.c1(w1) else 0.0
    seen + (D * c.n1p(w1) / c.c1(w1)) * (c.nc.getOrElse(w2, 0L).toDouble / c.nt)
  }

  test("KN bigram probabilities sum to 1 over the vocabulary per context (H19)") {
    val texts = Seq(
      "the cat sat on the mat",
      "the dog sat on the log",
      "a cat and a dog and a bird",
      "the bird sat on the cat")
    val c = counts(texts)
    for (w1 <- c.c1.keys) {
      val total = c.vocab.toSeq.map(w2 => pKn(c, w1, w2)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"Σ p(·|$w1) = $total")
    }
  }

  test("h19 query matches the independent plain-Scala reference on corpus docs (H19)") {
    import org.apache.spark.sql.Row
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { case Row(id: Long, t: String) => id -> t }.toMap
    val c = counts(docs.values.toSeq)

    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def refAvgNll(t: String): Option[(Long, Double)] = {
      val ws = tok(t)
      if (ws.length < 2) None else {
        val terms = ws.sliding(2).map { a =>
          BigDecimal(q6(-math.log(pKn(c, a(0), a(1))))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.toSeq
        Some((terms.size.toLong, q6((terms.sum.toDouble) / terms.size)))
      }
    }

    val got = SparkEntry.queries("h19_kneser_ney_nll")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val checked = docs.toSeq.sortBy(_._1).take(50).flatMap { case (id, t) =>
      refAvgNll(t).map(exp => (id, exp, got.get(id)))
    }
    assert(checked.nonEmpty)
    checked.foreach { case (id, exp, actual) =>
      assert(actual.contains(exp), s"doc $id: expected $exp got $actual")
    }
  }
}
