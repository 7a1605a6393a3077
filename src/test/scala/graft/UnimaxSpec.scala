package graft

import org.apache.spark.sql.functions._

/** P21: UniMax integer waterfill. The corpus queries exercise the
  * all-capped (sf0.01) and all-uniform (sf1) branches; this spec
  * pins the MIXED branch — small sources capped, the freed budget
  * waterfilled into the rest — against a hand-computed allocation,
  * by driving the same query definition over a crafted corpus.
  */
class UnimaxSpec extends SparkSpecBase {
  import spark.implicits._

  private def runQuery(rows: Seq[(Long, String, String)]): Map[String, (Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("unimax").toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("p21_unimax_budget")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("cap"), r.getAs[Long]("alloc"))).toMap
  }

  test("mixed branch: small sources cap at C epochs, the rest waterfill the freed budget") {
    // B = 1,000,000; C = 3. Sources: tiny (1,000 tokens -> cap 3,000),
    // small (30,000 -> cap 90,000), two big (300,000 -> cap 900,000).
    // Waterfill: sorted caps [3000, 90000, 900000, 900000];
    //   rn=1: t = 1000000 DIV 4 = 250000 > 3000  -> capped
    //   rn=2: t = 997000 DIV 3 = 332333 > 90000  -> capped
    //   rn=3: t = 907000 DIV 2 = 453500 <= 900000 -> LEVEL = 453500
    // alloc = [3000, 90000, 453500, 453500]; total = 1000000 (exact).
    def doc(src: String, id: Long, n: Int) =
      (id, src, (0 until n).map(j => s"t$j").mkString(" "))
    val rows =
      Seq(doc("tiny", 0L, 1000)) ++
        (0 until 30).map(i => doc("small", 100L + i, 1000)) ++
        (0 until 300).map(i => doc("bigA", 1000L + i, 1000)) ++
        (0 until 300).map(i => doc("bigB", 10000L + i, 1000))
    val got = runQuery(rows)
    assert(got("tiny") == (3000L, 3000L))
    assert(got("small") == (90000L, 90000L))
    assert(got("bigA") == (900000L, 453500L))
    assert(got("bigB") == (900000L, 453500L))
    assert(got.values.map(_._2).sum == 1000000L, "budget must be exactly exhausted")
  }

  test("property: allocation matches a reference waterfill on random capacity profiles") {
    // reference: iterative textbook waterfill with the same integer
    // DIV floor — remove capped sources until the uniform level fits
    def refWaterfill(caps: Seq[Long], budget: Long): Map[Int, Long] = {
      var active = caps.indices.toSet
      val alloc = scala.collection.mutable.Map[Int, Long]()
      var remaining = budget
      var changed = true
      while (changed && active.nonEmpty) {
        val level = remaining / active.size
        val newlyCapped = active.filter(i => caps(i) < level)
        changed = newlyCapped.nonEmpty
        newlyCapped.foreach { i =>
          alloc(i) = caps(i); remaining -= caps(i); active -= i
        }
        if (!changed) active.foreach(i => alloc(i) = level)
      }
      if (active.isEmpty && alloc.size < caps.size)
        caps.indices.foreach(i => alloc.getOrElseUpdate(i, caps(i)))
      alloc.toMap
    }
    // the query's closed form: sort ascending, first feasible
    // candidate level wins
    def queryForm(caps: Seq[Long], budget: Long): Map[Int, Long] = {
      val sorted = caps.zipWithIndex.sortBy { case (c, i) => (c, i) }
      val s = caps.size
      var below = 0L
      var level = Option.empty[Long]
      sorted.zipWithIndex.foreach { case ((c, _), pos) =>
        if (level.isEmpty) {
          val t = (budget - below) / (s - pos)
          if (t <= c) level = Some(t)
          below += c
        }
      }
      val lvl = level.getOrElse(caps.max + 1)
      caps.zipWithIndex.map { case (c, i) => i -> math.min(c, lvl) }.toMap
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 200) {
      val n = 2 + rnd.nextInt(8)
      val caps = Seq.fill(n)(1L + rnd.nextInt(10000).toLong)
      val budget = 1L + rnd.nextInt(30000).toLong
      val a = refWaterfill(caps, budget)
      val b = queryForm(caps, budget)
      // identical capped sets; uncapped allocations within the DIV
      // floor slack of each other (both are valid integer waterfills
      // — the query form is ONE deterministic pick, the iterative
      // form another; capped-set equality is the semantic contract)
      val cappedA = a.filter { case (i, v) => v == caps(i) }.keySet
      val cappedB = b.filter { case (i, v) => v == caps(i) }.keySet
      assert(cappedA == cappedB,
        s"trial $trial caps=$caps budget=$budget: capped sets differ $a vs $b")
      // neither over-spends
      assert(a.values.sum <= budget.max(caps.sum.min(budget)) + n)
      assert(b.values.sum <= budget + n || cappedB.size == n)
    }
  }

  test("all-capped branch: budget above total capacity leaves every source at its cap") {
    val rows = (0 until 4).flatMap(s => (0 until 5).map(i =>
      (s * 10L + i, s"s$s", (0 until 100).map(j => s"t$j").mkString(" "))))
    val got = runQuery(rows)
    // 4 sources x 500 tokens -> caps 1500 each; B = 1,000,000 >> 6000
    got.values.foreach { case (cap, alloc) => assert(alloc == cap) }
  }
}
