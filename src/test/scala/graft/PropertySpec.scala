package graft

import graft.operators.{AsOfJoin, Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the distributed operators against trivially-correct
  * driver-side references on randomized inputs (scalacheck Gens,
  * fixed seeds — deterministic, but covering shapes no hand-written
  * example would).
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("connectedComponents equals driver-side union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges
    (1L to 8L).foreach { seed =>
      val edges = sample(edgeGen, seed)
      // driver-side union-find ground truth (component = min member id)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.foreach { case (a, b) => union(a, b) }
      val truth = parent.keys.map(x => x -> find(x)).toMap

      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == truth, s"seed=$seed edges=$edges")
    }
  }

  test("joinAsOf equals a per-row brute-force scan on random series") {
    val gen = for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 25)
      left <- Gen.listOfN(nl, for {
        k <- Gen.choose(0, 3); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      right <- Gen.listOfN(nr, for {
        k <- Gen.choose(0, 3); t <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 999L)
      } yield (k, t, v))
    } yield (left, right)
    (1L to 8L).foreach { seed =>
      val (l, r) = sample(gen, seed)
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = r.zipWithIndex.map { case ((k, t, v), i) => (k, t, v, i.toLong) }
        .toDF("k", "t", "v", "rid")
      val got = AsOfJoin.joinAsOf(left, right, "k", "t", "t", Seq("t", "v"), "rid")
        .select(col("lid"), col("asof_t"), col("asof_v"))
        .collect()
        .map(row => (row.getLong(0),
          if (row.isNullAt(1)) None else Some((row.getLong(1), row.getLong(2)))))
        .toMap
      // brute force: latest right row with rt <= lt; ties on rt broken
      // by the largest tie-break id (matches the operator's contract)
      val expected = l.zipWithIndex.map { case ((k, t), i) =>
        val cands = r.zipWithIndex.filter { case ((rk, rt, _), _) => rk == k && rt <= t }
        i.toLong -> (if (cands.isEmpty) None else {
          val ((_, rt, v), _) = cands.maxBy { case ((_, rt, _), ri) => (rt, ri) }
          Some((rt, v))
        })
      }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("winnowFromGrams equals the naive sliding-window minimum") {
    val gen = Gen.listOf(Gen.choose(0L, 100L))
    (1L to 10L).foreach { seed =>
      val grams = sample(gen, seed)
      val naive =
        if (grams.isEmpty) Seq.empty
        else if (grams.length < 4) Seq(grams.min)
        else grams.sliding(4).map(_.min).toSeq.distinct
      if (grams.nonEmpty) {
        val got = Seq(Tuple1(grams)).toDF("grams")
          .select(TextOps.winnowFromGrams(col("grams"), 4).as("fps"))
          .as[Seq[Long]].collect().head
        assert(got == naive, s"seed=$seed grams=$grams")
        // the native kernel and the composed HOF spelling agree
        val composed = Seq(Tuple1(grams)).toDF("grams")
          .select(TextOps.winnowFromGramsComposed(col("grams"), 4).as("fps"))
          .as[Seq[Long]].collect().head
        assert(got == composed, s"seed=$seed grams=$grams")
      }
    }
  }

  test("native simhash32 kernel equals the composed HOF spelling") {
    import graft.operators.Dedup
    val vocab = Vector("Alpha", "beta", "GAMMA", "delta", "x1", "@@", "", " ",
      "tab\tsep", "ünïcode", "mixedCASE")
    val docs = (0 until 60).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Vector.fill(r.nextInt(25))(vocab(r.nextInt(vocab.size))).mkString(" "))
    } :+ (999L, "")
    val df = docs.toDF("doc_id", "text")
    val native = Dedup.simhash32(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val composed = Dedup.simhash32Composed(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(native == composed)
    assert(native(999L) == 0L)
  }

  test("native simhash64 kernel equals the composed HOF spelling") {
    import graft.operators.Dedup
    val vocab = Vector("Alpha", "beta", "GAMMA", "delta", "x1", "@@", "", " ",
      "tab\tsep", "ünïcode", "mixedCASE")
    val docs = (0 until 60).map { i =>
      val r = new scala.util.Random(7000 + i)
      (i.toLong, Vector.fill(r.nextInt(25))(vocab(r.nextInt(vocab.size))).mkString(" "))
    } :+ (999L, "")
    val df = docs.toDF("doc_id", "text")
    val native = Dedup.simhash64(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val composed = Dedup.simhash64Composed(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(native == composed)
    assert(native(999L) == 0L)
    // the sign bit is reachable: some fingerprint must use bits >= 32
    assert(native.values.exists(v => (v >>> 32) != 0L),
      "64-bit fingerprints should populate the high word")
  }

  test("native vector kernels equal the composed HOF spellings bit for bit") {
    import graft.functions.VectorFunctions._
    // float arrays incl. empties and mixed lengths — the cases where
    // the composed spelling returns null (length mismatch), which the
    // kernels must reproduce exactly. No zero-norm vectors: under
    // ANSI both spellings raise DIVIDE_BY_ZERO on the cosine, which
    // is the contract cosineSim keeps by composing the kernels with
    // a Spark Divide instead of fusing the quotient.
    val r = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val n = i % 7 match { case 0 => 0; case 1 => 64; case _ => 1 + r.nextInt(80) }
      val m = if (i % 11 == 0) n + 1 else n // some length mismatches
      def vec(k: Int) = Seq.fill(k)((r.nextFloat() - 0.5f) * 4f + 0.01f)
      (i.toLong, vec(n), vec(m))
    }.toDF("id", "a", "b")
    def bits(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None
      else Some(java.lang.Double.doubleToLongBits(r.getDouble(i)))
    // folds: all rows, including empties and length mismatches
    val folds = rows.select(
      dot(col("a"), col("b")).as("nd"), dotComposed(col("a"), col("b")).as("cd"),
      normSq(col("a")).as("nn"), normSqComposed(col("a")).as("cn"),
      l2Sq(col("a"), col("b")).as("nl"), l2SqComposed(col("a"), col("b")).as("cl"))
      .collect()
    folds.foreach { row =>
      (0 until 6 by 2).foreach { i =>
        assert(bits(row, i) == bits(row, i + 1), s"col $i: $row")
      }
    }
    assert(folds.exists(_.isNullAt(0)), "no length-mismatch case exercised")
    // cosine: non-empty rows only (an empty array has zero norm, and
    // BOTH spellings raise DIVIDE_BY_ZERO there under ANSI)
    val cosines = rows.filter(size(col("a")) > 0 && size(col("b")) > 0)
      .select(cosineSim(col("a"), col("b")).as("nc"),
        cosineSimComposed(col("a"), col("b")).as("cc"))
      .collect()
    assert(cosines.nonEmpty)
    cosines.foreach { row => assert(bits(row, 0) == bits(row, 1), row.toString) }
  }

  test("RegexRedactStats equals the regexp_count + chained regexp_replace spelling") {
    import graft.functions.HashFunctions
    val eml = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    val tel = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val docs = Seq(
      "plain text, nothing to redact",
      "mail a@b.co and c.d+e@f-g.org twice",
      "ip 10.0.0.1 then 255.255.255.255",
      "call 555-123-4567 or 111-222-3333",
      "overlap: 1.2.3.4@no — 12.34.56.78 near x@y.zz tel 999-888-7777",
      // a phone-shaped string INSIDE an email: sequential semantics
      // redact the email first, so the phone pass must not count it
      // as a replacement — but n_phones counts the ORIGINAL text
      "555-123-4567@mail.com",
      "")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val checked = docs
      .withColumn("rr", HashFunctions.regexRedactStats(col("s"),
        Seq(eml, ip, tel), Seq("<EMAIL>", "<IP>", "<PHONE>")))
      .select(
        element_at(col("rr.counts"), 1).as("ne"), regexp_count(col("s"), lit(eml)).as("ce"),
        element_at(col("rr.counts"), 2).as("ni"), regexp_count(col("s"), lit(ip)).as("ci"),
        element_at(col("rr.counts"), 3).as("np"), regexp_count(col("s"), lit(tel)).as("cp"),
        col("rr.red").as("nr"),
        regexp_replace(regexp_replace(regexp_replace(col("s"),
          eml, "<EMAIL>"), ip, "<IP>"), tel, "<PHONE>").as("cr"))
      .collect()
    checked.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), r.toString)
      assert(r.getInt(2) == r.getInt(3), r.toString)
      assert(r.getInt(4) == r.getInt(5), r.toString)
      assert(r.getString(6) == r.getString(7), r.toString)
    }
  }

  test("RollingGramHashes64 equals the naive per-position Horner hash") {
    import graft.functions.{HashFunctions, HashUtil}
    // reference: O(n·k) recompute of every window from scratch
    def naive(s: String, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray.map(_.toLong)
      def horner(w: Seq[Long]): Long =
        w.foldLeft(0L)((a, c) => (a * HashUtil.RollB + c) % HashUtil.P)
      if (cps.length < k) Seq(horner(cps.toSeq))
      else (0 to cps.length - k).map(i => horner(cps.slice(i, i + k).toSeq))
    }
    val docs = Seq("", "a", "short", "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "ünïcode ünïcode ünïcode", "emoji 😀 pair x y",
      (0 until 300).map(i => ('a' + i % 26).toChar).mkString)
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val got = docs.toDF("id", "s")
      .select(col("id"), HashFunctions.rollingGramHashes64(col("s"), 8).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    docs.foreach { case (id, s) =>
      assert(got(id) == naive(s, 8), s"doc $id: '$s'")
    }
  }

  test("ArgminL2Indexed kernel equals the aggregate-fold spelling") {
    import graft.functions.VectorFunctions
    val r = new scala.util.Random(7)
    // candidate arrays with exact-duplicate entries (tie-break),
    // length mismatches (null distance, skipped) and an empty set
    val rows = (0 until 120).map { i =>
      val dim = 8
      val v = Seq.fill(dim)((r.nextInt(5) - 2).toFloat)
      val k = i % 9 match { case 0 => 0; case n => n }
      val cands = Seq.tabulate(k) { j =>
        if (j % 4 == 3) Seq.fill(dim + 1)(0.0) // mismatched length -> skipped
        else if (j % 4 == 2 && j > 0) Seq.fill(dim)((r.nextInt(5) - 2).toDouble)
        else Seq.fill(dim)((r.nextInt(3) - 1).toDouble) // small range -> real ties
      }
      (i.toLong, v, cands)
    }.toDF("id", "v", "cands")
    // the fold reference must guard the empty case itself: sequence(0,
    // size-1) DESCENDS for size=0 and ANSI element_at then throws —
    // the production folds only ever ran over non-empty literal
    // codebooks, which is also why the kernel defines (-1, +Inf) there
    val folded = rows.withColumn("f", when(size(col("cands")) > 0, aggregate(
        sequence(lit(0), size(col("cands")) - 1),
        struct(lit(-1).as("j"), lit(Double.PositiveInfinity).as("d")),
        (acc, j) => {
          val d = VectorFunctions.l2Sq(col("v"), element_at(col("cands"), j + 1))
          when(d < acc.getField("d"), struct(j.cast("int").as("j"), d.as("d")))
            .otherwise(acc)
        }))
        .otherwise(struct(lit(-1).as("j"), lit(Double.PositiveInfinity).as("d"))))
      .withColumn("n", VectorFunctions.argminL2(col("v"), col("cands")))
      .select(col("f.j"), col("f.d"), col("n.j"), col("n.d"))
      .collect()
    folded.foreach { row =>
      assert(row.getInt(0) == row.getInt(2), row.toString)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(3)), row.toString)
    }
    // the sample must exercise empty (-1) and skipped-candidate cases
    assert(folded.exists(_.getInt(2) == -1))
  }

  test("windowFunnelDepth equals brute-force chain search on random event streams") {
    val types = Seq("s1", "s2", "s3", "s4")
    val gen = for {
      m <- Gen.choose(1, 40)
      evs <- Gen.listOfN(m, for {
        k <- Gen.choose(0L, 4L)
        t <- Gen.choose(0L, 60L)
        ty <- Gen.oneOf(types)
      } yield (k, t, ty))
    } yield evs
    val w = 20L
    (1L to 10L).foreach { seed =>
      val evs = sample(gen, seed)
      // brute force: deepest chain t1 < t2 < ... <= t1 + w over ALL
      // combinations, per key
      val truth = evs.groupBy(_._1).map { case (k, kevs) =>
        def times(ty: String) = kevs.filter(_._3 == ty).map(_._2).sorted
        // all chains reaching step i, as (start, current) time pairs
        var chains = times("s1").map(t => (t, t))
        var depth = if (chains.nonEmpty) 1 else 0
        types.drop(1).foreach { ty =>
          chains = for {
            (t1, tc) <- chains
            tn <- times(ty) if tn > tc && tn <= t1 + w
          } yield (t1, tn)
          if (chains.nonEmpty) depth += 1
        }
        k -> depth
      }.filter(_._2 > 0)
      val got = graft.operators.Funnels.windowFunnelDepth(
          evs.toDF("k", "t", "ty"), "k", "t", "ty", types, w)
        .as[(Long, Int)].collect().toMap
      assert(got == truth, s"seed=$seed evs=$evs")
    }
  }

  test("TokenShingleHashes64 equals the composed tokenize/shingle/hash spelling") {
    val word = Gen.oneOf("alpha", "Beta", "GAMMA", "d", "±x", "1234", "a-b")
    val sep = Gen.oneOf(" ", "  ", "\t", " \n ")
    val gen = for {
      m <- Gen.choose(0, 12)
      ws <- Gen.listOfN(m, word)
      ss <- Gen.listOfN(m + 1, sep)
      lead <- Gen.oneOf("", " ", "\t")
    } yield lead + ws.zip(ss).map { case (w, s) => w + s }.mkString
    (1L to 12L).foreach { seed =>
      val text = sample(gen, seed)
      Seq(1, 3, 5).foreach { n =>
        val df = Seq(Tuple1(text)).toDF("text")
        val kernel = df.select(
            graft.functions.HashFunctions.tokenShingleHashes64(col("text"), n))
          .as[Seq[Long]].collect().head
        val composed = df
          .withColumn("__ws", TextOps.tokens(col("text")))
          .select(array_distinct(
            transform(TextOps.shinglesFromTokens(col("__ws"), n),
              s => graft.functions.HashFunctions.md5prefix64(s))))
          .as[Seq[Long]].collect().head
        assert(kernel == composed, s"seed=$seed n=$n text=[$text]")
      }
    }
  }

  test("bucketed weightedMedian equals the driver-side exact definition") {
    val gen = for {
      m <- Gen.choose(1, 200)
      rows <- Gen.listOfN(m, for {
        g <- Gen.oneOf("a", "b"); v <- Gen.choose(-500, 500)
        w <- Gen.choose(1L, 9L)
      } yield (g, v.toDouble / 4.0, w))
    } yield rows
    (1L to 8L).foreach { seed =>
      val rows = sample(gen, seed)
      // exact definition: smallest value whose cumulative weight (in
      // value order) reaches half the total
      val truth = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.sortBy(_._2)
        val tw = rs.map(_._3).sum
        var cum = 0L
        g -> sorted.collectFirst {
          case (_, v, w) if { cum += w; 2 * cum >= tw } => v
        }.get
      }
      val got = graft.operators.ScaleOps
        .weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w", 50.0)
        .as[(String, Double)].collect().toMap
      assert(got == truth, s"seed=$seed")
    }
  }

  test("kMinPerGroup equals the direct per-group window on random data") {
    val gen = for {
      m <- Gen.choose(1, 300)
      rows <- Gen.listOfN(m, for {
        g <- Gen.oneOf("a", "b", "c"); h <- Gen.choose(0L, 1L << 40)
      } yield (g, h))
    } yield rows.distinct
    (1L to 6L).foreach { seed =>
      val rows = sample(gen, seed)
      val truth = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(_._2).sorted.take(7).zipWithIndex.map { case (h, i) => (g, h, i + 1) }
      }.toSet
      val got = graft.operators.ScaleOps
        .kMinPerGroup(rows.toDF("g", "h"), "g", "h", 7, buckets = 4)
        .select("g", "h", "rn").as[(String, Long, Int)].collect().toSet
      assert(got == truth, s"seed=$seed")
    }
  }

  test("lshQualityReport: counts monotone in min_bands, perfect recall at 1 band on exact dups") {
    // corpus with engineered exact-duplicate pairs: every dup pair has
    // Jaccard 1.0 and identical minhash sigs, so min_bands=1 recall
    // MUST be 1.0; thresholds only shrink the candidate set
    // ids 20..29 are verbatim copies of 0..9; every other doc's words
    // carry a doc-unique suffix, so non-dup pairs share NO shingles
    val docs = (0 until 30).map { i =>
      val src = if (i >= 20) i - 20 else i
      (i.toLong, docsText(src))
    }.toDF("doc_id", "text")
    val rep = Dedup.lshQualityReport(docs, "doc_id", "text", 4, 100, 0.5)
      .orderBy("min_bands").collect()
    assert(rep.nonEmpty)
    val cands = rep.map(_.getAs[Long]("n_candidates"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a >= b },
      "candidate count must be non-increasing in min_bands")
    val first = rep.head
    assert(first.getAs[Long]("n_true") > 0, "engineered dups must exist")
    assert(first.getAs[Double]("recall") == 1.0,
      "exact duplicates share all bands: 1-band recall must be 1.0")
  }

  // doc-unique word suffixes: distinct docs share zero shingles
  private def docsText(i: Int): String =
    Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
      "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
      "oscar", "papa").map(w => s"$w$i").mkString(" ")

  test("prefixSum is exact for order ids above 2^53 (integer bucketing)") {
    // ids in a range where double arithmetic loses integer precision:
    // consecutive ids collapse to the same double, so the old
    // double-division bucketing could mis-bucket boundary rows
    val base = (1L << 60) + 12345L
    val rows = (0 until 200).map(i => (base + i * 3L, (i % 7).toLong))
    val expect = rows.scanLeft(0L)(_ + _._2).tail
    val got = graft.operators.ScaleOps
      .prefixSum(rows.toDF("id", "v"), "id", "v", 16L)
      .orderBy("id").select("cum").as[Long].collect().toSeq
    assert(got == expect)

    // negative ids: floor (not truncate-toward-zero) bucketing keeps
    // the global order correct across the sign boundary
    val rows2 = (-50 until 50).map(i => (i.toLong * 5L, 1L))
    val expect2 = rows2.scanLeft(0L)(_ + _._2).tail
    val got2 = graft.operators.ScaleOps
      .prefixSum(rows2.toDF("id", "v"), "id", "v", 16L)
      .orderBy("id").select("cum").as[Long].collect().toSeq
    assert(got2 == expect2)
  }
}
