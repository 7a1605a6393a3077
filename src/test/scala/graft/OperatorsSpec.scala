package graft

import graft.functions.{GeoFunctions, HashFunctions, HashUtil, VectorFunctions}
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Batch-operator specs: every SURVEY §2 group has at least one
  * behavioral check here beyond the DuckDB oracle gate.
  */
class OperatorsSpec extends SparkSpecBase {
  import spark.implicits._

  test("entry returns moving latest positions (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    // one row per user (latest state), all moving
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length == rows.length)
    assert(rows.forall(_.getAs[Double]("value") > 0))
  }

  test("every declared query runs at sf0.001 and column names match its oracle") {
    SparkEntry.allDefs.foreach { d =>
      val df = d.run(spark, sf)
      assert(df.columns.nonEmpty, d.name)
      df.limit(1).collect() // plan executes
    }
    // queries and oracleSql keys line up
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("rows-only queries emit only scalar columns (driver pandas-sort constraint)") {
    // the driver's rows-only harness sorts result rows through pandas,
    // which cannot factorize array/struct/map/binary cells (r9: i7
    // recorded err instead of a row count). Guard ALL no-oracle
    // entries here via the SAME predicate Verify's runtime check uses.
    val oracled = SparkEntry.oracleSql.keySet
    SparkEntry.allDefs.filterNot(d => oracled.contains(d.name)).foreach { d =>
      val bad = SparkEntry.harnessHostileFields(d.run(spark, sf).schema)
      assert(bad.isEmpty,
        s"${d.name} emits harness-hostile columns: " +
          bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    }
  }

  test("latestBy keeps exactly one newest row per key") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "v", "tag")
    val got = CurrentState.latestBy(df, Seq("k"), "v", "tag")
      .orderBy("k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(2))).toSeq == Seq((1L, "b"), (2L, "c")))
  }

  test("latestBy ties break on the tie-break column (deterministic)") {
    val df = Seq((1L, 10L, "a"), (1L, 10L, "z")).toDF("k", "v", "tag")
    val got = CurrentState.latestBy(df, Seq("k"), "v", "tag").collect()
    assert(got.length == 1 && got.head.getString(2) == "z")
  }

  test("parseAltBaro mirrors the reference CASE ('ground'→0, null→-9999)") {
    val df = Seq(Some("ground"), None, Some("37000")).toDF("alt")
    val got = df.select(AdsbNormalize.parseAltBaro(col("alt"))).as[Int].collect()
    assert(got.toSeq == Seq(0, -9999, 37000))
  }

  test("unit conversions truncate like toInt32") {
    val df = Seq(100.9).toDF("v")
    val got = df.select(
      AdsbNormalize.metersToFeet(col("v")),
      AdsbNormalize.msToFpm(col("v"))).collect().head
    assert(got.getInt(0) == (100.9 * 3.28084).toInt)
    assert(got.getInt(1) == (100.9 * 196.85).toInt)
  }

  test("cleanArray drops empties and normalizes case/space") {
    val df = Seq(Seq(" TCAS ", "", "Lnav")).toDF("a")
    val got = df.select(AdsbNormalize.cleanArray(col("a"))).as[Seq[String]].collect().head
    assert(got == Seq("tcas", "lnav"))
  }

  test("withIngestionTime adds an audit timestamp (A10)") {
    val df = AdsbNormalize.withIngestionTime(Seq(1).toDF("x"))
    assert(df.columns.contains("ingestion_time"))
    assert(df.select(col("ingestion_time").isNotNull).as[Boolean].collect().head)
  }

  test("writePartitionedByDay produces day=... directories, pruned reads (B1/B2)") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    CurrentState.writePartitionedByDay(Tables.events(spark, sf), "ts", "user_id", out)
    val days = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(days.nonEmpty && days.forall(_.startsWith("day=")))
    val oneDay = days.head.stripPrefix("day=")
    val pruned = spark.read.parquet(out).filter(col("day") === oneDay)
    // partition filter must prune, not scan-and-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(!plan.contains("PushedFilters: [IsNotNull(day)"))
  }

  test("moduloSample decimates without shuffle (D3 scale path)") {
    val df = CurrentState.moduloSample(Tables.events(spark, sf), 4, "event_id")
    assert(df.queryExecution.executedPlan.toString.indexOf("Exchange") == -1)
    assert(df.count() > 0)
  }

  test("haversine/bearing match known geometry (D4/K2)") {
    // London → Paris ≈ 344 km, bearing ≈ 148°
    val df = Seq((51.5074, -0.1278, 48.8566, 2.3522)).toDF("la1", "lo1", "la2", "lo2")
    val r = df.select(
      GeoFunctions.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")),
      GeoFunctions.bearingDeg(col("la1"), col("lo1"), col("la2"), col("lo2"))).collect().head
    assert(math.abs(r.getDouble(0) - 344) < 2, s"distance ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 148) < 2, s"bearing ${r.getDouble(1)}")
  }

  test("Md5Prefix64 expression equals the SQL conv(md5) formulation (K1)") {
    val df = Tables.documents(spark, sf).select(col("text").as("s"))
    val got = df.select(
      HashFunctions.md5prefix64(col("s")).as("a"),
      expr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)").as("b"))
    assert(got.filter(col("a") =!= col("b")).count() == 0)
    assert(got.count() > 0)
    // codegen actually engaged: the `*(n)` prefix marks WholeStageCodegen
    assert(got.queryExecution.executedPlan.toString.contains("*(1) Project [md5prefix64"))
  }

  test("GramHashes64 equals the composed HOF spelling, including edge shapes (K1b)") {
    val samples = Seq("the quick brown fox jumps over the lazy dog",
      "short", "k", "", "ünïcödé tëxt with àccents", "exactly8",
      "a b c d e f g h i j")
    val df = samples.toDF("s").filter(length(col("s")) > 0)
    val got = df.select(
      HashFunctions.gramHashes64(col("s"), 8).as("native"),
      TextOps.gramHashesFromNorm(col("s"), 8).as("composed"))
    assert(got.filter(col("native") =!= col("composed")).count() == 0)
    assert(got.count() == samples.count(_.nonEmpty))
    // stays inside whole-stage codegen (checked over a real scan — a
    // local relation constant-folds the projection away entirely)
    val scanned = Tables.documents(spark, sf)
      .select(HashFunctions.gramHashes64(col("text"), 8).as("g"))
    assert(scanned.queryExecution.executedPlan.toString
      .contains("*(1) Project [gramhashes64"))
  }

  test("joinAsOfWithin nulls matches older than the tolerance (E18c)") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val left = Seq((1L, "k", ts(100)), (2L, "k", ts(200))).toDF("lid", "k", "t")
    val right = Seq(("k", ts(95), 7.0, 10L), ("k", ts(120), 9.0, 11L))
      .toDF("k", "t", "v", "rid")
    val out = AsOfJoin.joinAsOfWithin(left, right, "k", "t", "t",
        Seq("v"), "rid", tolerance = "30 MINUTES")
      .select("lid", "asof_v").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // lid=1 matches ts(95) (5 min old, fresh); lid=2's nearest
    // preceding is ts(120), 80 min old → nulled
    assert(out == Map(1L -> Some(7.0), 2L -> None))

    // same call with the time column in the payload keeps it, nulled when stale
    val out2 = AsOfJoin.joinAsOfWithin(left, right, "k", "t", "t",
        Seq("t", "v"), "rid", tolerance = "30 MINUTES")
    assert(out2.columns.count(_ == "asof_t") == 1)
    val stale = out2.filter(col("lid") === 2).select("asof_t", "asof_v").collect().head
    assert(stale.isNullAt(0) && stale.isNullAt(1))
  }

  test("HashUtil.affine stays within [0, P)") {
    val h = HashUtil.md5Prefix64(org.apache.spark.unsafe.types.UTF8String.fromString("x"))
    val a = HashUtil.affine(h, 2819L, 261101L)
    assert(a >= 0 && a < HashUtil.P)
  }

  test("operators degrade to empty results on empty inputs, never throw") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    val emptyEvents = Seq.empty[(Long, Long)].toDF("event_id", "v")
    assert(CurrentState.latestBy(emptyDocs, Seq("doc_id"), "text", "doc_id").count() == 0)
    assert(Dedup.connectedComponents(emptyEdges, "a", "b").count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 4, 100).count() == 0)
    assert(Dedup.simhash32(emptyDocs, "doc_id", "text").count() == 0)
    assert(ScaleOps.prefixSum(emptyEvents, "event_id", "v", 10L).count() == 0)
    assert(ScaleOps.saltedCount(emptyEvents, "event_id", 4).count() == 0)
  }

  test("exactDedup keeps min-id per duplicate group (F1)") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(df, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("ngramJaccard flags a true near-duplicate pair (F2)") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "completely different words entirely here now today ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", 4, 100)
      .filter(col("jac") > 0.3).select("a", "b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("minhash LSH buckets a near-duplicate pair together (F3)") {
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, near), (2L, near + " lambda"),
      (3L, "zz yy xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text", 4)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("releaseCaches frees the dedup operators' persisted frames") {
    val df = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta")).toDF("doc_id", "text")
    Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 100).collect()
    Dedup.minhashLshPairs(df, "doc_id", "text", 3).collect()
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before > 0, "dedup queries should have persisted frames")
    Dedup.releaseCaches(spark)
    assert(spark.sparkContext.getPersistentRDDs.size < before,
      "releaseCaches must unpersist the tracked frames")
    // idempotent and safe to call with nothing tracked
    Dedup.releaseCaches(spark)
  }

  test("simhash of identical docs is identical, near docs are close (F4)") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "totally unrelated content words")).toDF("doc_id", "text")
    val m = Dedup.simhash32(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) > 4)
  }

  test("cosine kNN ranks an identical vector first (G1)") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Embeddings.knnBruteForce(emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", 2)
      .filter(col("rank") === 1).select("cid").as[Long].collect()
    assert(top.toSeq == Seq(1L))
  }

  test("lshBucket is deterministic and engine-independent (G2)") {
    val emb = Tables.embeddings(spark, sf).limit(16)
    val b1 = Embeddings.withBucket(emb, "embedding", 8, 64).select("bucket").as[Long].collect()
    val b2 = Embeddings.withBucket(emb, "embedding", 8, 64).select("bucket").as[Long].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("l2Normalize yields unit vectors (G3)") {
    val df = Seq(Array(3.0f, 4.0f)).toDF("v")
    val n = df.select(VectorFunctions.normSq(VectorFunctions.l2Normalize(col("v"))))
      .as[Double].collect().head
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("language-ID prefers the language with most stopword hits (H3)") {
    val df = Seq((1L, "el perro de la casa que ladra los dias"),
      (2L, "the cat of the house and the dog")).toDF("doc_id", "text")
    val scores = TextOps.langScores(col("text"))
    val Seq(en, es, de, fr) = scores.map(_._2)
    val got = df.select(col("doc_id"), TextOps.langPredict(en, es, de, fr).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "es" && got(2L) == "en")
  }

  test("band-probe n_bands is a faithful audit even when both endpoints are probe-side (r11 ADVICE)") {
    // x and y differ in exactly ONE bit (Hamming 1): every one of the
    // 8 bands is within Hamming ≤ 1, so the true matching-band count
    // is 8. With BOTH endpoints in the probe set the pair is found in
    // both probe directions — the pre-fix count(1) read up to 16.
    val x = 0x0123456789abcdefL
    val y = x ^ 1L
    val both = Seq((1L, x), (2L, y)).toDF("id", "phash")
    val pairs = Dedup.hammingBandProbePairs(both, both, "id", "phash",
        minHamming = 0, maxHamming = 10)
      .select("a", "b", "hamming", "n_bands")
      .as[(Long, Long, Int, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1, 8L)), pairs.toSeq.toString)
    // a pair whose bands differ by one bit in TWO bands: 8 distinct
    // bands still match (each differing band matches via its flip),
    // and the count must not inflate with probe direction either
    val z = x ^ 1L ^ (1L << 9) // bits in band 0 and band 1
    val two = Seq((1L, x), (3L, z)).toDF("id", "phash")
    val p2 = Dedup.hammingBandProbePairs(two, two, "id", "phash",
        minHamming = 0, maxHamming = 10)
      .select("a", "b", "hamming", "n_bands")
      .as[(Long, Long, Int, Long)].collect()
    assert(p2.toSeq == Seq((1L, 3L, 2, 8L)), p2.toSeq.toString)
  }

  test("CMS sizing: estimates never undercount at any width, and measured error shrinks with width (E25d)") {
    import graft.functions.CmsUtil
    // zipf-ish deterministic stream: key k occurs ~N/k times
    val keys = (1 to 400).flatMap(k =>
      Seq.fill(4000 / k)(HashUtil.md5Prefix64(s"cms,$k")))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val errSums = Seq(64, 256, 1024).map { w =>
      val m = new Array[Long](4 * w)
      keys.foreach(CmsUtil.add(m, 4, w, _))
      val errs = truth.map { case (k, c) =>
        val est = CmsUtil.estimate(m, 4, w, k)
        assert(est >= c, s"width $w undercounted: $est < $c") // the guarantee
        est - c
      }
      errs.sum
    }
    // collisions thin sharply as width quadruples on the fixed
    // stream (measured: 47530 → 3144 → 68 — a residual all-4-row
    // collision survives even at 1024 cells, which is exactly why
    // the instrument MEASURES instead of assuming exactness)
    assert(errSums(0) > errSums(1) * 4 && errSums(1) > errSums(2),
      errSums.toString)
  }

  test("audio fingerprint stays inside the operating radius across gains (I10)") {
    // energy RATIOS are exactly gain-invariant; integer sample
    // truncation adds ~1-LSB noise, so a band with NO on-windows
    // (all-leakage energies, near-tie bits) can flip a few bits —
    // the honest property is the operator's radius, not equality
    (3L until 9L).foreach { seed =>
      val wav = MediaCodec.synthWavMelody(seed, 8000, 160)
      val fp = MediaCodec.audioFingerprint64(wav).get
      Seq((1, 2), (1, 4), (3, 4), (2, 3)).foreach { case (num, den) =>
        val scaled = MediaCodec.scaleWavGain(wav, num, den).get
        val h = java.lang.Long.bitCount(
          MediaCodec.audioFingerprint64(scaled).get ^ fp)
        assert(h <= 7, s"seed $seed gain $num/$den drifted $h bits")
      }
    }
  }
}
