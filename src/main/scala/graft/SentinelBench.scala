package graft

import org.apache.spark.sql.SparkSession

/** Round-boundary SENTINEL measurement (r14 verdict item 2).
  *
  * Three consecutive full-battery runs in round 14 sat +13–19 % above
  * round 13 while the single-thread anchor was flat — host-window
  * drift was the credible but UNPROVEN explanation, because nothing
  * was measured at both ends of the round on identical code. This
  * main is that instrument: a FIXED set of ten battery queries (five
  * compute-classified, five shuffle-classified per the r14 `classes`
  * map, spanning the relational/storage/dedup/text/pipeline/
  * timeseries families), run in an isolated JVM at round START and
  * again at round END, min-of-FIVE per query plus the Calibration
  * anchors. The sentinel paths are deliberately chosen from families
  * no round is expected to touch; start≈end ⇒ the round's host window
  * was stable and battery movers need a code explanation; start≠end
  * at flat code ⇒ the window itself moved and battery drift within
  * the sentinel band is host, not code. `tools/bench_diff.py` consumes
  * the pair once `tools/sentinel_merge.py` embeds both JSON lines in
  * the round's BENCH_LOCAL artifact under `"sentinel"`.
  *
  * Methodology matches `Bench`: warm pass at sf0.001 (JIT/codegen not
  * attributed to the first timed query), noop-sink evaluation, same
  * session config. Invoke as
  * `graft.SentinelBench <start|end> [outFile]`.
  */
object SentinelBench {

  /** The fixed sentinel set — NOT derived from the live registry, so
    * a renamed or retired query breaks this list loudly (compile-time
    * string, runtime require) instead of silently shrinking the
    * instrument. Classes as recorded in BENCH_LOCAL_r14.json.
    */
  val Sentinels: Seq[(String, String)] = Seq(
    "p5b_mixing_on_predicted" -> "compute",
    "h18_gopher_repetition" -> "compute",
    "h9_pii_redact" -> "compute",
    "b11_agg_state" -> "compute",
    "e11_rollup" -> "compute",
    "e4_star_join" -> "shuffle",
    "b6_bucketed_join" -> "shuffle",
    "f2_dedup_ngram_jaccard" -> "shuffle",
    "p13_dsir_resampling" -> "shuffle",
    "d14_lttb_downsample" -> "shuffle")

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val when = args.headOption.getOrElse("start")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val missing = Sentinels.map(_._1).filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty,
      s"sentinel queries missing from the registry: ${missing.mkString(", ")}")

    Sentinels.foreach { case (name, _) =>
      run(SparkEntry.queries(name)(spark, warmDir))
    }
    def pass(): Map[String, Double] = Sentinels.map { case (name, _) =>
      val t0 = System.nanoTime()
      run(SparkEntry.queries(name)(spark, sfDir))
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val passes = (1 to 5).map { i =>
      if (i > 1) System.gc()
      pass()
    }
    val anchor = Calibration.measure(spark, cpus.toInt)

    def fmt(v: Double): String = f"$v%.3f"

    // sf1 sentinel (r15 verdict item 7): three of the same fixed
    // queries, min-of-3 at 10× data, so the sf1 ratio table can also
    // separate host drift from code drift — without it only the sf0.1
    // battery had a start/end instrument. Subset, not a new surface:
    // one compute leg and two shuffle legs from `Sentinels`.
    val sf1Sentinels = Seq("h18_gopher_repetition", "e4_star_join",
      "d14_lttb_downsample")
    val sf1Dir = sys.env.get("SPARK_GRAFT_SF1_DIR")
      .orElse(Seq("testdata/sf1", "/root/repo/testdata/sf1")
        .find(d => new java.io.File(s"$d/lineitem.parquet").exists))
      .getOrElse("")
    val sf1Json: String =
      if (sf1Dir.isEmpty || !new java.io.File(s"$sf1Dir/documents.parquet").exists) ""
      else {
        def sf1Pass(): Map[String, Double] = sf1Sentinels.map { name =>
          val t0 = System.nanoTime()
          run(SparkEntry.queries(name)(spark, sf1Dir))
          name -> (System.nanoTime() - t0) / 1e9
        }.toMap
        val sp = (1 to 3).map { i => if (i > 1) System.gc(); sf1Pass() }
        val qs1 = sf1Sentinels.map(n =>
          "\"" + n + "\":" + fmt(sp.map(_(n)).min)).mkString("{", ",", "}")
        val ps1 = sf1Sentinels.map(n =>
          "\"" + n + "\":[" + sp.map(p => fmt(p(n))).mkString(",") + "]")
          .mkString("{", ",", "}")
        s""""sf1":$qs1,"sf1_passes":$ps1,"sf1_dir":"$sf1Dir","""
      }
    val qs = Sentinels.map { case (name, _) =>
      "\"" + name + "\":" + fmt(passes.map(_(name)).min)
    }.mkString("{", ",", "}")
    val passesJson = Sentinels.map { case (name, _) =>
      "\"" + name + "\":[" + passes.map(p => fmt(p(name))).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val classesJson = Sentinels.map { case (name, cls) =>
      "\"" + name + "\":\"" + cls + "\""
    }.mkString("{", ",", "}")
    val json = s"""{"kind":"sentinel","when":"$when","sf":"$sfDir",""" +
      s""""queries":$qs,"passes":$passesJson,"classes":$classesJson,""" +
      sf1Json + s""""anchor":$anchor}"""
    println(json)
    args.drop(1).headOption.foreach { out =>
      val w = new java.io.PrintWriter(new java.io.File(out))
      try w.println(json) finally w.close()
    }
    spark.stop()
  }
}
