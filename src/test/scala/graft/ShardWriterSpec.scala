package graft

import graft.operators.ShardWriter
import org.apache.spark.sql.functions._

/** P25 specs: deterministic shard materialization with a
  * read-back-verifiable manifest.
  */
class ShardWriterSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDf = sources.Tables.documents(spark, sf)
    .select("doc_id", "text", "source")

  private def fileHashes(path: String): Map[String, Seq[String]] = {
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map { d =>
        val hs = d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
          .map { f =>
            val bytes = java.nio.file.Files.readAllBytes(f.toPath)
            java.security.MessageDigest.getInstance("MD5").digest(bytes)
              .map("%02x".format(_)).mkString
          }.sorted
        d.getName -> hs
      }.toMap
  }

  test("re-write of the same corpus is byte-identical per shard") {
    val out1 = java.nio.file.Files.createTempDirectory("graft_p25a").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_p25b").toString
    val planned = ShardWriter.planShards(docsDf)
    ShardWriter.writeShards(planned, out1)
    ShardWriter.writeShards(planned, out2)
    val (h1, h2) = (fileHashes(out1), fileHashes(out2))
    assert(h1.nonEmpty && h1.keySet == h2.keySet)
    h1.foreach { case (shard, hs) =>
      assert(hs == h2(shard), s"$shard bytes differ between identical writes")
    }
    // idempotent overwrite of the SAME path too
    ShardWriter.writeShards(planned, out1)
    assert(fileHashes(out1) == h1, "overwrite changed the bytes")
  }

  test("read-back manifest equals the planned manifest; ranges partition doc-id space; totals conserve") {
    val out = java.nio.file.Files.createTempDirectory("graft_p25m").toString
    val planned = ShardWriter.planShards(docsDf)
    ShardWriter.writeShards(planned, out)
    val fromPlan = ShardWriter.manifestOf(planned)
    val fromFiles = ShardWriter.manifestFromFiles(spark, out)
    assert(fromFiles.exceptAll(fromPlan).isEmpty &&
      fromPlan.exceptAll(fromFiles).isEmpty,
      "read-back manifest diverged from the plan")
    val rows = fromFiles.orderBy("shard").collect()
    assert(rows.length > 1, "expect multiple shards at this SF")
    // doc-id ranges are contiguous, non-overlapping, in shard order
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_doc_id") < b.getAs[Long]("min_doc_id"),
        s"shard ranges overlap: $a vs $b")
    }
    // token + doc totals conserve across the split
    val totTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val totDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val direct = docsDf.agg(
      sum(graft.operators.TextOps.bpeTokenCount(col("text")).cast("long")),
      count(lit(1))).head()
    assert(totTokens == direct.getLong(0) && totDocs == direct.getLong(1))
    // bin rule: a doc goes to the bin its START offset falls in, so a
    // shard's token mass can only exceed the budget by its LAST doc's
    // overhang — tokens minus the last doc must be under the budget
    val lastTok = planned.groupBy("shard")
      .agg(max_by(col("n_tokens"), col("doc_id")).as("last_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val sh = r.getAs[Long]("shard")
      assert(r.getAs[Long]("n_tokens") - lastTok(sh) < ShardWriter.TokensPerShard,
        s"shard $sh exceeds the bin rule")
    }
  }

  test("p26 curriculum packing: re-writes byte-identical, phases contiguous across the shard sequence") {
    // a synthetic 3-phase corpus with deterministic token lengths:
    // packing on the composed (phase, doc_id) key must emit shards
    // whose phase sequence never goes backwards — shard i's max
    // phase ≤ shard i+1's min phase (boundary shards may straddle)
    val docs = (0L until 120L).map { i =>
      val phase = (i % 3 + 1).toInt // deliberately NOT doc_id-ordered
      (i, Seq.fill(40 + (i % 7).toInt)("tok").mkString(" "), s"src${i % 4}", phase)
    }.toDF("doc_id", "text", "source", "phase")
      .withColumn("okey",
        col("phase").cast("long") * lit(1000000000000000L) + col("doc_id"))
    val planned = ShardWriter.planShards(docs, 512L, orderCol = "okey")
    val out1 = java.nio.file.Files.createTempDirectory("graft_p26a").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_p26b").toString
    ShardWriter.writeShards(planned, out1, extraCols = Seq("phase"))
    ShardWriter.writeShards(planned, out2, extraCols = Seq("phase"))
    val (h1, h2) = (fileHashes(out1), fileHashes(out2))
    assert(h1.nonEmpty && h1 == h2, "curriculum re-write not byte-identical")
    // phases contiguous across the shard sequence
    // partition discovery infers shard= as INT; normalize to LONG
    val span = spark.read.parquet(out1)
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard").agg(min("phase").as("pmin"), max("phase").as("pmax"))
      .orderBy("shard").collect()
    assert(span.length > 3, "expect several shards")
    span.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Int]("pmax") <= b.getAs[Int]("pmin"),
        s"phase order broke between shards: $a -> $b")
    }
    // every phase-1 doc packs before every phase-3 doc
    val firstP3 = span.collectFirst {
      case r if r.getAs[Int]("pmin") == 3 => r.getAs[Long]("shard") }.get
    val lastP1 = span.reverse.collectFirst {
      case r if r.getAs[Int]("pmax") == 1 => r.getAs[Long]("shard") }.get
    assert(lastP1 <= firstP3)
    // the manifest's phase mix accounts for every doc
    val mix = ShardWriter.manifestFromFiles(spark, out1,
      mixCols = Seq("source", "phase")).collect()
    val mixDocs = mix.map(_.getAs[String]("phase_mix")).map(
      _.split(",").map(_.split(":")(1).toLong).sum).sum
    assert(mixDocs == 120L)
  }

  test("a tampered shard hash-mismatches the planned manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_p25t").toString
    val planned = ShardWriter.planShards(docsDf)
    ShardWriter.writeShards(planned, out)
    // corrupt one doc's text in shard 0: stage the tampered rewrite
    // elsewhere, then swap it in (an in-place overwrite would lazily
    // read the files it is deleting)
    val staged = s"$out/.tamper"
    val s0 = spark.read.parquet(s"$out/shard=0")
    val firstId = s0.agg(min("doc_id")).head().getLong(0)
    s0.withColumn("text",
        when(col("doc_id") === firstId, lit("tampered")).otherwise(col("text")))
      .write.mode("overwrite").parquet(staged)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/shard=0"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(staged),
      new org.apache.hadoop.fs.Path(s"$out/shard=0")))
    val fromPlan = ShardWriter.manifestOf(planned)
    val fromFiles = ShardWriter.manifestFromFiles(spark, out)
    val diff = fromFiles.exceptAll(fromPlan).collect()
    assert(diff.length == 1 && diff.head.getAs[Long]("shard") == 0L,
      "tampering must surface as exactly the touched shard mismatching")
  }

  test("p30 seeded shuffle: same seed byte-identical; different seed reorders but conserves content") {
    def planFor(seed: String) = ShardWriter.planShards(
      docsDf.withColumn("okey", graft.functions.HashFunctions.md5prefix64(
        concat(lit(seed + ":"), col("doc_id").cast("string")))),
      512L, orderCol = "okey", bucketSpan = 1L << 50)
    val (a1, a2, b) = (
      java.nio.file.Files.createTempDirectory("graft_p30a").toString,
      java.nio.file.Files.createTempDirectory("graft_p30a2").toString,
      java.nio.file.Files.createTempDirectory("graft_p30b").toString)
    ShardWriter.writeShards(planFor("s42"), a1)
    ShardWriter.writeShards(planFor("s42"), a2)
    ShardWriter.writeShards(planFor("s43"), b)
    val (ha, ha2, hb) = (fileHashes(a1), fileHashes(a2), fileHashes(b))
    assert(ha.nonEmpty && ha == ha2, "same seed not byte-identical")
    assert(ha != hb, "different seed produced identical shards")
    // conservation: totals and the XOR-union of content hashes agree
    def totals(path: String): (Long, Long, Long) = {
      val m = ShardWriter.manifestFromFiles(spark, path)
        .agg(sum("n_docs"), sum("n_tokens"),
          org.apache.spark.sql.functions.expr("bit_xor(content_hash)"))
        .head()
      (m.getLong(0), m.getLong(1), m.getLong(2))
    }
    assert(totals(a1) == totals(b),
      "different seed changed the corpus content totals")
    // the permutation is real: per-shard doc-id ranges differ
    val ra = ShardWriter.manifestFromFiles(spark, a1)
      .select("shard", "min_doc_id", "max_doc_id").collect().toSeq.map(_.toString).sorted
    val rb = ShardWriter.manifestFromFiles(spark, b)
      .select("shard", "min_doc_id", "max_doc_id").collect().toSeq.map(_.toString).sorted
    assert(ra != rb, "seeds produced the same packing order")
  }
}
