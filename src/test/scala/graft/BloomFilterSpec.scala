package graft

import graft.functions.{BloomData, BloomFunctions, BloomUtil}
import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpecBase {
  import spark.implicits._

  test("no false negatives, bounded false positives") {
    val bits = new Array[Long]((1 << 16) / 64)
    (0L until 2000L).foreach(v => BloomUtil.add(bits, 5, v * 7919L))
    (0L until 2000L).foreach { v =>
      assert(BloomUtil.mightContain(bits, 5, v * 7919L), s"false negative at $v")
    }
    // 2000 keys in 65536 bits, k=5 → theoretical FPP ~0.06%; allow 1%
    val fps = (1L to 20000L).count(v => BloomUtil.mightContain(bits, 5, -v))
    assert(fps < 200, s"false positive rate too high: $fps/20000")
  }

  test("bitset is partitioning-invariant (OR is commutative)") {
    val keys = spark.range(0, 5000).select((col("id") * 31L).as("k"))
    def build(parts: Int): Array[Byte] =
      keys.repartition(parts).agg(BloomFunctions.bloomAgg(col("k"), 1 << 16, 5))
        .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(7)),
      "same key set must yield byte-identical filters under any partitioning")
  }

  test("probe expression agrees with BloomUtil under codegen") {
    val bits = new Array[Long]((1 << 14) / 64)
    (0L until 500L).foreach(v => BloomUtil.add(bits, 5, v))
    val bytes = BloomUtil.serialize(bits, 5)
    val got = spark.range(0, 2000)
      .filter(BloomFunctions.bloomMightContain(bytes, col("id")))
      .as[Long].collect().toSet
    val want = (0L until 2000L).filter(BloomUtil.mightContain(bits, 5, _)).toSet
    assert(got == want)
    assert((0L until 500L).forall(got.contains), "inserted keys must all pass")
  }

  test("bloomSemiJoin / bloomAntiJoin are bit-exact vs plain joins") {
    val fact = spark.range(0, 20000).select(col("id").as("fk"),
      (col("id") % 97).as("payload"))
    val keys = spark.range(0, 20000).filter(col("id") % 53 === 0)
      .select(col("id").as("k"))
    val semi = ScaleOps.bloomSemiJoin(fact, "fk", keys, "k", 1 << 14, 5)
      .orderBy("fk").collect().toSeq
    val plainSemi = fact.join(keys.select(col("k").as("fk")), Seq("fk"), "left_semi")
      .orderBy("fk").collect().toSeq
    assert(semi == plainSemi)
    val anti = ScaleOps.bloomAntiJoin(fact, "fk", keys, "k", 1 << 14, 5)
      .orderBy("fk").collect().toSeq
    val plainAnti = fact.join(keys.select(col("k").as("fk")), Seq("fk"), "left_anti")
      .orderBy("fk").collect().toSeq
    assert(anti == plainAnti)
  }

  test("sizeFor tracks |keys| and keeps FPP under ~2% at two corpus sizes") {
    // The rule: smallest pow2 >= 10 bits/key, floor 1024, cap 2^30.
    assert(BloomUtil.sizeFor(0) == 1024)
    assert(BloomUtil.sizeFor(100) == 1024)
    assert(BloomUtil.sizeFor(1000) == 16384)       // 10k bits -> 2^14
    assert(BloomUtil.sizeFor(100000) == 1 << 20)   // 1M bits  -> 2^20
    assert(BloomUtil.sizeFor(1000000) == 1 << 24)  // 10M bits -> 2^24
    assert(BloomUtil.sizeFor(Long.MaxValue / 16) == 1 << 30) // capped
    // monotone: more keys never shrinks the filter
    val sizes = Seq(1L, 10L, 1000L, 100000L, 10000000L).map(BloomUtil.sizeFor(_))
    assert(sizes == sizes.sorted)
    // Measured FPP at the derived size, corpus sizes TWO DECADES
    // apart (5k and 500k keys — the sf10-scale build side) — the
    // whole point of auto-sizing is the rate NOT degrading as the
    // build side grows past any fixed default: 500k keys in the
    // 5k-derived 2^16 bitset would run ~100% FPP.
    for (n <- Seq(5000, 500000)) {
      val m = BloomUtil.sizeFor(n)
      val bits = new Array[Long](m / 64)
      (0 until n).foreach(v => BloomUtil.add(bits, 5, v.toLong * 7919L))
      val probes = 50000
      val fps = (1 to probes).count(v => BloomUtil.mightContain(bits, 5, -v.toLong))
      assert(fps.toDouble / probes < 0.02,
        s"FPP at n=$n, m=$m: $fps/$probes >= 2%")
    }
  }

  test("auto-sized joins (numBits=0 default) stay bit-exact and deterministic") {
    val fact = spark.range(0, 30000).select(col("id").as("fk"),
      (col("id") % 7).as("payload"))
    val keys = spark.range(0, 30000).filter(col("id") % 11 === 0)
      .select(col("id").as("k"))
    val semi = ScaleOps.bloomSemiJoin(fact, "fk", keys, "k")
      .orderBy("fk").collect().toSeq
    val plainSemi = fact.join(keys.select(col("k").as("fk")), Seq("fk"), "left_semi")
      .orderBy("fk").collect().toSeq
    assert(semi == plainSemi)
    val anti = ScaleOps.bloomAntiJoin(fact, "fk", keys, "k")
      .orderBy("fk").collect().toSeq
    val plainAnti = fact.join(keys.select(col("k").as("fk")), Seq("fk"), "left_anti")
      .orderBy("fk").collect().toSeq
    assert(anti == plainAnti)
    // determinism of the derived size: same key set, different
    // partitioning -> byte-identical auto-sized bitsets
    def build(parts: Int): Array[Byte] = {
      val ks = keys.repartition(parts)
      val m = BloomUtil.sizeFor(ks.agg(count(col("k"))).head().getLong(0))
      ks.agg(BloomFunctions.bloomAgg(col("k"), m, 5)).head().getAs[Array[Byte]](0)
    }
    assert(java.util.Arrays.equals(build(1), build(13)))
  }

  test("serialization round-trips bit-exactly and empty/degenerate filters behave") {
    val bits = new Array[Long]((1 << 12) / 64)
    (0L until 100L).foreach(v => BloomUtil.add(bits, 7, v * 13L))
    val round = BloomUtil.deserialize(BloomUtil.serialize(bits, 7))
    assert(round.numHashes == 7)
    assert(java.util.Arrays.equals(round.bits, bits))
    // empty filter rejects everything
    val empty = new BloomData(new Array[Long](8), 5)
    assert((0L until 1000L).forall(v => !empty.mightContain(v)))
    // full filter accepts everything (degenerate but total)
    val full = new BloomData(Array.fill(8)(-1L), 5)
    assert((0L until 1000L).forall(full.mightContain))
    // extreme keys don't crash or alias trivially
    val b2 = new Array[Long](16)
    Seq(Long.MinValue, Long.MaxValue, 0L, -1L).foreach(BloomUtil.add(b2, 5, _))
    Seq(Long.MinValue, Long.MaxValue, 0L, -1L).foreach(v =>
      assert(BloomUtil.mightContain(b2, 5, v)))
  }

  test("plan pin: bloom probe sits below the exchange, in the scan stage") {
    // With broadcast disabled the exact semi join must shuffle — but
    // the bloom filter has to run BEFORE that exchange so a 100 TB
    // fact side is pruned at the scan, not after the shuffle.
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val fact = spark.range(0, 10000).select(col("id").as("fk"))
      val keys = spark.range(0, 10000).filter(col("id") % 100 === 0)
        .select(col("id").as("k"))
      val df = ScaleOps.bloomSemiJoin(fact, "fk", keys, "k", 1 << 14, 5)
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("bloom_might_contain"),
        s"bloom probe missing from plan:\n$plan")
      // Every shuffle feeding the join must have the probe BELOW it
      // (in its subtree): rows die at the scan, not after the wire.
      val exchanges = plan.collect {
        case e if e.nodeName.startsWith("Exchange") => e
      }
      assert(exchanges.nonEmpty, s"expected a shuffled semi join:\n$plan")
      exchanges.foreach { e =>
        assert(e.toString.contains("bloom_might_contain"),
          s"an exchange input is not bloom-pruned:\n$e")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }
}
