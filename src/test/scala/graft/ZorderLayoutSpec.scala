package graft

import graft.queries.ZOrder
import org.apache.spark.sql.functions._

/** b14's layout contract: after the range-partition-by-z sorted
  * write, every parquet file covers a z interval DISJOINT from every
  * other file's — the precondition for parquet min/max stats to skip
  * whole files on a z predicate. Plus the Morton code itself against
  * a plain-Scala reference.
  */
class ZorderLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def refMorton(qx: Int, qy: Int): Int =
    (0 until 8).map(i =>
      (((qx >> i) & 1) << (2 * i)) + (((qy >> i) & 1) << (2 * i + 1))).sum

  test("Column Morton code matches the reference interleave") {
    val pts = for (qx <- 0 until 256 by 17; qy <- 0 until 256 by 13) yield (qx, qy)
    val got = pts.toDF("qx", "qy")
      .select(ZOrder.morton(col("qx"), col("qy")).as("z"))
      .as[Int].collect().toSeq
    assert(got == pts.map { case (x, y) => refMorton(x, y) })
  }

  test("Morton code is a bijection on the 16-bit grid edge cases") {
    val pts = Seq((0, 0), (255, 255), (255, 0), (0, 255), (1, 0), (0, 1))
    val got = pts.toDF("qx", "qy")
      .select(ZOrder.morton(col("qx"), col("qy")).as("z"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 65535, 0x5555, 0xAAAA, 1, 2))
  }

  test("range-partitioned sorted write yields pairwise-disjoint file z ranges") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_zorder_spec"
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i * 37) % 256, (i * 91) % 256)
    }.toDF("id", "qx", "qy")
      .select(col("id"), ZOrder.morton(col("qx"), col("qy")).as("z"))
    df.repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(out)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .as[(String, Int, Int)].collect()
    assert(ranges.length >= 4, s"expected several files, got ${ranges.length}")
    val sorted = ranges.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, s"file z ranges overlap: $hi1 > $lo2")
      case _ =>
    }
    // round trip loses nothing
    assert(spark.read.parquet(out).count() == n)
  }
}
