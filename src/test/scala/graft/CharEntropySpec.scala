package graft

import graft.functions.{HashFunctions, HashUtil}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CharEntropySpec extends SparkSpecBase {
  import spark.implicits._

  private def ent(s: String): (Long, Int, Double) = {
    val r = HashUtil.charEntropy(UTF8String.fromString(s))
    (r.getLong(0), r.getInt(1), r.getDouble(2))
  }

  test("edge cases: empty, single char, uniform, astral code points") {
    assert(ent("") == ((0L, 0, 0.0)))
    assert(ent("aaaa") == ((4L, 1, 0.0)), "single-symbol string has zero entropy")
    // "ab" → two chars p=0.5 each: term = -(0.5*ln 0.5) = 0.346574 quantized
    val (n, d, e) = ent("ab")
    assert(n == 2L && d == 2)
    assert(e == math.floor(-(0.5 * math.log(0.5)) * 1e6 + 0.5) * 2 / 1e6)
    // astral char (U+1F600) is ONE code point, not two Java chars
    val (n2, d2, _) = ent("😀😀a")
    assert(n2 == 3L && d2 == 2, "surrogate pair must count as one code point")
  }

  test("kernel equals the exploded groupBy spelling on the corpus") {
    val docs = sources.Tables.documents(spark, sf)
    val kernel = docs
      .select(col("doc_id"), HashFunctions.charEntropy(col("text")).as("ce"))
      .select(col("doc_id"), col("ce.n_chars"), col("ce.n_distinct"),
        col("ce.entropy"))
    // composed: explode chars, count per (doc, char), micros-quantized sum
    val ch = docs.select(col("doc_id"),
      explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
    val tot = ch.groupBy("doc_id").agg(sum(col("cnt")).as("n"))
    val composed = ch.join(tot, "doc_id")
      .withColumn("p", col("cnt").cast("double") / col("n"))
      .withColumn("tu", floor(-(col("p") * log(col("p"))) * lit(1e6) + lit(0.5)))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_chars"),
        count(lit(1)).cast("int").as("n_distinct"),
        (sum(col("tu")).cast("double") / lit(1e6)).as("entropy"))
    val k = kernel.orderBy("doc_id").collect()
    val c = composed.orderBy("doc_id").collect()
    assert(k.length == c.length && k.length > 0)
    k.zip(c).foreach { case (a, b) =>
      assert(a.getLong(1) == b.getLong(1), s"n_chars mismatch at ${a.getLong(0)}")
      assert(a.getInt(2) == b.getInt(2), s"n_distinct mismatch at ${a.getLong(0)}")
      assert(java.lang.Double.doubleToRawLongBits(a.getDouble(3)) ==
        java.lang.Double.doubleToRawLongBits(b.getDouble(3)),
        s"entropy mismatch at ${a.getLong(0)}: ${a.getDouble(3)} vs ${b.getDouble(3)}")
    }
  }
}
