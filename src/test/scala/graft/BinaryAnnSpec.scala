package graft

import graft.operators.Embeddings
import graft.sources.Tables
import org.apache.spark.sql.functions._

class BinaryAnnSpec extends SparkSpecBase {

  test("sign-code Hamming equals the per-dim sign-disagreement count") {
    val emb = Tables.embeddings(spark, sf)
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"),
      Embeddings.signCode64(col("embedding")).as("ca"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"),
      Embeddings.signCode64(col("embedding")).as("cb"))
    val rows = a.crossJoin(b).filter(col("a") < col("b")).limit(500)
      .select(
        expr("CAST(bit_count(ca ^ cb) AS INT)").as("ham"),
        aggregate(zip_with(col("va"), col("vb"),
            (x, y) => when((x > 0) =!= (y > 0), 1).otherwise(0)),
          lit(0), (acc, d) => acc + d).as("disagree"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"popcount(xor) ${r.getInt(0)} != sign-disagreement ${r.getInt(1)}")
    }
  }

  test("K20 sign-code kernel is bit-identical to the composed CASE-tree spelling") {
    val emb = Tables.embeddings(spark, sf)
    val rows = emb.select(
      Embeddings.signCode64(col("embedding")).as("kernel"),
      Embeddings.signCode64Composed(col("embedding")).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"kernel ${r.getLong(0)} != composed ${r.getLong(1)}")
    }
  }

  test("a vector's code matches itself at Hamming 0 and tops its own query") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100000)
    val res = Embeddings.annBinaryBanded(emb, q, "vec_id", "embedding", 3, 3)
    val top = res.filter(col("rank") === 1).collect()
    assert(top.length == 5, s"expected 5 rank-1 rows, got ${top.length}")
    top.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val cid = r.getAs[Long]("cid")
      assert(cid == qid - 100000, s"query $qid rank-1 is $cid, not its original")
      assert(r.getAs[Int]("hamming") == 0)
      assert(r.getAs[Long]("n_bands") == 4)
    }
  }

  test("banded screen agrees with the exhaustive screen inside the lossless radius") {
    // Every (q, c) pair at Hamming <= 3 found exhaustively MUST
    // appear among the banded candidates (pigeonhole: 4 errors can't
    // touch all 4 of the 16-bit bands... 3 can't).
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000)
    val banded = Embeddings.annBinaryBanded(emb, q, "vec_id", "embedding", 3, 1000)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = emb.select(col("vec_id").as("cid"),
      Embeddings.signCode64(col("embedding")).as("cc"))
    val qq = q.select(col("vec_id").as("qid"),
      Embeddings.signCode64(col("embedding")).as("qc"))
    val exhaustive = c.crossJoin(qq)
      .filter(expr("CAST(bit_count(cc ^ qc) AS INT)") <= 3)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaustive.nonEmpty, "test corpus must contain at least the planted dups")
    val missed = exhaustive -- banded
    assert(missed.isEmpty, s"banded screen lost in-radius pairs: $missed")
  }

  test("annBinary returns k exact-reranked rows per query, hamming ascending pre-rank") {
    val emb = Tables.embeddings(spark, sf)
    val res = Embeddings.annBinary(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 10, 3)
    val rows = res.collect()
    assert(rows.length == 9, s"3 queries x k=3 expected, got ${rows.length}")
    // rerank is by exact cosine: within a query, cos is non-increasing in rank
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
  }
}
