package graft

import graft.operators.Embeddings
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

class SqInt8Spec extends SparkSpecBase {

  test("int8 codes are bounded, byte-typed, and reconstruction-faithful") {
    val emb = Tables.embeddings(spark, sf)
    val amax = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val codes = transform(col("embedding"),
      x => floor(x.cast("double") * (lit(127.0) / amax) + lit(0.5)).cast("tinyint"))
    val enc = emb.select(col("vec_id"), amax.as("amax"), codes.as("codes"))
    assert(enc.schema("codes").dataType == ArrayType(ByteType),
      "codes must be stored as bytes — that IS the 4x compression")
    val bad = enc.select(explode(col("codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count()
    assert(bad == 0, s"$bad codes outside [-127,127]")
    // max |recon - v| per vector is at most amax/254 (half a quantum)
    val err = enc.join(emb, "vec_id")
      .select(array_max(zip_with(col("embedding"), col("codes"),
        (v, c) => abs(v.cast("double") - (c.cast("double") * col("amax")) / lit(127.0))))
        .as("maxerr"), col("amax"))
      .filter(col("maxerr") > col("amax") / lit(253.9)).count()
    assert(err == 0, s"$err vectors exceed the half-quantum reconstruction bound")
  }

  test("fused SQ kernel is bit-identical to the composed HOF spelling") {
    import graft.functions.VectorFunctions
    val emb = Tables.embeddings(spark, sf)
    val amax = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val enc = emb.select(col("vec_id"), col("embedding"), amax.as("amax"))
      .withColumn("codes", transform(col("embedding"), x =>
        floor(x.cast("double") * (lit(127.0) / col("amax")) + lit(0.5)).cast("tinyint")))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val recon = transform(col("codes"),
      c2 => (c2.cast("double") * col("amax")) / lit(127.0))
    val both = enc.crossJoin(q)
      .select(col("vec_id"),
        VectorFunctions.sqCosine(col("qvec"), col("codes"), col("amax")).as("fused"),
        VectorFunctions.cosineSim(col("qvec"), recon).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val f = r.getAs[Double]("fused")
      val c = r.getAs[Double]("composed")
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(c),
        s"kernel diverged from composition at vec ${r.getLong(0)}: $f vs $c")
    }
  }

  test("SQ kernels: null/length-mismatch semantics match the composed spelling") {
    import graft.functions.VectorUtil
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)
    def bytes(xs: Byte*): ArrayData = ArrayData.toArrayData(xs.toArray)
    // length mismatch → null (zip_with would null-pad and null the fold)
    assert(VectorUtil.sqDot(arr(1.0, 2.0), bytes(1, 2, 3), 0.5, qf = false) == null)
    // empty arrays fold to the 0.0 init
    assert(VectorUtil.sqDot(arr(), bytes(), 1.0, qf = false) == 0.0)
    assert(VectorUtil.sqNormSq(bytes(), 1.0) == 0.0)
    // negative codes reconstruct symmetrically
    val d = VectorUtil.sqDot(arr(1.0, 1.0), bytes(-127, 127), 2.0, qf = false)
    assert(d != null && math.abs(d.doubleValue()) < 1e-12,
      s"symmetric codes must cancel, got $d")
  }

  test("g9 approx cosine tracks exact cosine and final ranking is exact-reranked") {
    val emb = Tables.embeddings(spark, sf)
    val out = Embeddings.annSqInt8(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", 10, 3).collect()
    assert(out.length == 15, s"5 queries x top-3 expected, got ${out.length}")
    out.foreach { r =>
      val asim = r.getAs[Double]("asim")
      val cos = r.getAs[Double]("cos")
      assert(math.abs(asim - cos) < 0.02,
        f"quantization error too large: asim=$asim%.4f cos=$cos%.4f")
    }
    // within each query the output is ordered by exact cosine
    out.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "final ranking must be by exact cosine")
    }
  }
}
