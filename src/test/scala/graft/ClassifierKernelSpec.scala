package graft

import graft.functions.HashFunctions
import graft.operators.TextOps
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** K24 parity: the compiled classifier kernel must be bit-identical
  * to the HOF spelling `aggregate(tokens(text), 0L, acc +
  * weights[md5prefix64(w) % 64])` it replaces — including the
  * tokenize contract (lowercase, \s+ split, empties dropped) on
  * edge-case inputs.
  */
class ClassifierKernelSpec extends SparkSpecBase {
  import spark.implicits._

  private val weights = PipelineQueries.classifierWeights

  test("kernel (n_tokens, score) equals the HOF fold on edge-case docs") {
    val docs = Seq(
      (1L, "plain words here"),
      (2L, "  leading and   multiple   spaces  "),
      (3L, "MIXED Case TOKENS"),
      (4L, "tabs\tand\nnewlines\r\ntoo"),
      (5L, "x"),
      (6L, "ünïcode Tökens ÉÀ"),
      (7L, (0 until 500).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val toks = TextOps.tokens(col("text"))
    val wgt = (w: org.apache.spark.sql.Column) => element_at(typedLit(weights),
      ((HashFunctions.md5prefix64(w) % 64L) + 1L).cast("int"))
    val got = docs
      .withColumn("cs", HashFunctions.classifierScore(col("text"), weights))
      .select(col("doc_id"), col("cs.n_tokens"), col("cs.score"))
      .as[(Long, Long, Long)].collect().toSet
    val want = docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("score", aggregate(toks, lit(0L), (acc, w) => acc + wgt(w)))
      .select("doc_id", "n_tokens", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("empty and whitespace-only text scores zero tokens") {
    val got = Seq((1L, ""), (2L, "   \t  ")).toDF("doc_id", "text")
      .withColumn("cs", HashFunctions.classifierScore(col("text"), weights))
      .select(col("cs.n_tokens"), col("cs.score"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L)))
  }
}
