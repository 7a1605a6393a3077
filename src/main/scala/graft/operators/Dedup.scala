package graft.operators

import graft.functions.{HashFunctions, HashUtil}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** F-group deduplication family (SURVEY §2): exact, n-gram Jaccard,
  * MinHash+LSH and SimHash. All hashing goes through the portable
  * md5-prefix base (graft.functions.HashUtil) so results are
  * engine-reproducible (and oracle-checkable).
  *
  * Scale notes (100 TB): the quadratic danger is the shingle
  * self-join — capped by dropping shingles with document frequency
  * above `dfCap` (super-common shingles carry no dedup signal);
  * MinHash banding replaces the all-pairs join with Σ bucket² work;
  * every aggregation is a plain hash shuffle with map-side combine.
  */
object Dedup {

  /** Exact dedup groups: content hash → (kept id = min, dup count). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the min-id row of each identical-content group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__h", md5(col(textCol)))
      .withColumn("__keep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__h", "__keep")

  /** Pairwise n-gram Jaccard over the shingle sets.
    * Returns (a, b, n_common, jac) for every candidate pair that
    * shares at least one sub-cap shingle.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, dfCap: Int): DataFrame = {
    val sh = TextOps.shingleSet(df, idCol, textCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= dfCap).select("sh")
    val x = sh.join(rare, "sh").select(col(idCol).as("a"), col("sh"))
    val y = sh.select(col(idCol).as("b"), col("sh"))
    val inter = x.join(y, Seq("sh")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), "b")
      .withColumn("jac",
        col("n_common").cast("double") / (col("sza") + col("szb") - col("n_common")))
      .select("a", "b", "n_common", "jac")
  }

  /** Seeds of the 16-hash MinHash family (4 bands × 4 rows). */
  val MinhashA: Array[Long] = Array(29L, 101L, 233L, 419L, 607L, 809L,
    1021L, 1217L, 1423L, 1619L, 1823L, 2029L, 2237L, 2423L, 2617L, 2819L)
  val MinhashB: Array[Long] = Array(7L, 13L, 31L, 61L, 127L, 251L, 509L,
    1013L, 2039L, 4079L, 8161L, 16319L, 32633L, 65269L, 130553L, 261101L)
  val MinhashRowsPerBand = 4

  /** Per-(doc, band) MinHash signature strings. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = TextOps.shingleSet(df, idCol, textCol, n)
      .withColumn("b", HashFunctions.md5prefix64(col("sh")) % lit(HashUtil.P))
    val seeded = sh.select(col(idCol), explode(array(
      MinhashA.indices.map { i =>
        struct(lit(i).as("i"),
          ((lit(MinhashA(i)) * col("b") + lit(MinhashB(i))) % lit(HashUtil.P)).as("h"))
      }: _*)).as("sig"))
      .select(col(idCol), col("sig.i").as("i"), col("sig.h").as("h"))
    val mh = seeded.groupBy(col(idCol), col("i")).agg(min(col("h")).as("mh"))
    mh.groupBy(col(idCol), (col("i") / MinhashRowsPerBand).cast("int").as("band"))
      .agg(sort_array(collect_list(struct(col("i"), col("mh")))).as("arr"))
      .select(col(idCol), col("band"),
        concat_ws(",", transform(col("arr"), x => x.getField("mh").cast("string")))
          .as("sig"))
  }

  /** LSH candidate pairs: docs sharing ≥1 identical band signature,
    * with the number of shared bands (more bands ⇒ higher similarity).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val bands = minhashBands(df, idCol, textCol, n)
    val l = bands.select(col(idCol).as("a"), col("band"), col("sig"))
    val r = bands.select(col(idCol).as("b"), col("band"), col("sig"))
    l.join(r, Seq("band", "sig")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_bands"))
  }

  /** 32-bit SimHash over (non-distinct) tokens. */
  def simhash32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("w"))
      .withColumn("th", HashFunctions.md5prefix64(col("w")) % lit(4294967296L))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1))
        .as(s"s_$b")
    }
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    sums.select(col(idCol),
      (0 until 32).map { b =>
        when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as("simhash"))
  }
}
