package graft

import org.apache.spark.sql.functions._

/** The round-7 data-selection additions: H13 window chunking, P13
  * DSIR importance resampling, P14 perplexity bucketing. Each is
  * oracle-checked bit-exact by the driver; these specs pin the
  * SEMANTIC claims the oracle can't express — equivalence with an
  * independent reference implementation, and the statistical signal
  * each selection method exists to produce.
  */
class DataSelectionSpec extends SparkSpecBase {

  test("h13 chunks equal an independent Scala reference chunker") {
    val out = SparkEntry.queries("h13_window_chunks")(spark, sf)
      .select("doc_id", "chunk_idx", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ref = docs.toSeq.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = math.max(math.ceil((ws.length - 32) / 24.0).toInt, 0) + 1
      (0 until n).map(ci => (id, ci, ws.slice(ci * 24, ci * 24 + 32).length.toLong))
    }
    assert(out.sorted == ref.sorted)
    // every token position is covered: last chunk reaches the doc end
    val lastEnd = out.groupBy(_._1).map { case (id, cs) =>
      val last = cs.maxBy(_._2)
      id -> (last._2 * 24 + last._3)
    }
    val lens = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
    }.toMap
    assert(lastEnd.forall { case (id, end) => end == lens(id) })
  }

  test("p13 DSIR: selection skews to the target domain far above base rate") {
    // sf0.01 (500 docs) so top-50 is a real selection; base rate of
    // the three target sources is 0.15 there, measured 0.54 selected.
    val dir = "/root/testdata/sf0.01"
    val sel = SparkEntry.queries("p13_dsir_resampling")(spark, dir).select("doc_id")
    val src = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val hits = sel.join(src, "doc_id")
      .filter(col("source").isin("src18", "src6", "src7")).count()
    val total = sel.count()
    assert(total == 50)
    assert(hits.toDouble / total >= 0.40, s"target fraction ${hits.toDouble / total}")
  }

  test("p16 split never straddles a near-dup component and lands near 80/20") {
    val out = SparkEntry.queries("p16_leakage_safe_split")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    val perComp = out.groupBy(_._1).values
    assert(perComp.forall(_.map(_._2).distinct.size == 1),
      "a component straddles train/eval")
    val trainFrac = out.count(_._2 == "train").toDouble / out.length
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"split skewed: $trainFrac")
  }

  test("f16 soft-dedup weights: 1e6/size per cluster member, singletons untouched, tokens conserved") {
    val out = SparkEntry.queries("f16_softdedup_weights")(spark, sf).collect()
    assert(out.nonEmpty)
    // every member of a cluster carries the same size and the ppm
    // weight is exactly floor(1e6 / size); effective tokens follow
    val byComp = out.groupBy(_.getLong(1))
    byComp.foreach { case (_, rows) =>
      val size = rows.head.getLong(2)
      assert(rows.length == size.toInt, s"cluster size $size but ${rows.length} members")
      rows.foreach { r =>
        assert(r.getLong(3) == 1000000L / size)
        assert(r.getLong(5) == r.getLong(4) * (1000000L / size) / 1000000L)
      }
    }
    // singletons keep full weight; the corpus has real near-dup
    // clusters so at least one doc is downweighted
    assert(out.filter(_.getLong(2) == 1L).forall(_.getLong(3) == 1000000L))
    assert(out.exists(_.getLong(2) > 1L))
    // reweighting never inflates: effective ≤ raw tokens, strictly
    // less inside any real cluster
    assert(out.forall(r => r.getLong(5) <= r.getLong(4)))
    assert(out.filter(_.getLong(2) > 1L).forall(r => r.getLong(5) < r.getLong(4)))
  }

  test("p27 scoreboard rows recompute exactly from the per-method queries") {
    val board = SparkEntry.queries("p27_contamination_scoreboard")(spark, sf)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(board.keySet == Set("gram8_eval", "gram13_train", "semantic_eval"))
    val p3 = SparkEntry.queries("p3_contamination")(spark, sf).collect()
    assert(board("gram8_eval").getLong(3) == p3.count(_.getLong(2) > 0))
    assert(board("gram8_eval").getLong(4) == p3.length)
    assert(board("gram8_eval").getLong(5) == p3.map(_.getLong(2)).sum)
    val p3c = SparkEntry.queries("p3c_train_decontaminate")(spark, sf).collect()
    assert(board("gram13_train").getLong(3) == p3c.count(!_.getBoolean(3)))
    assert(board("gram13_train").getLong(4) == p3c.length)
    assert(board("gram13_train").getLong(5) == p3c.map(_.getLong(2)).sum)
    val p8 = SparkEntry.queries("p8_semantic_contamination")(spark, sf).collect()
    assert(board("semantic_eval").getLong(3) == p8.count(_.getLong(2) > 0))
    assert(board("semantic_eval").getLong(4) == p8.length)
    assert(board("semantic_eval").getLong(5) == p8.map(_.getLong(2)).sum)
    // the corpus has real contamination for the n-gram gates to find
    assert(board("gram8_eval").getLong(5) > 0)
    assert(board("gram13_train").getLong(3) > 0)
  }

  test("p28 operating report: thresholds monotone, confusion cells conserve the held-out split") {
    val rows = SparkEntry.queries("p28_classifier_operating_report")(spark, sf)
      .orderBy("q").collect()
    assert(rows.length == 9)
    // decile thresholds are non-decreasing in q
    val thr = rows.map(_.getLong(1))
    assert(thr.sliding(2).forall { case Array(a, b) => b >= a },
      s"thresholds not monotone: ${thr.toSeq}")
    // every threshold partitions the SAME held-out set: cell sums and
    // the positive count are constant across rows
    val totals = rows.map(r => (2 to 5).map(r.getLong).sum).distinct
    assert(totals.length == 1, s"cell sums differ: ${totals.toSeq}")
    val positives = rows.map(r => r.getLong(2) + r.getLong(4)).distinct
    assert(positives.length == 1)
    // raising the bar never ADDS kept positives
    val tps = rows.map(_.getLong(2))
    assert(tps.sliding(2).forall { case Array(a, b) => b <= a },
      s"tp not non-increasing: ${tps.toSeq}")
    // ppm columns recompute from the integer cells
    rows.foreach { r =>
      val (tp, fp, fn) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getLong(6) == (if (tp + fp > 0) tp * 1000000L / (tp + fp) else 0L))
      assert(r.getLong(7) == (if (tp + fn > 0) tp * 1000000L / (tp + fn) else 0L))
    }
    // thresholds land on grid edges and the step is reported — the
    // cumulative rank window runs over the bounded cell frame
    rows.foreach { r =>
      assert(r.getLong(8) == 100000L)
      assert(r.getLong(1) % 100000L == 0L, s"threshold off-grid: ${r.getLong(1)}")
    }
  }

  test("p14 buckets are tercile-bounded and head is kept at 100%") {
    val out = SparkEntry.queries("p14_perplexity_buckets")(spark, sf).collect()
    val n = out.length
    val head = out.filter(_.getString(2) == "head")
    val mid = out.filter(_.getString(2) == "middle")
    assert(head.length >= (n + 2) / 3)
    assert(head.length + mid.length >= (2 * n + 2) / 3)
    assert(head.forall(_.getInt(3) == 1))
    assert(out.map(_.getString(2)).toSet.subsetOf(Set("head", "middle", "tail")))
  }
}
