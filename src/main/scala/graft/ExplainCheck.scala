package graft

import org.apache.spark.sql.SparkSession

/** Plan-review tool: dumps pushed filters, read schemas, joins and
  * exchanges for the named queries (all queries if no args).
  * `runMain graft.ExplainCheck [query ...]`
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("e1_pricing_summary", "e2_revenue_filter", "e4_star_join",
        "c1_latest_state", "c2_latest_recent", "d2_time_series", "d3b_modulo_sample",
        "g1_knn_bruteforce", "f2_dedup_ngram_jaccard", "f7_dedup_components",
        "p1_curation_pipeline", "b6_bucketed_join", "b2_clustered_layout",
        "e13d_kmv_intersect", "e14d_weighted_median", "e20b_window_funnel",
        "e26_correlation", "h7_unigram_logprob", "p5_source_mixing",
        "e13e_kmv_aggregate", "f4b_simhash_pairs", "f8_span_dedup",
        "g5_kmeans", "g6_ann_pq_adc", "d13_interpolate", "d14_lttb_downsample",
        "g7_ivf_pq", "g7b_ann_ivf_trained", "f4c_simhash64",
        "g7c_pq_trained", "g2c_ann_lsh_sized", "f9_incremental_dedup",
        "f1b_dedup_exact64", "p9_semantic_dedup", "b12_bloom_semi_join",
        "b12b_bloom_anti_join", "g9_ann_sq_int8", "h10_char_entropy",
        "e11c_grouping_sets", "f10_lsh_quality", "i4_media_neardup",
        "p10_curation_v2", "p11_temperature_sampling",
        "e31b_time_range_avg", "h11_bpe_pairs",
        "g10_ann_binary", "g10b_ann_binary_banded", "h12b_bpe_tokenize",
        "p12_curation_funnel")
    for (name <- names) {
      println(s"========== $name")
      val df = SparkEntry.queries(name)(spark, dir)
      // Execute first so AQE finalizes the plan — claims about reuse /
      // exchanges must be made against what actually ran, not the
      // initial plan.
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString.replace("\n", " ")
      // Pushed predicates appear as `PushedFilters:` on v1-style scans
      // but as `DataFilters:` / `PartitionFilters:` on FileScan output
      // (round 1 missed d2's pushed ts range because of this).
      Seq("PushedFilters: \\[[^\\]]*\\]", "DataFilters: \\[[^\\]]*\\]",
        "PartitionFilters: \\[[^\\]]*\\]").foreach { pat =>
        pat.r.findAllIn(plan).foreach(m => println(s"  ${m.take(200)}"))
      }
      "ReadSchema: struct<[^>]*>".r.findAllIn(plan)
        .foreach(m => println(s"  ${m.take(160)}"))
      Seq("Scan parquet", "InMemoryTableScan", "ReusedExchange",
        "BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin",
        "Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "WindowGroupLimit", "HashAggregate",
        "SortAggregate", "Sort ").foreach { op =>
        val c = op.r.findAllIn(plan).length
        if (c > 0) println(s"  $op × $c")
      }
    }
    spark.stop()
  }
}
