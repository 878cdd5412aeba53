package graft

import org.apache.spark.sql.SparkSession

/** Plan-review artifact generator: prints the formatted physical plan of
  * EVERY SparkEntry query (`runMain graft.Explain [sfDir] > PLANS.md`).
  * Used to audit pushdown/broadcast/shuffle shape per round.
  *
  * The query list is DERIVED from `SparkEntry.queries`, not
  * hand-maintained: rounds 9-11 each shipped PLANS.md stale because new
  * queries had to be added to a static list here and weren't
  * (d31/d32/d33/k07 were the round-11 misses). Deriving the list makes
  * staleness impossible at generation time, and tools/check.py now
  * FAILS when any `SparkEntry.queries` key lacks a `## <name>` section
  * in the committed PLANS.md — the regenerate step can no longer be
  * silently skipped (round-11 advice: three consecutive stale rounds
  * prove a reminder doesn't work; only a failing check does).
  *
  * `Legacy` preserves the old curated ordering so regenerated diffs
  * stay reviewable: curated names keep their historical position,
  * anything new lands at the end in sorted order.
  */
object Explain {

  def all: Seq[String] = {
    val known = Legacy.filter(SparkEntry.queries.contains)
    known ++ (SparkEntry.queries.keySet -- known).toSeq.sorted
  }

  private val Legacy: Seq[String] = Seq(
    "q01_pricing_summary", "q05_local_supplier_volume", "j10_cross_scalar_pct",
    "j12_salted_join", "j13_asof_join", "a08_two_phase_distinct", "w03_surrogate_keys",
    "s11_partitioned_scan", "s12_bucketed_agg", "s15_dynamic_pruning",
    "d02_ngram_jaccard", "d04_minhash_lsh", "d05_cosine_lsh",
    "d08_ngram_jaccard_capped", "d09_simhash_text", "d10_neardup_clusters",
    "v02_ann_lsh_topk", "v03_ann_multiprobe_topk", "v04_ann_ivf_topk",
    "a11_cube", "w05_window_suite", "e06_json_props",
    "p11_q1", "p13_q3", "e02_sessionize",
    "q07_volume_shipping", "q10_returned_items", "j15_aqe_skew_join",
    "s16_bloom_filter_join", "d11_contamination", "v05_label_centroids",
    "t09_repetition_ratio", "t10_bigram_vocab", "w06_range_window",
    "u03_scd2_point_in_time",
    "q09_product_profit", "q17_small_qty_revenue", "q19_disjunctive_revenue",
    "q21_waiting_suppliers", "q22_sales_opportunity", "k01_token_packing",
    "j16_nullsafe_join", "j17_shuffle_hash_hint", "s20_sorted_shards",
    "s21_stats_pruned_scan", "s22_zorder_clustering", "j18_interval_overlap_join",
    "t12_tfidf", "t13_word_entropy", "w08_ntile_quartiles", "q20_dominant_suppliers",
    "q23_min_cost_supplier", "q11_important_stock", "j19_lateral_topk",
    "r01_recursive_hierarchy", "d14_cc_convergent", "e18_variant_props",
    "e19_transition_matrix", "dq02_outlier_report", "d07_editdist_verify",
    "d16_cdc_chunk_dedup", "a15_typed_udaf", "v07_ann_rerank_topk",
    "d17_stored_incremental", "v08_ann_rerank_int8", "p14_partitioned_q1",
    "d18_approx_sketch_gate", "d19_evolving_store", "t14_boilerplate",
    "v09_ann_rerank_pq",
    "t17_bpe_pair_counts", "d20_dedup_audit", "v10_ann_filtered",
    "d21_semantic_dedup", "dq04_fk_report", "t18_length_mixture",
    "v11_ann_stored",
    "c01_curated_packed_bins", "c02_curation_funnel", "v12_ann_recall_report",
    "d22_streaming_store_dedup", "t19_bpe_iterated_merges",
    "d23_span_dups", "d24_segment_dedup", "ml01_ols_fit", "g01_pagerank", "t22_top_dup_spans",
    "g02_shortest_paths", "v13_ann_tombstoned", "c03_incremental_funnel",
    "g03_partner_triangles", "v14_ivf_index_stats", "dq05_drift_report",
    "s25_time_travel", "v15_ann_main_delta", "ml02_centroid_confusion",
    "e22_stream_running_totals",
    "t20_bpe_encode", "t21_bpe_fertility", "k02_shard_assignment",
    "k03_packed_sequences", "g04_kcore", "v16_ann_stream_serve",
    "dq06_volume_anomaly", "c04_training_shards", "d25_containment_neardup",
    "t23_text_normalize", "d26_quality_canonical", "v17_ann_rebuilt",
    "s26_bucketed_join", "ml03_kmeans_elbow", "d27_drop_provenance",
    "c05_streaming_admission", "e23_rolling_unique_users",
    "d28_containment_capped", "e24_stream_full_outer", "e25_stream_asymmetric",
    "d29_method_overlap", "k04_context_waste", "k05_stratified_sample",
    "j20_asof_tolerance", "k06_temperature_mixture", "d30_multisignal_dedup",
    "e26_stream_asof_enrich", "d31_semantic_dedup_scaled",
    "d32_semantic_contamination", "k07_cluster_balanced_sample")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"# PLANS — formatted physical plans of every SparkEntry query ($sfDir)")
    println()
    all.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"## $name\n")
      println("```")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
