package graft

import org.apache.spark.sql.SparkSession

/** Dev main: dumps formatted physical plans for representative queries so
  * plan-shape claims (pushdown, pruning, broadcast, codegen spans) are
  * verifiable — see PLANS.md.
  */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q02_filter_project", "q06_orders_per_nation",
        "q07_two_leg_stats", "q01_pricing_summary", "q25_cosine_pairs",
        "q54_asof_join", "q55_range_join", "q62_ivf_pruned_recall",
        "q63_corpus_prep", "q66_pii_redaction", "q68_hot_shingles",
        "q69_decontamination", "q71_domain_stats", "q72_salted_join",
        "q74_stratified_sample_dim", "q75_heavy_hitters",
        "q76_partition_histogram", "q77_boilerplate_lines",
        "q78_token_chunks", "q79_bigram_lm_score", "q80_token_budget_cap",
        "q82_incremental_dedup", "q83_column_profile", "q84_value_histogram",
        "q85_sq_pruned_knn", "q88_changelog_merge", "q89_snapshot_diff",
        "q90_pruned_semi_join", "q91_pmi_pairs", "q92_quality_classifier",
        "q93_winsorized_stats", "q95_key_gini", "q96_negative_sampling",
        "q97_balanced_upsample", "q98_bpe_pair_census",
        "q99_partial_agg_merge", "q101_pagerank", "q102_funnel",
        "q103_triangle_count", "q104_cohort_retention",
        "q105_quantized_centroids", "q106_rolling_orders",
        "q107_table_checksum", "q108_order_concurrency",
        "q109_transition_census", "q110_conversion_latency",
        "q111_source_novelty", "q112_source_overlap",
        "q113_session_stats", "q114_dup_group_histogram",
        "q115_embedding_dedup", "q116_zorder_layout", "q117_scd2_build",
        "q118_containment_pairs", "q119_split_leakage",
        "q120_char_entropy", "q121_length_percentile",
        "q122_source_divergence", "q123_sharded_zorder_census",
        "q124_vocab_coverage", "q125_mixture_plan",
        "q126_contamination_coverage", "q127_bpe_train",
        "q128_bpe_segment", "q129_sharded_quantiles",
        "q130_keep_best_dedup", "q131_active_users", "q132_weighted_sample",
        "q133_bm25_topk", "q134_indomain_lm", "q135_phrase_search",
        "q136_dup_span_fraction", "q137_diversity_cap",
        "q138_join_cardinality", "q139_mad_outliers",
        "q140_corpus_datasheet", "q141_curation_funnel",
        "q142_source_funnel", "q143_interval_overlap",
        "q144_dsir_weights", "q145_decayed_counts", "q146_dow_anomaly",
        "q147_zipf_census", "q148_curriculum_order",
        "q149_pareto_frontier", "q150_epoch_plan", "q151_grouping_sets",
        "q152_cluster_split", "q153_sketch_quantiles", "q154_hybrid_rrf",
        "q155_quantile_buckets", "q156_logodds_keywords",
        "q157_attribution", "q158_backoff_lm", "q159_token_fertility",
        "q160_sharded_pareto", "q161_nation_trend",
        "q162_windowed_funnel", "q163_ivfpq_pruned_knn",
        "q164_benchmark_containment", "q165_temperature_plan",
        "q166_embedding_diversity", "q167_hard_negatives",
        "q168_session_funnel", "q169_psi_drift", "q170_compaction_plan",
        "q171_strip_dup_spans", "q172_weighted_median",
        "q173_fk_integrity", "q174_dwell_census",
        "q175_retrieval_metrics", "q176_cms_heavy_hitters",
        "q177_quality_ensemble", "q178_forward_fill",
        "q179_golden_record", "q180_user_growth",
        "q181_source_dup_matrix", "q182_session_affinity",
        "q183_fuzzy_match", "q184_pareto_contribution",
        "q185_distribution_match", "q186_rate_monitor",
        "q187_mix_manifest", "q188_effective_tokens",
        "q189_lateness_census", "q190_cure_and_mix",
        "q191_entry_conversion", "q192_truncation_plan",
        "q193_embedding_quality", "q194_ship_lag",
        "q195_repeat_revenue", "q196_discount_curve",
        "q197_session_paths", "q198_cohort_revenue",
        "q199_supplier_redundancy", "q200_hapax_census",
        "q201_top_session_paths", "q202_basket_pairs",
        "q203_collocations", "q204_readability",
        "q205_interarrival_histogram", "q206_priority_mix",
        "q207_supplier_pareto", "q208_activity_heatmap",
        "q209_daily_autocorr", "q210_trade_flows",
        "q211_cluster_size_histogram", "q212_chunk_dup_census",
        "q213_rfm_segments",
        "q214_large_orders", "q215_dormant_customers",
        "q216_top_supplier", "q217_brand_share",
        "q218_min_cost_supplier", "q219_transition_matrix",
        "q220_cusum_changepoint", "q221_conversion_deciles",
        "q222_tfidf_terms",
        "q223_late_order_census", "q224_order_count_distribution",
        "q225_dominant_suppliers", "q226_sole_late_supplier",
        "q227_market_share", "q228_above_avg_orders",
        "q229_entropy_deciles", "q230_type_correlation",
        "q231_pii_census",
        "q232_assignment_drift", "q233_label_distances",
        "q234_lang_purity", "q235_order_backlog",
        "q236_intensity_by_entropy", "q237_revenue_concentration",
        "q238_bounce_rate",
        "q239_cadence_regularity", "q240_hill_tail_index",
        "q241_srm_check", "q242_hll_audit", "q243_trending_types",
        "q244_price_reconciliation", "q245_json_validity",
        "q246_length_token_corr", "q247_bipartite_degrees",
        "q248_benford_census",
        "q249_shipping_priority", "q250_local_supplier_volume",
        "q251_forecast_revenue", "q252_product_profit",
        "q253_returned_customers", "q254_priority_class",
        "q255_promo_share", "q256_supplier_count",
        "q257_small_quantity", "q258_brand_bands",
        "q259_decile_lift", "q260_order_gap_survival",
        "q261_vocab_growth", "q262_new_vs_returning",
        "q291_sink_text_roundtrip", "q293_sink_bulkload_sorted",
        "q295_first_char_partitioner", "q296_mutual_nn_ivf",
        "q298_prefix_jaccard", "q299_spearman", "q300_ks_drift",
        "q301_mmr_rerank", "q302_greedy_source_cover",
        "q303_kcenter_coreset", "q304_schema_evolution",
        "q305_lsh_param_plan", "q306_sequence_gap_census",
        "q307_degree_assortativity", "q308_linear_probe",
        "q310_target_encode_loo", "q311_salt_plan",
        // q309/q312 execute the streaming engine inside the query fn —
        // their "plan" is the memory-sink table scan; specs + DevScale
        // carry their evidence instead
        "q313_sql_frontdoor", "q314_simpson_audit",
        "q315_bucketed_join", "q316_format_roundtrip",
        "q317_cuped_readout", "q318_diff_in_diff",
        "q319_conversion_ztest", "q320_grid_neighbor_pairs",
        "q321_jackknife_ratio_se", "q322_k_anonymity",
        "q323_codec_matrix", "q324_top_names_concat",
        "q325_chi_square_independence", "q326_partitioning_invariance",
        "q327_lang_confusion", "q328_mahalanobis_outliers",
        "q329_cohens_kappa", "q330_weighted_jaccard")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // UTC pins the events NTZ->nanos normalization (Tables.normalizeEventTs)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
