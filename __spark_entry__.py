"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in tp_airflow_gtfs_snowflake_spark.plans.driver_queries;
this module only adapts them to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tp_airflow_gtfs_snowflake_spark.plans import driver_queries as _dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (scan+join+window+agg+top-k) on sf0.001."""
    return _dq.flagship_span_topk(spark, "/root/testdata/sf0.001")


# The driver's per-round correctness check covers ~50 queries in
# registry order (CORRECTNESS_r01 and _r02 both recorded the identical
# 50-name prefix of a larger registry).  To accumulate hard driver
# signal across rounds we surface queries the driver has NOT yet
# verified first; the names below already have green rows in
# CORRECTNESS_r01+r02 and rotate to the back.  Update this list each
# round from the latest CORRECTNESS_r{N}.json.
_DRIVER_VERIFIED = [
    "flagship_span_topk", "a13_explode_array", "a15_dedup_first_wins",
    "a16_lenient_cast", "a17_round_cast", "a18_projection_filter",
    "a19_coalesce", "a20_case_null_label", "a21_scalar_max_watermark",
    "a22_incremental_filter", "a23_timezone_convert",
    "b01_gtfs_time_parse", "b02_epoch_local_buckets", "b03_delay_join",
    "b04_broadcast_dim_join", "b05_time_bucket_agg",
    "b06_conditional_rate", "b07_topk_by_aggregate",
    "b08_heatmap_dow_hour", "b09_histogram", "b10_span_per_group",
    "b11_latest_per_key", "b12_left_anti_coverage", "b13_recency_filter",
    "b14_asof_join", "b15_range_bucket_join", "b16_rollup_agg",
    "b17_cube_agg", "b18_set_ops", "b19_pivot", "b21_window_suite",
    "c01_exact_dedup", "c01b_normalized_neardup", "c02_cosine_topk",
    "c03_text_stats", "c03b_fingerprint", "c03c_lang_id",
    "c03d_quality_score", "c03e_bpe_token_count",
    "c03f_winnow_fingerprint", "c04_json_extract",
    "c04b_from_json_struct", "c05_multimodal_meta", "c05b_image_features",
    "c05c_frame_sample", "c06_minhash_neardup", "c07_simhash_neardup",
    "c08_ngram_jaccard",
    # --- r03 greens (CORRECTNESS_r03.json: 46 hash_match + 4 rows-only) ---
    "c09_ivf_ann", "c10_embedding_neardup", "b20_percentiles",
    "b22_salted_distinct_agg", "b24_full_outer_join", "c11_map_functions",
    "b25_tumbling_window", "c12_string_suite", "c13_array_suite",
    "b26_datetime_suite", "b27_unpivot", "b28_semi_anti_join",
    "q01_pricing_summary", "q03_shipping_priority", "q06_forecast_revenue",
    "q05_local_supplier_volume", "q18_large_volume_customer",
    "q04_exists_subquery", "q17_small_qty_revenue", "c14_tfidf_top_terms",
    "c15_contamination_check", "c16_pii_scrub", "c17_stratified_sample",
    "q13_order_count_distribution", "q19_disjunctive_predicates",
    "q22_dormant_accounts", "b29_sessionization", "b30_retention_cohorts",
    "c05d_audio_features", "q10_returned_item_revenue",
    "q12_priority_line_counts", "q14_promo_revenue_pct",
    "b31_outlier_filter", "b32_sequence_gap_detection",
    "b33_funnel_analysis", "c20_label_centroids", "b34_moving_range_window",
    "b35_gap_fill_forward", "c21_doc_chunking", "c22_sequence_packing",
    "q07_volume_shipping", "q08_market_share", "q15_top_supplier",
    "q21_waiting_supplier", "q02_min_cost_supplier", "q09_product_profit",
    # rows-only (no_oracle) in r03 -- already driver-exercised, rotate back
    "b23_approx_sketches", "c06f_minhash_neardup_fast",
    "c07f_simhash_neardup_fast", "c18_kmeans_ivf_ann",
    # --- r04 greens (CORRECTNESS_r04.json: 49 hash_match; c32 rows-only) ---
    "c104_pagerank_int", "c105_bigram_lm_score", "b121_ohlc_candles",
    "c106_link_prediction", "b122_kmv_difference_estimate",
    "c108_ngram_novelty", "b123_spearman_corr", "c109_blocklist_gate",
    "b124_ab_proportion_test", "c110_recsys_eval",
    "c111_offpolicy_ips_eval", "b125_cuped_adjustment",
    "b126_mad_outliers", "c112_kcore_peeling", "b127_rfm_segmentation",
    "b128_peak_concurrency", "b129_price_volume_bridge",
    "b130_cohort_ltv", "c113_neardup_evidence", "b131_seasonal_index",
    "c05e_real_image_decode", "c26c_pq_adc_int",
    "c64b_source_overlap_sketched", "c38_heavy_hitters",
    "b47_equidepth_histogram", "b106_skyline_docs",
    "b107_pps_systematic_sample", "b111_lateral_topk_orders",
    "c95_contamination_13gram", "c96_source_score_normalize",
    "c98_triangle_count", "b117_position_attribution",
    "c100_dedup_method_agreement", "c101_embedding_drift_audit",
    "c102_exact_substring_spans", "b118_nearest_within_radius",
    "c103_vocab_overlap_matrix", "b119_seasonal_naive_eval",
    "b120_dow_median_baseline", "q11_important_stock",
    "q16_supplier_cnt", "q20_excess_inventory", "c19_dup_components",
    "c19b_component_dedup", "c37_dup_cluster_sizes",
    "c42_leakage_free_split", "c49_quality_canonical_dedup",
    "c93_component_density_audit", "c32_pagerank_centrality",
    # --- r05 greens (CORRECTNESS_r05.json: 50/50 hash_match) ---
    "b134_streaming_ingest_restart", "b135_streaming_kmv_state",
    "b136_streaming_session_close", "b140_streaming_dedup_restart",
    "b142_streaming_late_data_drop", "b143_streaming_stream_join",
    "b102_kmv_distinct_estimate", "b103_kmv_intersection_estimate",
    "c23_gopher_quality", "c24_repetition_metrics",
    "b36_interval_overlap_join", "c25_srp_lsh_neardup",
    "b37_constraint_audit", "b38_scd2_intervals",
    "b39_linear_interpolation", "b40_profile_table",
    "c27_fuzzy_match_profile", "c04c_variant_json",
    "c28_negative_sampling", "b42_topk_per_group", "b43_snapshot_diff",
    "c29_segment_dedup", "c30_decontam_removal", "b44_bitmap_distinct",
    "b45_event_transitions", "c31_udtf_chunking",
    "c33_token_freq_quality", "c34_mixture_resampling",
    "b46_period_over_period", "c35_prefix_filter_jaccard",
    "c36_token_association", "b48_listagg_paths",
    "c39_int8_quantization", "b50_try_arithmetic", "c40_vocab_coverage",
    "b51_first_touch_attribution", "c41_bipartite_lsh_decontam",
    "c43_dup_ngram_rate", "b53_schema_drift_union",
    "b54_nested_denormalize", "c45_token_budget_apportionment",
    "c46_langid_confusion", "b55_pareto_contribution",
    "b56_date_spine_zero_fill", "b57_interarrival_histogram",
    "c47_vocab_truncation", "c48_hard_negative_mining",
    "b58_topn_with_ties", "c50_corpus_datacard",
    # --- r06 greens (CORRECTNESS_r06.json: 50/50 hash_match) ---
    "b155_streaming_datasource_restart", "b153_hll_portable_sketch",
    "b154_sliding_hll_distinct", "b145_streaming_cdc_upsert",
    "b148_dense_global_ids", "b149_ece_calibration_bins",
    "b150_simpson_reversal_audit", "b151_asof_tolerance_nearest",
    "b152_interval_union_coverage", "c129_edit_distance_verify",
    "c130_jsd_lang_divergence", "c131_cluster_purity_mi",
    "b137_theil_sen_slope", "b138_l_diversity",
    "b139_holt_linear_forecast", "b141_countmin_frequency",
    "b144_bloom_membership", "b146_clamped_running_balance",
    "b147_top_session_paths", "c124_priority_sample",
    "c125_minhash_estimate_error", "c126_sampled_quantiles",
    "c127_knn_label_consistency", "c128_dsir_importance",
    "c51_source_dup_rate", "c52_triangle_census",
    "c53_dup_span_flagging", "c54_bigram_lm_score",
    "c55_ngram_novelty", "c56_cluster_cohesion",
    "c57_length_percentile_filter", "c58_source_embedding_drift",
    "c60_exact_substring_decontam", "c61_mislabel_candidates",
    "c62_template_detection", "c63_embedding_qa_audit",
    "c64_source_overlap_matrix", "c65_effective_token_yield",
    "c67_target_encoding", "c68_skipgram_pairs",
    "c69_hapax_rate", "c70_containment_pairs",
    "c71_winsorized_mean", "c72_dup_quality_contingency",
    "c73_distribution_drift_tv", "c74_cross_lang_dups",
    "c75_inverse_dup_weighting", "c76_feature_covariance",
    "c77_curation_funnel", "c78_text_embedding_join",
]


# Queries ADDED this round go first inside the unverified window:
# driver hash rows on brand-new code are worth more than on queries
# already green in the local mirror for several rounds.  Also holds
# previously-green names whose implementation changed after their
# last driver row (r06: b153/b154 — the HLL all-zero rank clamp).
# The r07 window (per VERDICT r06 tasks 1+2): this round's brand-new
# additions first (never driver-checked new code is worth the most),
# then the r06 additions that shipped behind the r06 window
# (b156-b160 + c132), then the c79-c103 cohort (oldest never-checked),
# then b59+ fills the rest of the ~50-slot window in registry order
# via the `front` bucket of _rotated().
_NEW_THIS_ROUND = [
    # brand-new this round (r07)
    "b161_streaming_retraction_restart",
    "b162_zonemap_skipping_audit", "b163_join_cardinality_estimate",
    "b164_range_partition_boundaries", "c133_rank_biased_overlap",
    "c134_ndcg_eval", "c135_token_suffix_lcp_dup",
    # r06 additions, shipped behind the r06 window — never checked
    "b156_mips_norm_pruned_topk", "b157_skew_salt_audit",
    "b158_incremental_agg_retraction", "b159_qdigest_quantiles",
    "b160_sliding_qdigest", "c132_average_precision",
    # c79-c103 cohort (oldest never-checked)
    "c79_idf_weighted_containment", "c80_lsh_precision_audit",
    "c81_shard_balance_audit", "c82_bpe_pair_counts",
    "c85_feature_hash_bow", "c86_jl_projection",
    "c87_semantic_dedup", "c88_lookback_dedup",
    "c89_unigram_surprise", "c90_zipf_slope_audit",
    "c91_ann_recall_eval", "c92_dedup_threshold_sweep",
    "c94_quantile_normalization", "c95_poisson_bootstrap",
    "c96_gini_concentration", "c97_decontam_needle_sweep",
]


def _rotated(d: dict) -> dict:
    """Order the registry so the driver's ~50-slot correctness window
    lands on maximal hard signal: new/changed code first, then
    never-driver-checked names in registry order, then rows-only
    (no-oracle) names — which can never produce a green hash row and
    must not burn window slots — and finally already-verified names.
    """
    oracled = set(_dq.oracle_sql())
    seen = set(_DRIVER_VERIFIED)
    prio = {k: d[k] for k in _NEW_THIS_ROUND if k in d and k in oracled}
    front = {k: v for k, v in d.items()
             if k not in seen and k not in prio and k in oracled}
    rows_only = {k: v for k, v in d.items()
                 if k not in seen and k not in prio and k not in oracled}
    back = {k: v for k, v in d.items() if k in seen and k not in prio}
    return {**prio, **front, **rows_only, **back}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(_dq.queries())


def oracle_sql() -> dict[str, str]:
    return _rotated(_dq.oracle_sql())
