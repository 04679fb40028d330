"""Benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query executes with a count() action (full plan, no driver-side
collect of payloads).  A warm-up action runs first so JVM/codegen
startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import time

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY
from tp_airflow_gtfs_snowflake_spark.session import get_spark

HEADLINE = [
    "flagship_span_topk",   # scan+join+window+agg+topk
    "b03_delay_join",       # big fact-fact equi join
    "b04_broadcast_dim_join",  # star schema + broadcast dims
    "b05_time_bucket_agg",  # time-bucketed agg + countDistinct
    "b07_topk_by_aggregate",
    "b10_span_per_group",   # window over sequence
    "b11_latest_per_key",
    "c01b_normalized_neardup",  # text normalize + hash groupBy
    "c02_cosine_topk",      # vector similarity
    "c04_json_extract",
    "b14_asof_join",        # union+window as-of join
    "b16_rollup_agg",       # grouping sets via Expand
    "c06f_minhash_neardup_fast",  # shingle->minhash->LSH->verify (xxhash64)
    "c07f_simhash_neardup_fast",  # bit-vote signature + prefix buckets
    "q01_pricing_summary",  # TPC-H Q1 wide agg
    "q03_shipping_priority",  # TPC-H Q3 star join + top-k
    "q05_local_supplier_volume",  # TPC-H Q5 6-table join
    "q06_forecast_revenue",  # TPC-H Q6 scan-filter-agg
    "c09_ivf_ann",          # bucketed approximate NN
    "c05b_image_features",  # Arrow mapInPandas decode path
    "q07_volume_shipping",  # two-fact join + nation-pair disjunction
    "q21_waiting_supplier",  # correlated EXISTS + NOT EXISTS pair
    "b33_funnel_analysis",  # single-shuffle funnel (HOF form)
    "c19_dup_components",   # iterative connected components
    "c20_label_centroids",  # exploded exact centroid agg
    "c21_doc_chunking",     # token-window chunking (explode, no shuffle)
    "c23_gopher_quality",   # quality-rule narrow map
    "c24_repetition_metrics",  # sorted-bigram fold, zero shuffle
    "b36_interval_overlap_join",  # grid-bucketed interval join
    "c25_srp_lsh_neardup",  # hyperplane-LSH banded join
    "c26_pq_ann",           # product-quantization ADC + rerank
    "b38_scd2_intervals",   # SCD2 window builder
    "b43_snapshot_diff",    # CDC full-outer snapshot reconciliation
    "c29_segment_dedup",    # CCNet-style segment-level corpus dedup
    "c41_bipartite_lsh_decontam",  # cross-corpus LSH decontamination
    "b54_nested_denormalize",      # array<struct> build + HOF consume
    "b74_fuzzy_name_join",   # banded edit-distance record linkage
    "b77_weighted_median",   # histogram-collapsed weighted quantile
    "c61_mislabel_candidates",  # centroid-outlier mining
    "c64_source_overlap_matrix",  # cross-source shingle Jaccard
    "c82_bpe_pair_counts",   # BPE trainer iteration-0 pair agg
    "b101_spatial_radius_join",  # grid-blocked spatial self-join
    "b102_kmv_distinct_estimate",  # mergeable KMV sketch + audit
    "b106_skyline_docs",     # two-pass blocked Pareto dominance
    "b107_pps_systematic_sample",  # two-pass distributed prefix sum
    "b47_equidepth_histogram",     # two-pass exact ntile
    "b111_lateral_topk_orders",    # LATERAL -> WindowGroupLimit
    "c64b_source_overlap_sketched",  # KMV source-overlap matrix
    "c95_contamination_13gram",    # 13-gram decontamination audit
    "c98_triangle_count",          # degree-oriented triangles
    "c05e_real_image_decode",      # real netpbm decode via Arrow
    "c26c_pq_adc_int",             # int-grid PQ ADC scan (numpy)
    "c101_embedding_drift_audit",  # integer centroid-drift monitor
    "b117_position_attribution",   # U-shaped multi-touch windows
    "c102_exact_substring_spans",  # ExactSubstr duplicated spans
    "c104_pagerank_int",           # integer-exact iterative PageRank
    "c105_bigram_lm_score",        # bigram-LM fluency scoring
    "b121_ohlc_candles",           # single-agg OHLC bars
    "c108_ngram_novelty",          # first-occurrence novelty audit
    "b122_kmv_difference_estimate",  # theta-sketch a-not-b
    "b123_spearman_corr",          # blocked-rank exact Spearman
    "c115_bm25_retrieval",         # integer BM25 top-k retrieval
    "b137_theil_sen_slope",        # pairwise-slope robust trend
    "c119_modularity_int",         # community-quality integer audit
    "c120_matryoshka_audit",       # prefix-dim vs full-dim ANN audit
    "c121_lexical_diversity",      # Simpson/TTR text-quality map
    "b141_countmin_frequency",     # mergeable CM frequency sketch
    "c124_priority_sample",        # weighted one-pass subsample
    "b144_bloom_membership",       # Bloom bit-set build + FP audit
    "c128_dsir_importance",        # hashed-ngram importance weights
    "b146_clamped_running_balance",  # Lindley prefix-min window
    "b147_top_session_paths",      # session path mining top-k
    "b151_asof_tolerance_nearest",  # nearest as-of, two stacked windows
    "b152_interval_union_coverage",  # interval union gaps-and-islands
    "c130_jsd_lang_divergence",    # unigram JSD, pivot + pair explode
    "b153_hll_portable_sketch",    # portable HLL registers + audit
    "b154_sliding_hll_distinct",   # trailing-window register merge
    "b156_mips_norm_pruned_topk",  # Cauchy-Schwarz norm-pruned MIPS
    "b157_skew_salt_audit",        # shuffle-skew + salt-factor model
    "b158_incremental_agg_retraction",  # matview delta w/ retractions
    "c132_average_precision",      # blocked-rank exact AP eval
    "b159_qdigest_quantiles",      # mergeable q-digest quantile sketch
    "b160_sliding_qdigest",        # trailing-window quantile merge
    "b162_zonemap_skipping_audit",  # min/max file-stats pruning audit
    "b163_join_cardinality_estimate",  # NDV-histogram CBO estimate
    "b164_range_partition_boundaries",  # sample-based sort planning
    "c133_rank_biased_overlap",    # top-weighted ranking similarity
    "c134_ndcg_eval",              # graded ranking eval per source
    "c135_token_suffix_lcp_dup",   # suffix-array repeated-span scan
    "b165_zorder_clustering_audit",  # Morton vs linear zone-map skip
    "b166_compaction_bin_packing",   # manifest first-fit rewrite plan
    "b167_delete_vector_audit",      # MoR delete-fraction decisions
    "c136_crossdoc_suffix_lcp",      # cross-doc suffix adjacency LCP
    "c137_label_propagation_communities",  # sync LPA, fixed rounds
    "b168_changepoint_binary_segmentation",  # prefix-sum split argmax
    "b169_partition_transform_audit",  # partition-spec dry-run scores
    "c138_greedy_max_coverage_selection",  # submodular corpus picks
    "c139_cohens_kappa_langid",        # chance-corrected labeler eval
    "b170_runtime_filter_reduction_audit",  # bloom semi-join savings
    "b171_zorder_write_layout_check",  # materialized z-layout footers
    "b172_snapshot_expiry_audit",      # expiry/orphan reclaim ledger
    "b173_clustering_depth_audit",     # sweep-line overlap depth
    "c140_gopher_repetition",          # top-2gram/dup-2gram rules
    "c141_lsh_param_expected_cost",    # S-curve x observed histogram
    "b175_file_bloom_index_audit",     # point-lookup file skipping
    "b176_sorted_run_merge_planner",   # overlap groups -> merge tasks
    "b177_merge_plan_execution_proof",  # executed merge + footer proof
    "c142_label_signal_ceiling",       # label-vs-null unigram TV audit
    "c143_shingle_containment",        # asymmetric doc-in-doc dedup
    "c144_sq8_quantization_audit",     # int8 SQ recall + error audit
    "b178_gap_fill_interpolation",     # day-spine linear gap fill
    "b179_dictionary_encoding_audit",  # order-preserving global dict
    "b180_join_view_delta_maintenance",  # IVM delta-join expansion
    "c146_heaps_law_vocab_growth",     # doubling-grid Heaps audit
    "c147_pmi_collocations",           # integer-lift PMI top-k
    "c148_taxonomy_keyword_tagging",   # broadcast-dict topic shares
    "b181_t_closeness_audit",          # ordered-EMD privacy audit
    "b182_session_threshold_audit",    # gap-band threshold pricing
    "c149_good_turing_unseen_mass",    # count-of-counts GT audit
    "b183_conversion_hazard",          # censored KM hazard curve
    "b184_watermark_delay_audit",      # batch-boundary lateness grid
    "b185_column_profile",             # one-pass catalog stats
    "b186_hll_hierarchy_rollup",       # register merge up a hierarchy
    "c150_dedup_threshold_curve",      # Jaccard-knob pricing curve
    "c151_context_packing_audit",      # concat-and-split packing grid
    "c152_stratified_split_audit",     # hash-split mixture balance
    "c153_vocab_coverage_curve",       # top-k token-mass coverage
    "b187_scd2_late_arrival_repair",   # late-batch interval diff
    "c154_temperature_mixture_weights",  # isqrt T=2 source weights
]
# c145_char5_minhash_neardup is intentionally NOT in HEADLINE: char
# 5-grams are ~6x the shingle rows of the word-3-gram c06f that IS
# benched (same pipeline shape, same plan gates), and its ~17 s
# steady cost at sf0.1 would dominate the suite without adding plan
# coverage.  Its perf record: NOTES.md r10 (measured 17.6 s exploded
# join vs 47.7 s array-intersect variant — the shape decision).


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Optional subset mode (r12, VERDICT task 5): comma-separated query
    # names restrict the timed sweep — used for the committed sf1
    # hot-tail evidence runs.  Default (env unset) is the full HEADLINE,
    # byte-identical behavior to r11.
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    subset = [n.strip() for n in subset_env.split(",") if n.strip()]
    headline = [n for n in HEADLINE if n in subset] if subset else HEADLINE
    spark = get_spark("bench")

    # warm-up: JVM + parquet footer caches
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    errors: dict[str, str] = {}
    # UNTIMED warm-up sweep over the whole suite first: JVM JIT of
    # Spark's own shuffle/codegen/Arrow machinery is CROSS-query and
    # keeps improving through the first pass of the suite.  Measured
    # (r04 drift root-cause, NOTES.md): the identical 20-query subset
    # in one process ran 20.9 s on the first sweep and 14.6 s on the
    # second — the r03 "+30-50% on unchanged plans" drift was exactly
    # this warm-up cost landing inside the timed window, not a plan
    # regression.  Steady state is what a resident cluster sees and
    # what min-of-3 was already trying to isolate.
    for name in headline:
        try:
            REGISTRY[name].fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # Scheduler-floor calibration (VERDICT r10 task 1a): the host's
    # 1-task job cost has drifted across rounds (~60 ms r05, ~103 ms
    # r07, 257-381 ms r10) and per-query wall is ~ jobs x floor +
    # data time, so job-count-heavy queries inflate 4-10x while
    # scan-bound ones move 1.2-1.4x.  Emitting the measured floor
    # with every run lets cross-round comparisons be normalized
    # mechanically instead of adjudicated by narrative.  min-of-10
    # after the warm-up sweep so JIT is not billed to the floor.
    floor_times = []
    for _ in range(10):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor_times.append(time.perf_counter() - t0)
    job_floor = round(min(floor_times), 4)
    job_floor_median = round(sorted(floor_times)[len(floor_times) // 2], 4)

    # min of 3 runs per query: the steady-state number a resident
    # cluster would see (run 1 pays codegen compilation + broadcast
    # warmup that is per-process, not per-query, cost).  A JVM GC
    # between queries keeps one query's garbage from billing a GC
    # storm to the next (measured: single-query swings of 2-4 s at
    # sf0.1 without it, rotating across the suite run to run).
    per_query: dict[str, float] = {}
    for name in headline:
        if name in errors:
            continue
        fn = REGISTRY[name].fn
        times = []
        # one broken query must never zero the whole bench: record the
        # failure per-query and keep going (round 2 lost its entire
        # BENCH to a single NameError).
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                times.append(time.perf_counter() - t0)
            per_query[name] = round(min(times), 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    total = round(sum(per_query.values()), 3)
    # The headline suite GROWS round over round (r01: 20 queries, r02+:
    # 32, 34, ...).  The recorded BASELINE (BENCH_r01) was the 20-query
    # suite, so the apples-to-apples regression comparator is the
    # subtotal over exactly those 20 names — reported separately so a
    # growing suite never reads as a slowdown.
    r01_suite = [
        "flagship_span_topk", "b03_delay_join", "b04_broadcast_dim_join",
        "b05_time_bucket_agg", "b07_topk_by_aggregate",
        "b10_span_per_group", "b11_latest_per_key",
        "c01b_normalized_neardup", "c02_cosine_topk", "c04_json_extract",
        "b14_asof_join", "b16_rollup_agg", "c06f_minhash_neardup_fast",
        "c07f_simhash_neardup_fast", "q01_pricing_summary",
        "q03_shipping_priority", "q05_local_supplier_volume",
        "q06_forecast_revenue", "c09_ivf_ann", "c05b_image_features",
    ]
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "n_queries": len(per_query),
        "baseline_r01_subset_seconds": round(
            sum(per_query.get(n, 0.0) for n in r01_suite), 3),
        "baseline_r01_subset_n": sum(1 for n in r01_suite if n in per_query),
        "job_floor_seconds": job_floor,
        "job_floor_median_seconds": job_floor_median,
        "queries": per_query,
        "sf": sf,
    }
    try:
        out["streaming"] = _stream_slo(spark)
    except Exception as exc:  # noqa: BLE001
        errors["_streaming"] = f"{type(exc).__name__}: {exc}"[:300]
    # b174 is a STREAMING query (availableNow file stream + foreachBatch
    # sink); it gets one timed end-to-end run here instead of a 4x
    # HEADLINE slot — the number includes source materialization +
    # 3 micro-batches + sink merge (ADVICE r09: it previously had no
    # perf baseline anywhere).
    try:
        t0 = time.perf_counter()
        REGISTRY["b174_streaming_bloom_prefilter"].fn(spark, sf_dir).count()
        out.setdefault("streaming", {})["b174_end_to_end_seconds"] = round(
            time.perf_counter() - t0, 3)
    except Exception as exc:  # noqa: BLE001
        errors["b174_streaming_bloom_prefilter"] = \
            f"{type(exc).__name__}: {exc}"[:300]
    if errors:
        out["errors"] = errors
    if subset:
        out["subset"] = True
        out["subset_names"] = headline
    print(json.dumps(out))
    # Persist the FULL result (including the per-query map) to a repo
    # artifact (r12, VERDICT task 2a): the driver captures only the
    # last ~2000 chars of stdout, so PERF_r11 had per_query {} — the
    # full map printed first never survived the tail capture.  Writing
    # it to a file makes per-query round-over-round data driver- and
    # judge-visible.  Subset runs default to a separate file so an
    # sf1 hot-tail sweep never masquerades as the full suite.
    default_artifact = "BENCH_SUBSET.json" if subset else "BENCH_LAST.json"
    artifact = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     default_artifact))
    try:
        with open(artifact, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:
        print(f"# bench artifact write failed: {exc}")
    # The driver records only the last ~2000 chars of stdout, and the
    # full dump above (out["queries"] has 70+ entries at the front)
    # always overflows that window, truncating the headline totals
    # (BENCH_r04/r05 both landed with "parsed": null).  Emit a compact
    # summary-only JSON as the FINAL line so the tail capture always
    # retains a parseable record of the binding numbers.
    summary = {k: out[k] for k in
               ("metric", "value", "unit", "n_queries",
                "baseline_r01_subset_seconds", "baseline_r01_subset_n",
                "job_floor_seconds", "job_floor_median_seconds",
                "sf") if k in out}
    if "streaming" in out:
        summary["streaming"] = out["streaming"]
    if errors:
        summary["n_errors"] = len(errors)
    print(json.dumps(summary))


def _stream_slo(spark) -> dict:
    """Measured RT micro-batch durations (one file per trigger over the
    GTFS fixture snapshots) vs the reference's 120 s trigger budget
    (gtfs_rt_minutely.py:262).  Round-over-round regression signal for
    the streaming path."""
    import tempfile

    from tests import fixtures_gtfs
    from tp_airflow_gtfs_snowflake_spark.catalog import Warehouse
    from tp_airflow_gtfs_snowflake_spark.streaming.rt_stream import (
        batch_durations, start_bronze_ingest)

    with tempfile.TemporaryDirectory() as td:
        landing = os.path.join(td, "landing")
        os.makedirs(landing)
        for i, s in enumerate(fixtures_gtfs.make_feed_snapshots(5)):
            with open(os.path.join(landing, f"snap_06{i:02d}.json"), "w") as f:
                f.write(s)
        wh = Warehouse(spark, os.path.join(td, "wh"))
        for t in ("trip_updates_raw", "trip_stop_times",
                  "vehicle_positions_raw"):
            wh.create_if_not_exists("bronze", t)
        q = start_bronze_ingest(spark, landing, wh,
                                os.path.join(td, "ckpt"),
                                available_now=True, max_files_per_trigger=1)
        q.awaitTermination(300)
        durs = batch_durations(q)
    return {
        "n_batches": len(durs),
        "batch_seconds_mean": round(sum(durs) / max(len(durs), 1), 3),
        "batch_seconds_max": round(max(durs), 3) if durs else None,
        "slo_trigger_seconds": 120,
    }


if __name__ == "__main__":
    main()
