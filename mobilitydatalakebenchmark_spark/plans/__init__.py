"""Query registry: every SURVEY.md §2 operator exposed as a named query over
the driver test tables, with a DuckDB-oracle SQL twin (the t2 gate)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Q:
    """One gate entry: a Spark implementation and (when SQL-expressible) the
    equivalent DuckDB SQL over the same parquet views. ``oracle=None`` means
    the driver records a weaker rows-only check."""

    spark: SparkQuery
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = Q(spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# Gates the external driver has hash-verified, grouped by the round of
# their most recent verdict (the driver checks the FIRST 50 registry
# entries each round). The window runs as a STALENESS ROTATION: brand-new
# / redefined gates first (they need a first verdict on current
# semantics), then gates whose code changed after their last driver
# check, then oldest-verified-first re-verification. Every gate is
# oracle-checked locally by tools/check_oracle.py each round regardless;
# the ordering only decides which subset gets this round's independent
# driver verdict. Gates re-verified in a later window GRADUATE out of
# their old block, so each name appears exactly once, under its
# freshest verdict.
# The r11 window: flagship + the final 38-gate backlog drain (the four
# remaining never-driver-verified streaming WRITE paths first, then
# format/layout, then the depth remainder), then the 11 code-touched
# re-checks fill to 50 — estimated ~85 s sf0.01 wall from the r10
# ORACLE secs. NOTE for r12: ORACLE_r11.json's secs were measured
# while the exact sweeps ran CONCURRENTLY, inflating window_report's
# estimate to ~95 s; interleaved idle-box re-measurement of the two
# biggest movers (streaming_ivm_join_maintainer, streaming_session_
# native) showed pre/post-change parity — expect the driver's warm
# sequential window to land near r10's ratio (~0.8x of estimate).
# r4 verdicts (CORRECTNESS_r04.json) still freshest:
DRIVER_VERIFIED_R4 = (
    "path_trigrams_topk",
    "session_window_native", "graph_triangle_count", "s1_scan_order_limit",
)
# r5 verdicts (CORRECTNESS_r05.json) still freshest:
DRIVER_VERIFIED_R5 = (
    "dedup_semantic_clusters",
    "text_perplexity_buckets_sketch", "vec_covariance_matrix_gram",
    "text_gopher_quality",
    "pack_shard_manifest", "sample_temperature_mixture",
    "dedup_ngram_jaccard", "dedup_shared_passages", "knn_ivf_seeded",
    "f1_point_lookup", "f2_in_list", "f9_first_match", "j1_doc_feature_join",
    "j4_snowflake_revenue", "j6_three_table_lookup", "j7_semi_existing_keys",
    "f4_anti_novelty", "a4_zonemap_minmax", "a6_distinct_keys",
    "a9_first_seen_dedup", "p14_hashcons_dim", "p18_surrogate_keys",
    "p6_direction_roundtrip", "o3_union_append", "setop_intersect_except",
    "agg_rollup_status", "agg_pivot_manual", "a7_counts",
    "tpch_q3_style_topn", "scalar_subquery_above_avg",
    "correlated_exists_sql", "grouping_sets_cube",
    "tpch_q5_style_regional_revenue", "tpch_q7_style_nation_volume",
    "tpch_q10_style_returns_topn", "tpch_q14_style_promo_revenue",
    "tpch_q16_style_supplier_variety", "tpch_q17_style_small_qty_revenue",
    "tpch_q18_style_large_orders", "correlated_not_exists_sql",
    "tpch_q15_style_top_supplier", "tpch_q6_style_forecast_revenue",
    "tpch_q8_style_market_share",
    "tpch_q11_style_balance_share", "tpch_q13_style_order_distribution",
    "tpch_q19_style_disjunctive_revenue", "tpch_q20_style_nested_in",
)
# r6 verdicts (CORRECTNESS_r06.json, 49/50 hash-matched — the freshest;
# graduated here from their old blocks: all 8 r1-r2 gates, the first 28
# r3 gates, 5 code-touched r4 gates, flagship + pipeline from r5, and
# the 6 green first-verdict r6 gates. trajectory_trip_segments — the
# round's one red row — stays OUT until its post-fix r7 verdict):
DRIVER_VERIFIED_R6 = (
    "knn_recall_floor",
    "multimodal_decode_stats", "trajectory_stop_detection",
    "trajectory_simplify_bounds", "text_token_topk_sketch",
    "sample_weighted_ares", "pipeline_quality_dedup_split",
    "vec_covariance_matrix", "knn_bruteforce_cosine", "knn_ivf",
    "knn_lsh_multiprobe", "vec_nearest_centroid_confusion",
    "tpch_q2_style_min_cost_supplier", "tpch_q4_style_priority_exists",
    "tpch_q12_style_priority_by_flag", "tpch_q21_style_sole_late_supplier",
    "tpch_q22_style_idle_balance", "w1_tumbling_hour",
    "a5_batch_range_bounds", "w3_asof_lookup",
    "a1_entity_sequences",
    "asof_join_purchases_clicks", "co_location_contacts", "cohort_retention",
    "date_functions", "dedup_exact_hash", "dedup_minhash_lsh_candidates",
    "dedup_minhash_signatures", "event_transition_matrix",
    "f6_temporal_containment", "funnel_conversion", "json_props_extract",
    "json_variant_extract", "k_anonymity_cells",
    "mobility_frequent_locations", "mobility_location_entropy",
    "mobility_radius_of_gyration", "od_matrix_trips",
    "p11_fixed_point_roundtrip", "p12_cantor_pairing", "p15_wkt_points",
    "p4_json_doc_build", "pii_detect_counts", "pii_scrub_stats",
    "proximity_grid_join", "quantiles_exact", "range_join_value_tiers",
)
# r7 verdicts (CORRECTNESS_r07.json, the 32 hash-matched rows of the
# 50-gate window; the other 18 rows were value-correct but red on the
# oracle HUGEINT type bug, re-entered the r8 window post-fix and
# graduated to R8. flagship graduated onward to R8):
DRIVER_VERIFIED_R7 = (
    "knn_pq_recall_floor",
    "rollup_distinct_sketch", "rollup_quantile_sketch",
    "segment_theta_overlap", "mobility_hotspot_clusters",
    "zorder_morton_key", "bm25_ranked_retrieval",
    "contrastive_negative_mining", "snapshot_diff_report",
    "bpe_train_rounds", "graph_label_propagation", "minhash_group_rollup",
    "url_canonical_dedup", "retrieval_phrase_match", "retrieval_rrf_fusion",
    "text_normalize_dedup", "seasonal_hour_profile",
    "equidepth_decile_bins", "asof_tolerance_lookup",
    "pareto_frontier_price_qty", "bpe_encode_corpus", "l_diversity_cells",
    "group_kfold_assign", "acf_lag1_per_user", "hierarchy_ancestors",
    "weighted_median_price", "benford_first_digit",
    "retrieval_hybrid_text_vector", "drift_chi2_event_mix",
    "vec_random_projection_jl", "scd2_point_in_time_join",
)
# r8 verdicts (CORRECTNESS_r08.json — the first 50/50-green window: the
# 18 post-HUGEINT-fix re-verdicts, the two r7-continuation gates, the 9
# new r8 gates, the code-touched pair, the full 17-gate r3 residue, and
# sketch_percentiles; flagship graduated here from R7):
DRIVER_VERIFIED_R8 = (
    "trajectory_trip_segments",
    "versioned_snapshot_asof", "ivm_materialized_join",
    "skew_salted_sum", "cusum_changepoints", "ewma_truncated_exact",
    "graph_kcore_peel", "gdpr_retract_rollup",
    "length_bucketed_batches", "bloom_pruned_star_join",
    "interval_coalesce", "range_join_bucketized",
    "budget_apportion_sources", "skew_gini_report",
    "join_cardinality_estimate", "vocab_nucleus_topp",
    "mobility_dwell_time", "trajectory_teleport_clean",
    "text_collocation_lift", "robust_winsorized_stats",
    "streaming_islands_maintainer", "streaming_pareto_maintainer",
    "streaming_rollup_maintainer", "streaming_versioned_commits",
    "knn_persisted_index_probe", "bucketed_join_colocated",
    "tpch_q9_style_nation_profit",
    "anomaly_zscore_outliers", "ranking_suite", "resample_linear_grid",
    "rollup_hourly_to_daily", "running_totals", "sample_corpus_mixture",
    "scd2_state_intervals", "spatial_tile_pyramid",
    "text_lang_distribution", "text_line_repetition", "text_stats",
    "text_unigram_logprob", "topk_per_group", "trajectory_step_metrics",
    "url_domain_topk", "velocity_dim_build", "w5_sessionize",
    "window_range_frames", "sketch_percentiles",
)
# r9 verdicts (CORRECTNESS_r09.json — 50/50 green: flagship, the five
# streaming maintainer first-verdicts, the r9 depth trio, the three
# code-touched r8 gates, and the 38-gate r4 residue; graduated here
# from their old blocks):
DRIVER_VERIFIED_R9 = (
    "streaming_countmin_maintainer",
    "streaming_cusum_maintainer", "streaming_ewma_maintainer",
    "streaming_heavy_hitters_topk", "streaming_ares_reservoir",
    "dedup_substring_spans", "fasttext_quality_inference",
    "knn_ivf_filtered", "countmin_frequency_estimates",
    "versioned_compact_rewrite", "versioned_schema_evolution",
    "approx_distinct_users", "knn_pq_adc_seeded", "text_chunk_overlap",
    "text_zipf_slope", "text_perplexity_buckets",
    "interval_overlap_join", "dedup_minhash_verified",
    "text_fingerprint", "text_token_topk", "text_langid",
    "dedup_simhash", "text_quality_score", "dedup_simhash_md5",
    "dedup_drop_near_duplicates", "dedup_edit_distance",
    "text_repetition_dup_ngrams", "text_df_idf", "text_tfidf_keywords",
    "sample_hash_split", "sample_deterministic_strata",
    "pack_sequences_contiguous", "contamination_check", "vec_norms",
    "vec_label_centroids", "vec_lsh_buckets", "vec_neardup_pairs_numpy",
    "vec_neardup_pairs", "vec_nearest_centroid_confusion_numpy",
    "cdc_upsert_latest_wins", "hist_equiwidth_price",
    "linreg_trend_per_entity", "vec_int8_quantization",
    "point_in_polygon_convex", "pagerank_part_supplier",
    "time_weighted_avg", "hopping_window_2h_1h", "unpivot_measures",
    "dq_check_suite",
)
# r10 verdicts (CORRECTNESS_r10.json — 50/50 green: flagship, the four
# streaming write-path first-verdicts (incl. the watermark late-data
# gate), the ten r10 code-touched gates, and the 35-gate backlog slice;
# flagship graduated here from R9):
DRIVER_VERIFIED_R10 = (
    "flagship_pricing_summary", "streaming_late_data_window",
    "streaming_lsh_dedup_candidates", "streaming_native_window_counts",
    "streaming_dedup_exactly_once", "rfm_segmentation",
    "quantile_normalization", "experiment_diff_in_diff",
    "bloom_filter_fpr", "knn_graph_reciprocity", "csv_roundtrip_scan",
    "window_function_matrix", "graph_brand_modularity",
    "forecast_mase_seasonal_naive", "not_in_null_trap",
    "dedup_substring_removal", "versioned_partition_evolution",
    "graph_bfs_hops", "ts_forward_fill", "event_sequence_regex",
    "assoc_rules_pairs", "event_rle_streaks", "er_sorted_neighborhood",
    "attribution_last_touch", "graph_bellman_ford",
    "classifier_calibration_bins", "hampel_outlier_filter",
    "seasonal_decompose_additive", "bootstrap_ci_mean",
    "retrieval_ndcg_eval", "drift_ks_value_shift",
    "rank_auc_mann_whitney", "attribution_time_decay",
    "retention_kaplan_meier", "abc_pareto_class",
    "period_over_period_revenue", "ts_gap_detection", "theil_sen_slope",
    "vec_hamming_topk", "graph_link_prediction_ra",
    "target_encoding_loo", "feature_hash_collisions",
    "funnel_time_to_convert", "vec_matryoshka_recall",
    "text_ngram_novelty", "text_vocab_drift", "markov_accuracy",
    "text_readability_flesch", "source_overlap_matrix",
    "delta_bitwidth_histogram",
)
DRIVER_VERIFIED = tuple(
    dict.fromkeys(
        DRIVER_VERIFIED_R4
        + DRIVER_VERIFIED_R5
        + DRIVER_VERIFIED_R6
        + DRIVER_VERIFIED_R7
        + DRIVER_VERIFIED_R8
        + DRIVER_VERIFIED_R9
        + DRIVER_VERIFIED_R10
    )
)

# The declared r11 window prefix (after flagship): the maintained
# deferral order for the final backlog drain. Module-level so
# tests/test_entry_contract.py can pin the honesty invariant — the
# first-50 registry window must equal flagship + this tuple + the
# oldest-verified rotation, with every never-driver-verified gate
# either in the window or explicitly listed in WINDOW_DEFERRED.
WINDOW_NEWEST = (
    # the four remaining never-driver-verified streaming WRITE
    # paths (~47 s of the budget)
    "stream_stream_interval_join",
    "streaming_session_native", "streaming_ivm_join_maintainer",
    "streaming_shard_export",
    # format / layout gates
    "jsonl_roundtrip_scan", "orc_roundtrip_scan",
    "partitioned_write_prune",
    # depth remainder in maintained order
    "graph_connected_components",
    "fifo_lot_allocation", "cohort_ltv_curve",
    "null_semantics_matrix",
    "linreg_r2_per_entity", "truncation_loss_report",
    "dow_hour_heatmap", "join_type_matrix",
    "sla_shipment_report", "multi_event_completion",
    "dedup_canonical_selection", "minhash_error_audit",
    "spearman_revenue_quantity", "event_burstiness_fano",
    "langid_confusion_matrix", "sma_crossover_signals",
    "rolling_wau_7d", "moment_stats_per_type",
    "business_days_to_ship", "integer_division_semantics",
    "null_ordering_rank", "mad_robust_scale",
    "column_cardinality_profile", "text_hapax_ratio",
    "vec_quantization_error",
    "session_bounce_rate", "ts_resample_ohlc",
    "graph_degree_assortativity", "ratio_to_parent_share",
    "cumulative_reach_daily", "retrieval_mrr_eval",
)
# First-verdict gates DEFERRED past the r11 window purely on wall
# budget. streaming_ann_index_ingest is oracle-checked locally at
# sf0.01 AND sf0.1 every freeze (ORACLE_r* artifacts) and leads the
# r12 window.
WINDOW_DEFERRED = (
    "streaming_ann_index_ingest",
)
# Gates whose plan/operator code changed AFTER their last driver
# verdict — inserted into the window right after WINDOW_NEWEST, before
# merely-old re-verifies. r11: w5_sessionize's gap compare moved from
# floored seconds to microsecond-exact (ADVICE r10); the three
# {df}-parameterized SQL retrofits (VERDICT r10 item 3); and the
# degenerate-sweep convention pins whose gate DEFINITION changed
# (divide-by-zero NULL guards, empty-grand-total HAVING, NULL-cascade
# coalesces, phantom-NULL-seed filters). Window capacity caps the list
# at 11; the remaining definition-touched gates carry over to LEAD the
# r12 rotation (every one re-verified locally at sf0.001/0.01/0.1 AND
# on the 0-row and 1-row twins this round): bpe_train_rounds
# (sentinel-round oracle filter), graph_bellman_ford (same phantom-seed
# filter as graph_bfs_hops, which IS rechecked below), and the
# singleton-sweep convention pins — hist_equiwidth_price,
# drift_chi2_event_mix, drift_ks_value_shift, rank_auc_mann_whitney,
# text_vocab_drift, bootstrap_ci_mean, knn_ivf,
# knn_persisted_index_probe, knn_pq_recall_floor, knn_recall_floor,
# streaming_versioned_commits, trajectory_simplify_bounds. Inert
# driver-side guards (early returns on empty input, never taken on
# real data) do not redefine a gate and keep their standing verdicts.
WINDOW_CODE_TOUCHED = (
    "w5_sessionize",
    "scalar_subquery_above_avg",
    "correlated_exists_sql",
    "correlated_not_exists_sql",
    "bloom_filter_fpr",
    "knn_graph_reciprocity",
    "agg_rollup_status",
    "grouping_sets_cube",
    "dq_check_suite",
    "text_perplexity_buckets_sketch",
    "graph_bfs_hops",
)


def load_registry() -> dict[str, Q]:
    """Import all query modules (side-effect: fills REGISTRY), then order
    entries for the driver's 50-gate window: flagship first, then gates
    needing a first verdict on current semantics, then the staleness
    rotation (code-touched before oldest-verified)."""
    from . import relational  # noqa: F401
    from . import tpch  # noqa: F401
    from . import windows  # noqa: F401
    from . import mobility  # noqa: F401
    from . import text  # noqa: F401
    from . import vectors  # noqa: F401
    from . import advanced  # noqa: F401
    from . import curation  # noqa: F401

    # Round 11: finish draining the first-verdict backlog (VERDICT r10
    # item 1 — "drain to ≤~5 never-verified, near-zero new gates").
    # Window = flagship + 38 of the 39 backlog gates in the maintained
    # order (streaming write paths first, then format/layout, then the
    # depth remainder), then ~11 oldest-verified re-checks fill to 50.
    # Estimated sf0.01 wall ≈ 85 s (< 90): the four streaming write
    # gates cost 47 s; only streaming_ann_index_ingest (26.8 s — the
    # single most expensive gate) defers to r12 to stay under budget.
    newest = WINDOW_NEWEST
    deferred = WINDOW_DEFERRED
    # Gates whose plan/operator code changed AFTER their last driver
    # check — rechecked before merely-old gates (session_bounce_rate got
    # the same microsecond fix as w5 but is already first-verdict in
    # `newest`).
    code_touched = WINDOW_CODE_TOUCHED
    ordered = {"flagship_pricing_summary": REGISTRY["flagship_pricing_summary"]}
    for name in newest + code_touched:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    # staleness rotation: anything never driver-verified first (brand-new
    # gates are already placed via `newest`; `deferred` waits for the
    # next round's window), then oldest verdicts first
    for name, q in REGISTRY.items():
        if (
            name not in DRIVER_VERIFIED
            and name not in ordered
            and name not in deferred
        ):
            ordered[name] = q
    for block in (
        DRIVER_VERIFIED_R4,
        DRIVER_VERIFIED_R5,
        DRIVER_VERIFIED_R6,
        DRIVER_VERIFIED_R7,
        DRIVER_VERIFIED_R8,
        DRIVER_VERIFIED_R9,
        DRIVER_VERIFIED_R10,
    ):
        for name in block:
            if name in REGISTRY and name not in ordered:
                ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():  # safety net: anything unlisted
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
