"""Data-scaling regression tests (`pytest -m scale`, excluded by default).

Promotes the README "Measured scaling" probes into assertions: replicate
the test tables 4-fold key-consistently (tools/scale_probe.replicate — k x
rows -> k x join matches, never k^2) and assert each heavy operator's wall
ratio stays below a recorded bound. A quadratic regression (e.g. a hot key
sneaking past the LSH/stop-shingle gates) shows up as ratio ~= k^2 = 16 and
fails the test instead of a judge's eyeball.

Bounds are deliberately loose vs the recorded ratios (r3 README: 1.3-4.8x
at k=4-10) — they exist to catch complexity-class regressions, not noise.
"""

from __future__ import annotations

import time

import pytest

from mobilitydatalakebenchmark_spark.plans import load_registry

pytestmark = pytest.mark.scale

SF_BASE = "/root/testdata/sf0.01"
K = 4

# query -> max allowed scaled/base wall ratio at K=4 (linear ~= 4 minus
# fixed overhead; quadratic ~= 16)
BOUNDS = {
    "dedup_shared_passages": 8.0,
    "dedup_minhash_lsh_candidates": 8.0,
    "dedup_drop_near_duplicates": 8.0,
    "text_tfidf_keywords": 8.0,
    "vec_nearest_centroid_confusion": 8.0,
    "pagerank_part_supplier": 8.0,
    # round-4/5 join-shaped operators — the newest code is the likeliest
    # to harbor a quadratic: SemDeDup's within-cluster pair join (bounded
    # by the max_cluster_size cap), PQ's codes x broadcast-LUT join,
    # the epoch-bucketed interval-overlap join, and chunk explode+dedup.
    "dedup_semantic_clusters": 8.0,
    "knn_pq_adc_seeded": 8.0,
    "interval_overlap_join": 8.0,
    "text_chunk_overlap": 8.0,
    # round-5: composed pipeline (dedup groupBy + equi-join inside),
    # shard manifest (packing window + rollup), temperature mixture
    # (rates join + keep filter)
    "pipeline_quality_dedup_split": 8.0,
    "pack_shard_manifest": 8.0,
    "sample_temperature_mixture": 8.0,
    # round-6: the recall-floor gate runs brute force + the 8-table LSH
    # (corpus x probes scoring + bucket equi-join — the candidate-join
    # shape that would betray a hot bucket), and the multimodal gate's
    # synthesize->decode kernels must stay linear in rows
    "knn_recall_floor": 8.0,
    "multimodal_decode_stats": 8.0,
    # trip/stop/simplify are window-shaped per entity; the MG sketch must
    # stay one pass + bounded candidates; A-Res is a keyed window top-k
    "trajectory_trip_segments": 8.0,
    "trajectory_stop_detection": 8.0,
    "trajectory_simplify_bounds": 8.0,
    "text_token_topk_sketch": 8.0,
    "sample_weighted_ares": 8.0,
    # round-7: the IVF+PQ gate's encode is n x m x k distance work via
    # the einsum kernel (linear in rows; a quadratic here means the
    # shortlist join exploded), the versioned gate is three commits +
    # two manifest-pruned snapshot reads, the IVM gate's delta rule must
    # stay O(batch . match rate) with the tombstone mask one anti-join
    "knn_pq_recall_floor": 10.0,
    "versioned_snapshot_asof": 8.0,
    "ivm_materialized_join": 8.0,
    # sketch-state gates: one fact shuffle each; a quadratic would mean
    # the exact-comparison side (distinct self-join / rank window)
    # exploded
    "rollup_distinct_sketch": 8.0,
    "rollup_quantile_sketch": 8.0,
    "segment_theta_overlap": 8.0,
    # hotspot: the raw scan collapses to grid cells in one shuffle; the
    # component loop's cost tracks dense-cell count and diameter, not
    # rows, so 4x data must stay near-flat
    "mobility_hotspot_clusters": 8.0,
    # round-7 continuation: BM25's query-time work is |query terms|
    # posting lists (a quadratic means the semi-join stopped pruning);
    # contrastive mining's bucket join is n x (n/B) — 4x data with fixed
    # B=8 is 16x join rows, so the bound rides the join's own growth
    # (the construction holds B ∝ n in production; here we bound the
    # fixed-B gate loosely to catch a full cross join, which would be
    # 64x); k-core peels a 4x arc set through the same 4 rounds; CUSUM/
    # EWMA are single-sort window chains; the diff is one outer join;
    # the GDPR retract must stay O(rollup + touched buckets)
    "bm25_ranked_retrieval": 8.0,
    "contrastive_negative_mining": 24.0,
    "graph_kcore_peel": 8.0,
    "cusum_changepoints": 8.0,
    "ewma_truncated_exact": 8.0,
    "snapshot_diff_report": 8.0,
    "gdpr_retract_rollup": 8.0,
    "graph_label_propagation": 8.0,
    "length_bucketed_batches": 8.0,
    # BPE's 3 unrolled rounds each rescan the (checkpointed) corpus —
    # linear per round; the bloom star join and the minhash rollup are
    # one-shuffle group-bys whose quadratic would mean a join exploded
    "bpe_train_rounds": 8.0,
    "bloom_pruned_star_join": 8.0,
    "minhash_group_rollup": 8.0,
    # round-7 continuation batch: interval islands and the as-of mask
    # are one-keyed-shuffle window chains; URL/normalize dedup are
    # row-linear string algebra into one hash aggregate; phrase match
    # joins only the phrase terms' posting lists (quadratic would mean
    # the anchor group-by exploded); RRF runs both rankers over pruned
    # postings; the decile ntile is one global sort (linear, single
    # partition — the bound watches it staying so); pareto is two
    # windows on one per-flag sort; apportionment is two tiny aggs;
    # bucketized range join explodes intervals by a CONSTANT bucket
    # count; BPE encode rescans the corpus once per round like training
    "interval_coalesce": 8.0,
    "asof_tolerance_lookup": 8.0,
    "url_canonical_dedup": 8.0,
    "text_normalize_dedup": 8.0,
    "retrieval_phrase_match": 8.0,
    "retrieval_rrf_fusion": 8.0,
    "seasonal_hour_profile": 8.0,
    "equidepth_decile_bins": 8.0,
    "pareto_frontier_price_qty": 8.0,
    "budget_apportion_sources": 8.0,
    "range_join_bucketized": 8.0,
    "bpe_encode_corpus": 8.0,
    # privacy/CV/stats additions: one keyed shuffle each (cell, fold,
    # user); the ACF lead-window shares its sort with the moment agg
    "l_diversity_cells": 8.0,
    "group_kfold_assign": 8.0,
    "acf_lag1_per_user": 8.0,
    # hierarchy: 4 bounded equi-joins (quadratic would mean a join key
    # collapsed); weighted median and Benford are one sort / one agg
    "hierarchy_ancestors": 8.0,
    "weighted_median_price": 8.0,
    "benford_first_digit": 8.0,
    # observability gates: gini's rank window runs on the per-key count
    # table (keys, not rows); the cardinality gate's actual-join side
    # grows with match count — k-consistent replication makes that k^2
    # per shared key (k x A-rows matching k x B-rows), so its bound
    # rides the join's own quadratic growth at 16 plus overhead slack
    "skew_gini_report": 8.0,
    "join_cardinality_estimate": 40.0,
    # hybrid retrieval: BM25's pruned posting joins + one brute-force
    # vector scan per probe + a topk-sized fuse — all linear in rows
    "retrieval_hybrid_text_vector": 8.0,
    # drift: two map-side-combined conditional counts over one scan
    "drift_chi2_event_mix": 8.0,
    # JL projection is pure per-row folds (zero shuffle before the output
    # sort); nucleus is one explode+group-by with a vocab-sized window
    "vec_random_projection_jl": 8.0,
    "vocab_nucleus_topp": 8.0,
    # dwell/teleport: one entity-keyed window + aggregate each
    "mobility_dwell_time": 8.0,
    "trajectory_teleport_clean": 8.0,
    # PIT join: dim build is one keyed window; the containment join's
    # matches grow k^2 under k-consistent replication (k x facts x k x
    # intervals per user) like the cardinality gate — bound rides that
    "scd2_point_in_time_join": 40.0,
    # collocation: the pair self-join is positional (one match per
    # adjacent slot — linear), min-count prunes before the stat joins;
    # winsorized stats is one per-flag sort shared by three windows
    "text_collocation_lift": 8.0,
    "robust_winsorized_stats": 8.0,
    # round-8 write-path gates: the streaming maintainers pay a FIXED
    # per-epoch cost (3 epochs either way) plus O(batch + touched
    # buckets) merge work — 4x data through the same 3 epochs must stay
    # ~linear; a quadratic would mean a maintainer re-reads history
    # instead of touched partitions
    "streaming_islands_maintainer": 8.0,
    "streaming_pareto_maintainer": 8.0,
    "streaming_rollup_maintainer": 8.0,
    "streaming_versioned_commits": 8.0,
    # persisted ANN: build/append are one assignment pass each (numpy
    # argmax / broadcast argmax), probe reads nprobe/k of the lists —
    # all linear in corpus rows
    "knn_persisted_index_probe": 8.0,
    # compaction rewrites the snapshot once (linear); schema evolution
    # is two commits + one merged-footer aggregate; the bucketed join
    # is write-once bucketing + an Exchange-free SMJ; countmin is one
    # explode(x3) into a bounded-width shuffle + broadcast estimates
    "versioned_compact_rewrite": 8.0,
    "versioned_schema_evolution": 8.0,
    "bucketed_join_colocated": 8.0,
    "countmin_frequency_estimates": 8.0,
    # round-9: the streaming CMS maintainer merges a SKETCH-sized table
    # per epoch (3 epochs either way — only the per-epoch build grows
    # with data); the stateful CUSUM stream is one state pass over 3
    # seq-range batches; substring spans is the no-pair-join dedup
    # (explode -> hash count -> semi-join -> per-doc window, linear in
    # corpus tokens BY CONSTRUCTION — a quadratic would mean a pair
    # join crept back in); classifier inference is explode + broadcast
    # join + one keyed sum; filtered ANN adds a predicate to the same
    # candidate-join shape as knn_ivf_seeded
    # stream-stream join: symmetric hash-join state is watermark-
    # bounded; 4x data through the same 3 epochs grows matches ~k
    # (k-consistent replication multiplies per-user purchase x click
    # pairs k^2 inside the 12h bound -> ride that growth loosely);
    # streaming LSH emits one pair per co-bucketed predecessor — the
    # stop-gate is bucket geometry, as in the batch twin
    "stream_stream_interval_join": 40.0,
    # native watermarked window agg: state = open windows (bounded by
    # the watermark horizon); native streaming dedup state grows with
    # distinct keys (linear); substring REMOVAL adds one doc-keyed
    # window over the spans table to the spans plan; partition
    # evolution is two commits + one unioned snapshot aggregate
    "streaming_native_window_counts": 8.0,
    "streaming_late_data_window": 8.0,
    "streaming_dedup_exactly_once": 8.0,
    "dedup_substring_removal": 8.0,
    "versioned_partition_evolution": 8.0,
    "streaming_lsh_dedup_candidates": 8.0,
    "streaming_countmin_maintainer": 8.0,
    "streaming_cusum_maintainer": 8.0,
    # EWMA emits per ROW (4x rows -> 4x sink writes, still linear);
    # MG state is n_counters per shard forever (only the recount
    # grows); A-Res state is k pairs per group forever
    "streaming_ewma_maintainer": 8.0,
    "streaming_heavy_hitters_topk": 8.0,
    "streaming_ares_reservoir": 8.0,
    "dedup_substring_spans": 8.0,
    "knn_ivf_filtered": 8.0,
    # BFS: shuffle count ∝ diameter (k-consistent replication keeps the
    # folded node space and thus the diameter fixed; each level's join
    # grows ~k); streaming sessions: state = open sessions per user;
    # forward fill: one user_id window shuffle; sequence regex: per-user
    # path grows ~k, regex scan is linear in path length
    "graph_bfs_hops": 8.0,
    "streaming_session_native": 8.0,
    "ts_forward_fill": 8.0,
    "event_sequence_regex": 8.0,
    # basket self-join is bounded-quadratic PER BASKET (k-consistent
    # replication grows baskets, so pairs grow ~k^2 within the ≤7-item
    # bound — ride that loosely); RLE streaks: one user_id shuffle
    "assoc_rules_pairs": 40.0,
    "event_rle_streaks": 8.0,
    # ER: window leads inside blocks — zero joins, linear; attribution:
    # one user_id window shuffle, linear
    "er_sorted_neighborhood": 8.0,
    "attribution_last_touch": 8.0,
    # Bellman-Ford: shuffle count ∝ rounds (fixed 4), per-round join
    # grows ~k on the fixed folded node space
    "graph_bellman_ford": 8.0,
    # calibration reuses the linear inference plan + one bounded groupBy
    "classifier_calibration_bins": 8.0,
    # streaming IVM: per-epoch cost ∝ |batch| × match rate (k-consistent
    # replication grows matches ~k per arrival — ride loosely)
    "streaming_ivm_join_maintainer": 40.0,
    # shard export: per-batch cost O(batch + touched shards)
    "streaming_shard_export": 8.0,
    # ANN ingest: per-batch cost ∝ batch (frozen-centroid assign) + one
    # id-table anti-scan; probe reads nprobe/k of the lists
    "streaming_ann_index_ingest": 8.0,
    # late-r9 depth: Hampel is one window sort per entity with O(W log W)
    # per-row array work (W fixed at 11); the seasonal profile's window
    # runs over the POST-rollup hourly series (bucket count is fixed by
    # the calendar, not row count — near-flat); bootstrap is reps x rows
    # explode into a 32-row map-side-combined groupBy (linear); nDCG
    # reuses the linear BM25 plan + a |queries| x k tail
    "hampel_outlier_filter": 8.0,
    "seasonal_decompose_additive": 8.0,
    "bootstrap_ci_mean": 8.0,
    "retrieval_ndcg_eval": 8.0,
    # fasttext inference: one gram explode + broadcast weight join +
    # map-side-combined per-doc sum — the r9 rebalance must keep it
    # linear, never single-core
    "fasttext_quality_inference": 8.0,
    # nonparametric tests: one per-value collapse shuffle; the running-
    # sum window rides DISTINCT values (k-consistent replication grows
    # counts, not cardinality — near-flat)
    "drift_ks_value_shift": 8.0,
    "rank_auc_mann_whitney": 8.0,
    # direct CC gate: pointer-doubling rounds ∝ log(diameter); k-fold
    # replication grows edges ~k on a bounded fold space
    "graph_connected_components": 8.0,
    # time-decay attribution: lookback-bounded day-bucket equi-join
    "attribution_time_decay": 8.0,
    # KM: one user collapse + a calendar-bounded step table
    "retention_kaplan_meier": 8.0,
    # business-analytics depth: RFM and ABC collapse facts to a dim in
    # one shuffle, then rank the DIM (grows ~k — the bound watches the
    # global window staying a sort, not a join); PoP is a tiny month-dim
    # self-join; gap detection explodes a span-bounded grid per user
    # (users grow ~k, spans fixed)
    "rfm_segmentation": 8.0,
    "abc_pareto_class": 8.0,
    "period_over_period_revenue": 8.0,
    "ts_gap_detection": 8.0,
    # Theil-Sen: the pair join is quadratic per ENTITY, linear in
    # entities — k-consistent replication adds users, never points per
    # user, so 4x data must stay ~4x pairs; a hot-entity regression
    # shows up as 16x
    "theil_sen_slope": 8.0,
    # Hamming top-k: 5 fixed queries x k-grown corpus — one scan, one
    # rank window on a query-bounded score table
    "vec_hamming_topk": 8.0,
    # RA link prediction: same bounded within-basket self-join as
    # assoc_rules (pairs grow ~k^2 inside the ≤7-item basket bound —
    # ride that loosely like assoc_rules_pairs)
    "graph_link_prediction_ra": 40.0,
    # LOO encoding: one category rollup + a broadcast join back — two
    # map-side passes, zero extra shuffles
    "target_encoding_loo": 8.0,
    # quantile normalization: two dim-sized rank windows + a dense-
    # integer rank equi-join; hashing audit: one vocabulary collapse +
    # a 1024-key rollup; funnel latency: per-user collapse + a user-
    # keyed join (k-consistent replication keeps per-user matches
    # fixed); DiD: one conditional aggregation, zero joins
    "quantile_normalization": 8.0,
    "feature_hash_collisions": 8.0,
    "funnel_time_to_convert": 8.0,
    "experiment_diff_in_diff": 8.0,
    # Matryoshka eval: two brute passes over 5 fixed probes x k-grown
    # corpus (linear scans + per-probe rank windows); novelty/drift are
    # vocabulary-sized shuffles (explode -> keyed agg -> join back);
    # Bloom FPR explodes k=3 bits per key into a distinct + semi-join,
    # filter table bounded by m
    "vec_matryoshka_recall": 8.0,
    "text_ngram_novelty": 8.0,
    "text_vocab_drift": 8.0,
    "bloom_filter_fpr": 8.0,
    # Markov eval: one user window + vocabulary rollup + broadcast
    # model join; Flesch is map-side string algebra; source overlap is
    # a within-shingle self-join whose pair fanout is |sources|^2 per
    # shingle (source count fixed under replication -> ~k); the kNN
    # graph's pair table is capped by the fixed 256-node probe panel
    # (TakeOrdered + broadcast nested-loop) — near-constant beyond the
    # cap, so the ordinary linear bound applies
    "markov_accuracy": 8.0,
    "text_readability_flesch": 8.0,
    "source_overlap_matrix": 8.0,
    "knn_graph_reciprocity": 6.0,
    # delta audit: one user window + <=64-key rollup; FIFO: one window
    # per side + a ~diagonal per-key range join (k-consistent
    # replication adds parts, lots per part fixed); LTV: user collapse
    # + broadcast cohort join + calendar-bounded rollup; CSV: write +
    # line-splittable scan, both linear
    "delta_bitwidth_histogram": 8.0,
    "fifo_lot_allocation": 8.0,
    "cohort_ltv_curve": 8.0,
    "csv_roundtrip_scan": 8.0,
    # format/layout gates: write + splittable re-scan each (linear);
    # the partitioned gate's read side must stay ~flat (3 pruned days
    # either way — only the write grows); NULL matrix is one scan +
    # one distinct
    "jsonl_roundtrip_scan": 8.0,
    "orc_roundtrip_scan": 8.0,
    "partitioned_write_prune": 8.0,
    "null_semantics_matrix": 8.0,
    # R²: one user window + one moment rollup (the slope gate's shape);
    # truncation/heatmap: map-side expressions into bounded rollups;
    # join matrix: six hash joins whose match counts grow ~k under
    # key-consistent replication
    "linreg_r2_per_entity": 8.0,
    "truncation_loss_report": 8.0,
    "dow_hour_heatmap": 8.0,
    "join_type_matrix": 8.0,
    # window matrix: one partitioned sort feeding every function (the
    # user_id<5 slice is fixed — near-flat); SLA: one orderkey
    # co-partitioned join + 5-key rollup; completion: one user window
    # with three running maxes; canonical selection: one hash-group
    # shuffle + one window
    "window_function_matrix": 8.0,
    "sla_shipment_report": 8.0,
    "multi_event_completion": 8.0,
    "dedup_canonical_selection": 8.0,
    # modularity: bounded within-basket edge join (pairs grow ~k^2
    # inside the ≤7-item bound like assoc_rules — ride loosely) + two
    # keyed rollups; MinHash audit: signature build + adjacent-pair
    # join; Spearman: fact collapse + dim rank windows; Fano: two
    # keyed rollups
    "graph_brand_modularity": 40.0,
    "minhash_error_audit": 8.0,
    "spearman_revenue_quantity": 8.0,
    "event_burstiness_fano": 8.0,
    # MASE: one rollup + a two-lag user window; null trap: dim-sized
    # subquery scans; langid confusion: one marker-intersection scan +
    # bounded rollup; SMA: one user window with two running sums
    "forecast_mase_seasonal_naive": 8.0,
    "not_in_null_trap": 8.0,
    "langid_confusion_matrix": 8.0,
    "sma_crossover_signals": 8.0,
    # r10 depth: WAU is a bounded 7x explode into hash rollups; moments/
    # division/profile are map-side aggregations; business days one
    # equi-join; null ordering + MAD are dim-/type-keyed window sorts;
    # hapax one (source, token) rollup; quantization error a bounded
    # 64x posexplode + broadcast join — all linear
    "rolling_wau_7d": 8.0,
    "moment_stats_per_type": 8.0,
    "business_days_to_ship": 8.0,
    "integer_division_semantics": 8.0,
    "null_ordering_rank": 8.0,
    "mad_robust_scale": 8.0,
    "column_cardinality_profile": 8.0,
    "text_hapax_ratio": 8.0,
    "vec_quantization_error": 8.0,
    # r10 continuation: bounce rides one user window + two rollups;
    # OHLC one (type, hour) window; assortativity the bounded basket
    # edge join (modularity's shape, matches grow ~k); parent share one
    # fact rollup; reach two hash aggs + a day-table window; MRR rides
    # the postings equi-joins
    "session_bounce_rate": 8.0,
    "ts_resample_ohlc": 8.0,
    "graph_degree_assortativity": 40.0,
    "ratio_to_parent_share": 8.0,
    "cumulative_reach_daily": 8.0,
    "retrieval_mrr_eval": 8.0,
}


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    from tools.scale_probe import replicate

    out = str(tmp_path_factory.mktemp("scale") / f"{K}x")
    replicate(spark, SF_BASE, out, K)
    return out


def _wall(registry, name, spark, sf_dir) -> float:
    best = float("inf")
    for _ in range(2):  # min of 2: drop JIT/listing noise
        t0 = time.time()
        registry[name].spark(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.time() - t0)
    return best


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_wall_ratio_stays_sublinear(name, spark, scaled_dir):
    registry = load_registry()
    base = _wall(registry, name, spark, SF_BASE)
    scaled = _wall(registry, name, spark, scaled_dir)
    ratio = scaled / max(base, 1e-9)
    assert ratio < BOUNDS[name], (
        f"{name}: {K}x data -> {ratio:.1f}x wall (base {base:.2f}s, "
        f"scaled {scaled:.2f}s) exceeds bound {BOUNDS[name]}"
    )
