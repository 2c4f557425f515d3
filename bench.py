"""Benchmark harness — one JSON line with per-query wall times.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is fully
materialized via the noop sink (no driver collect cost, no result-size
bias). Prints exactly one JSON line:
{"metric": "...", "value": <total_sec>, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mobilitydatalakebenchmark_spark.plans import load_registry
from mobilitydatalakebenchmark_spark.session import get_spark

HEADLINE = [
    "flagship_pricing_summary",
    "tpch_q5_style_regional_revenue",
    "tpch_q18_style_large_orders",
    "j4_snowflake_revenue",
    "a4_zonemap_minmax",
    "a1_entity_sequences",
    "w1_tumbling_hour",
    "w3_asof_lookup",
    "w5_sessionize",
    "topk_per_group",
    "running_totals",
    "dedup_exact_hash",
    "dedup_minhash_lsh_candidates",
    "knn_bruteforce_cosine",
    "vec_neardup_pairs_numpy",
    "vec_nearest_centroid_confusion",
    "text_stats",
    "text_token_topk",
    "text_tfidf_keywords",
    "cohort_retention",
    # round-4/5 LLM-pipeline layer (added r5 so regressions are watched;
    # the 20 entries above stay fixed for cross-round trend continuity)
    "knn_pq_adc_seeded",
    "dedup_semantic_clusters",
    "text_chunk_overlap",
    "interval_overlap_join",
    "vec_covariance_matrix_gram",
    # round-5 pipeline layer
    "pipeline_quality_dedup_split",
    "text_gopher_quality",
    "sample_temperature_mixture",
    "pack_shard_manifest",
    # round-6 additions
    "knn_recall_floor",
    "multimodal_decode_stats",
    "trajectory_trip_segments",
    "text_token_topk_sketch",
    # round-7 additions (versioned_snapshot_asof: 3 commits + 2 time-
    # travel reads — the cheapest write-path watch). The other r7 gates
    # stay off the watch list deliberately: knn_pq_recall_floor and
    # ivm_materialized_join are index-build / store-build workloads
    # (~10s each at sf0.1) that would triple the bench wall without
    # adding trend signal — their walls are recorded per-round in
    # ORACLE_r{N}.json (secs field) and tools/ann_recall.py instead.
    "versioned_snapshot_asof",
    # round-7 continuation watch entries (sub-2s each at sf0.1). The
    # heavier continuation gates stay off for the same reason as above:
    # bm25_ranked_retrieval (~4s: 3 corpus passes incl. two broadcast-
    # build jobs), graph_kcore_peel (~5s: 4 eagerly-checkpointed peel
    # rounds), bpe_train_rounds (~9s: 3 unrolled training rounds) — all
    # recorded per-round in ORACLE_r{N}.json secs.
    "cusum_changepoints",
    "snapshot_diff_report",
    "gdpr_retract_rollup",
    # round-7 continuation batch watch entries (each ~1s spark-side at
    # sf0.1). Off the list for cost, recorded in ORACLE_r{N}.json secs:
    # retrieval_rrf_fusion (runs BM25 AND the overlap ranker),
    # bpe_encode_corpus (3 corpus rewrite rounds like bpe_train_rounds),
    # interval_coalesce (materializes ~1M island rows at sf0.1)
    "url_canonical_dedup",
    "seasonal_hour_profile",
    "retrieval_phrase_match",
    "budget_apportion_sources",
    # round-9 batch additions (sub-3.5s each at sf0.1). The seven
    # streaming gates stay off the watch for the same reason as the
    # maintainers above: they are write-path workloads whose walls are
    # recorded per-round in ORACLE_r{N}.json secs.
    "dedup_substring_spans",
    "fasttext_quality_inference",
    "knn_ivf_filtered",
    # round-10 additions: the re-blocked reciprocity gate (was the
    # registry's one sampled cartesian — watch the panel plan), the
    # bounded-explode WAU rollup, and the two-pass exact MAD. The
    # streaming_late_data_window write gate stays off the watch
    # (~18s, wall recorded in ORACLE_r{N}.json secs).
    "knn_graph_reciprocity",
    "rolling_wau_7d",
    "mad_robust_scale",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    # Local-SF parallelism: the test files are ~1-11 MB, so the default
    # 128 MB split leaves 31 of 32 cores idle on the scan. 2 MB splits
    # restore parallelism here; at production scale file counts make this
    # knob irrelevant (AQE coalesces any over-split shuffle side).
    spark = get_spark(
        "bench", extra_conf={"spark.sql.files.maxPartitionBytes": "2m"}
    )
    # warm the JVM + file listing so per-query numbers measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def run(name: str) -> float:
        t0 = time.time()
        registry[name].spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # Machine-load probe: one fixed query re-timed at three points of the
    # run (1/3, 2/3, end — all past the JVM's warm-up regime; a start
    # sample measures code-cache warming, not load, by experiment). A
    # loaded machine shows up as spread between the samples, which makes
    # "this round looks 6% slower" self-adjudicating (round-5 lesson: a
    # diffuse +6% drift across a run was machine load, confirmed only by
    # a manual re-run). Rule of thumb documented in README: idle measures
    # spread_pct ~15-30 on this sub-second probe; >~50 means loaded.
    _PROBE = "flagship_pricing_summary"  # HEADLINE[0]: warm from the
    # first slot, and heavy enough (~0.7s) that spread_pct is not
    # dominated by scheduler jitter on a sub-second query

    probe_samples: list[float] = []

    def probe() -> float:
        # min of two back-to-back runs: a single sample conflates machine
        # load with one-off JVM events (a GC pause reads as 5x); the min
        # of two still tracks sustained load, which is what the spread is
        # meant to surface. Raw samples are kept so the artifact shows
        # per-rep dispersion, not just the three mins.
        a, b = round(run(_PROBE), 3), round(run(_PROBE), 3)
        probe_samples.extend([a, b])
        return min(a, b)

    noise: dict[str, float] = {}
    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    for i, name in enumerate(HEADLINE):
        # First rep is warm-up (JIT, file listing, shuffle dirs); C2
        # compilation keeps landing through the second rep, so time
        # THREE more and keep the min — run-to-run drift at these
        # sub-second scales is JVM warmup + scheduler jitter, not the
        # query, and min-of-3 both tightens the estimate and stays
        # comparable with earlier rounds' min-of-2 (r8 lesson: the
        # driver host's probe spread hit 28%; more reps per query make
        # the reported wall robust to a noisy host). All reps are
        # emitted: `queries` carries the min (the trend figure),
        # `queries_reps` the full list, so per-query dispersion is
        # visible in the artifact itself.
        run(name)
        reps = [round(run(name), 3) for _ in range(3)]
        timings[name] = min(reps)
        all_reps[name] = reps
        if i == len(HEADLINE) // 3:
            noise["early"] = probe()
        elif i == 2 * len(HEADLINE) // 3:
            noise["middle"] = probe()
    noise["end"] = probe()
    # spread across the three interleaved probe points (each min-of-2,
    # 6 raw samples total — emitted below): sustained machine load shows
    # up as spread between the points
    lo, hi = min(noise.values()), max(noise.values())
    noise["spread_pct"] = round((hi - lo) / lo * 100, 1) if lo > 0 else 0.0
    noise["samples"] = probe_samples

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Per-query detail goes to a SEPARATE earlier line plus a committed
    # detail file: the driver captures only the last ~2000 chars of
    # output, and the round-6 final line (33 queries x 2 reps inline)
    # grew past that, recording `parsed: null` for an otherwise-green
    # round. The FINAL line stays compact (~250 chars) and carries the
    # headline + trend figures only.
    detail = {
        "metric": "headline_queries_detail",
        "queries": timings,
        "queries_reps": all_reps,
        "sf": sf_val,
        # r12 verdict item 8: at this SF most walls are sub-second, so a
        # low-core re-run measures per-task scheduling overhead, not
        # parallelism — core-count ratios here are not a scaling audit
        "scaling_note": (
            "sub-second walls at this SF are dominated by per-task "
            "scheduling overhead; core-count ratios are uninformative "
            "below ~1 s"
        ),
    }
    print(json.dumps(detail))
    here = os.path.dirname(os.path.abspath(__file__))
    # versioned per round (SPARK_GRAFT_ROUND or BENCH_ROUND env, else
    # the unversioned name): r7 overwrote the r6 detail file, so
    # cross-round per-query diffs depended on parsing a truncated
    # driver tail — never again. The round number is validated in its
    # OWN try so a malformed env var only drops the versioned copy,
    # never the primary BENCH_DETAIL.json write.
    rnd = os.environ.get("SPARK_GRAFT_ROUND") or os.environ.get("BENCH_ROUND")
    names = ["BENCH_DETAIL.json"]
    try:
        if rnd:
            names.append(f"BENCH_DETAIL_r{int(rnd):02d}.json")
    except ValueError:
        print(f"bench: ignoring malformed round {rnd!r}", file=sys.stderr)
    for nm in names:
        try:
            with open(os.path.join(here, nm), "w") as fh:
                json.dump(detail, fh, indent=1)
        except OSError:
            pass  # read-only checkout: the detail line above still has it
    # Compact per-query mins line (r12 verdict item 2a): the driver
    # captures only the last ~2000 chars of output, and the full detail
    # line above (3 reps per query) outgrew that in r12, leaving
    # PERF per_query empty. 2-decimal mins with no whitespace fit
    # alongside the final line inside the capture window.
    mins_line = json.dumps(
        {
            "metric": "headline_queries_mins",
            "queries": {k: round(v, 2) for k, v in timings.items()},
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    print(mins_line)
    summary = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "noise_probe": noise,
        # cross-round comparable figure: the first 20 HEADLINE entries
        # are frozen across rounds (r1: 17.9, r4: 12.9); `value` grows
        # as new operators join the watch list
        "trend20_wall": round(sum(timings[n] for n in HEADLINE[:20]), 3),
        "sf": sf_val,
    }
    line = json.dumps(summary)
    assert len(line) < 1500, f"final bench line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    main()
