"""Unit tests for the round-7 continuation operators: interval coalescing,
URL canonicalization, positional phrase retrieval, RRF fusion, and the
tolerance-bounded as-of gate's mask semantics."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.retrieval import (
    literal_phrases,
    overlap_topk,
    phrase_match,
    positional_postings,
    rrf_fuse,
)
from mobilitydatalakebenchmark_spark.operators.timeseries import coalesce_intervals
from mobilitydatalakebenchmark_spark.operators.urls import canonical_url


# ---------------------------------------------------------------------------
# coalesce_intervals
# ---------------------------------------------------------------------------


def _merge_brute(intervals):
    """Reference merge: overlapping OR touching [s, e) intervals."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [tuple(x) for x in out]


def test_coalesce_overlap_adjacent_gap(spark):
    rows = [
        # k1: [0,10) + [5,15) overlap -> [0,15); [15,20) touches -> merges;
        # [30,40) gapped -> second island
        ("k1", 0, 10),
        ("k1", 5, 15),
        ("k1", 15, 20),
        ("k1", 30, 40),
        # k2: containment — [0,100) swallows [10,20)
        ("k2", 0, 100),
        ("k2", 10, 20),
    ]
    df = spark.createDataFrame(rows, "k string, start_us long, end_us long")
    out = {
        (r.k, r.island): (r.start_us, r.end_us, r.n_rows)
        for r in coalesce_intervals(df, "k").collect()
    }
    assert out == {
        ("k1", 1): (0, 20, 3),
        ("k1", 2): (30, 40, 1),
        ("k2", 1): (0, 100, 2),
    }


def test_coalesce_matches_bruteforce_randomized(spark):
    rng = random.Random(7)
    rows = []
    expected = {}
    for k in range(6):
        ivs = []
        for _ in range(rng.randint(1, 25)):
            s = rng.randint(0, 200)
            ivs.append((s, s + rng.randint(1, 40)))
        rows += [(f"k{k}", s, e) for s, e in ivs]
        expected[f"k{k}"] = _merge_brute(ivs)
    df = spark.createDataFrame(rows, "k string, start_us long, end_us long")
    got = {}
    for r in coalesce_intervals(df, "k").collect():
        got.setdefault(r.k, []).append((r.island, r.start_us, r.end_us))
    for k, merged in expected.items():
        got_k = [(s, e) for _, s, e in sorted(got[k])]
        assert got_k == merged, k


# ---------------------------------------------------------------------------
# canonical_url
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,want",
    [
        # host/scheme case + www + default port + trailing slash + utm + frag
        (
            "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=3&utm_campaign=c#top",
            "https://ex.com/a/b?id=3",
        ),
        ("http://ex.com:80/a", "http://ex.com/a"),
        # NON-default port survives
        ("http://ex.com:8080/a", "http://ex.com:8080/a"),
        # http with https' default port is NOT default -> survives
        ("http://ex.com:443/a", "http://ex.com:443/a"),
        # bare host, with and without the lone slash, meet
        ("https://Ex.com/", "https://ex.com"),
        ("https://ex.com", "https://ex.com"),
        # all-utm query drops its '?'
        ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
        # non-utm params keep their original order
        ("https://ex.com/p?b=2&utm_x=1&a=1", "https://ex.com/p?b=2&a=1"),
    ],
)
def test_canonical_url_cases(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], "url string")
        .select(canonical_url(F.col("url")).alias("c"))
        .first()
        .c
    )
    assert got == want


# ---------------------------------------------------------------------------
# phrase_match
# ---------------------------------------------------------------------------


def test_phrase_match_counts_and_overlaps(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),          # "a b" twice
            (2, "x x x"),              # "x x" overlapping: anchors 0 and 1
            (3, "a c b"),              # terms present, phrase absent
            (4, "b a"),                # reversed -> no match
        ],
        "doc_id long, text string",
    )
    pp = positional_postings(docs)
    phrases = literal_phrases(spark, {"q1": "a b", "q2": "x x"})
    got = {
        (r.query_id, r.doc_id): r.n_hits
        for r in phrase_match(pp, phrases).collect()
    }
    assert got == {("q1", 1): 2, ("q2", 2): 2}


def test_phrase_match_trigram_and_anchor_floor(spark):
    docs = spark.createDataFrame(
        [(1, "u v w u v"), (2, "v w u")], "doc_id long, text string"
    )
    pp = positional_postings(docs)
    phrases = literal_phrases(spark, {"t": "u v w"})
    got = {
        (r.query_id, r.doc_id): r.n_hits
        for r in phrase_match(pp, phrases).collect()
    }
    # doc 2 has "v w u" — the anchor for u@2 would be 2, v@0 anchor -1
    # (filtered), so no complete anchor
    assert got == {("t", 1): 1}


# ---------------------------------------------------------------------------
# rrf_fuse / overlap_topk
# ---------------------------------------------------------------------------


def test_rrf_fuse_missing_side_and_order(spark):
    a = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2)], "query_id string, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [("q", 20, 1), ("q", 30, 2)], "query_id string, doc_id long, rank int"
    )
    rows = rrf_fuse(a, b, k=60, topk=10).orderBy("fused_rank").collect()
    # doc 20: 1/62 + 1/61 > doc 10: 1/61 > doc 30: 1/62
    assert [r.doc_id for r in rows] == [20, 10, 30]
    assert rows[0].rrf_score == pytest.approx(1 / 62 + 1 / 61)
    # missing ranks surface as 0
    assert (rows[1].rank_a, rows[1].rank_b) == (1, 0)
    assert (rows[2].rank_a, rows[2].rank_b) == (0, 2)


def test_overlap_topk_tiebreaks(spark):
    postings = spark.createDataFrame(
        # (term, doc_id, tf, dl)
        [
            ("a", 1, 1, 5),
            ("b", 1, 1, 5),
            ("a", 2, 3, 3),
            ("b", 2, 1, 3),
            ("a", 3, 1, 3),
        ],
        "term string, doc_id long, tf long, dl int",
    )
    queries = spark.createDataFrame(
        [("q", "a"), ("q", "b")], "query_id string, term string"
    )
    rows = overlap_topk(postings, queries, topk=10).orderBy("rank").collect()
    # 2 matched terms beats 1; among {1,2} the shorter doc (2) wins;
    # tf must NOT matter
    assert [r.doc_id for r in rows] == [2, 1, 3]


# ---------------------------------------------------------------------------
# gate-level invariants on the sf0.001 smoke tables
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_asof_tolerance_mask(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    q = load_registry()["asof_tolerance_lookup"]
    rows = q.spark(spark, SF).collect()
    assert rows, "no purchases in smoke data?"
    for r in rows:
        if r.matched:
            assert r.gap_us is not None and 0 <= r.gap_us <= 2 * 3600 * 10**6
            assert r.click_value is not None
        else:
            assert r.gap_us is None and r.click_value is None


def test_interval_coalesce_islands_disjoint(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    q = load_registry()["interval_coalesce"]
    rows = q.spark(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.island, r.start_us, r.end_us))
    for user, islands in by_user.items():
        islands.sort()
        for (i1, s1, e1), (i2, s2, e2) in zip(islands, islands[1:]):
            assert i2 == i1 + 1
            assert s2 > e1, f"user {user}: islands touch or overlap"
            assert s1 < e1 and s2 < e2


def test_pareto_frontier_mutual_nondominance(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    q = load_registry()["pareto_frontier_price_qty"]
    rows = q.spark(spark, SF).collect()
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r.flag, []).append((r.price, r.quantity))
    for flag, pts in by_flag.items():
        # frontier sorted by price must be strictly increasing in quantity
        pts.sort()
        for (p1, q1), (p2, q2) in zip(pts, pts[1:]):
            assert p2 > p1, f"{flag}: duplicate price on frontier"
            assert q2 > q1, f"{flag}: dominated point survived"


def test_pareto_frontier_complete_on_toy(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry
    import itertools

    # brute-force weak-dominance filter on the smoke lineitem must equal
    # the gate's frontier set
    q = load_registry()["pareto_frontier_price_qty"]
    got = {(r.flag, r.price, r.quantity) for r in q.spark(spark, SF).collect()}
    li = [
        (r.l_returnflag, round(r.l_extendedprice, 2), round(r.l_quantity, 2))
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    ]
    want = set()
    for flag, pts in itertools.groupby(sorted(li), key=lambda x: x[0]):
        pts = [(p, qq) for _, p, qq in pts]
        for p, qq in pts:
            dominated = any(
                (p2 <= p and q2 >= qq and (p2 < p or q2 > qq))
                for p2, q2 in pts
            )
            if not dominated:
                want.add((flag, p, qq))
    assert got == want


def test_apportionment_exactly_hits_budget(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    q = load_registry()["budget_apportion_sources"]
    rows = q.spark(spark, SF).collect()
    assert sum(r.alloc for r in rows) == 1_000_000
    for r in rows:
        assert r.alloc in (r.floor_alloc, r.floor_alloc + 1)
        assert r.extra in (0, 1)
    # proportionality sanity: allocation ordering follows token ordering
    rows.sort(key=lambda r: r.n_tokens)
    for a, b in zip(rows, rows[1:]):
        assert a.alloc <= b.alloc + 1  # Hamilton can flip by at most 1


def test_l_diversity_bounds_and_flag(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["l_diversity_cells"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.suppressed == (r.n_sensitive < 3)
        assert 1 <= r.n_sensitive <= 5  # five event types exist
        assert r.n_sensitive <= r.n_obs
        assert r.n_entities <= r.n_obs


def test_group_kfold_no_leakage_and_shares(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry
    from pyspark.sql import functions as F

    rows = load_registry()["group_kfold_assign"].spark(spark, SF).collect()
    assert {r.fold for r in rows} <= set(range(5))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # fold totals must tile the table exactly
    assert sum(r.n_events for r in rows) == ev.count()
    assert sum(r.n_users for r in rows) == ev.select("user_id").distinct().count()


def test_acf_is_a_correlation(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["acf_lag1_per_user"].spark(spark, SF).collect()
    assert rows
    import numpy as np

    for r in rows:
        if r.acf1 is not None:
            assert -1.0 - 1e-12 <= r.acf1 <= 1.0 + 1e-12
    # spot-check one user against numpy's corrcoef
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(f"user_id = {rows[0].user_id}")
        .orderBy("ts", "event_id")
        .collect()
    )
    xs = np.round(np.array([e.value for e in ev]) * 10000)
    want = np.corrcoef(xs[:-1], xs[1:])[0, 1]
    assert rows[0].acf1 == __import__("pytest").approx(want, rel=1e-9)


def test_hierarchy_ancestors_match_shift_identity(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["hierarchy_ancestors"].spark(spark, SF).collect()
    assert rows
    seen_depths = set()
    for r in rows:
        # parent = node div 2 repeated d times == node >> d, and the chain
        # must stop above the root (ancestor >= 1 always; no depth-d row
        # exists when node >> (d-1) is already the root)
        assert r.ancestor == r.node >> r.depth
        assert 1 <= r.depth <= 4
        assert r.ancestor >= 1
        seen_depths.add(r.depth)
    assert seen_depths == {1, 2, 3, 4}
    by_node = {}
    for r in rows:
        by_node.setdefault(r.node, set()).add(r.depth)
    for node, depths in by_node.items():
        want = {d for d in range(1, 5) if node >> (d - 1) >= 2}
        assert depths == want, node


def test_weighted_median_bruteforce(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    got = {
        r.flag: (r.wmedian_price, r.total_weight)
        for r in load_registry()["weighted_median_price"].spark(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    ).collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(
            (round(r.l_extendedprice * 100), round(r.l_quantity * 100),
             r.l_orderkey, r.l_linenumber)
        )
    for flag, rows in groups.items():
        rows.sort()
        total = sum(q for _, q, _, _ in rows)
        cum = 0
        for cents, q, _, _ in rows:
            cum += q
            if 2 * cum >= total:
                assert got[flag] == (cents / 100.0, total / 100.0), flag
                break


def test_benford_shares_and_expected(spark):
    import math

    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["benford_first_digit"].spark(spark, SF).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r.expected == math.log10(1.0 + 1.0 / r.digit)
        assert r.deviation == r.observed - r.expected


def test_gini_matches_bruteforce_and_bounds(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = {
        r.key_space: r
        for r in load_registry()["skew_gini_report"].spark(spark, SF).collect()
    }
    assert set(rows) == {"events.user_id", "lineitem.l_orderkey"}
    ev = spark.read.parquet(f"{SF}/events.parquet").groupBy("user_id").count()
    counts = sorted((r["count"], r["user_id"]) for r in ev.collect())
    n = len(counts)
    s0 = sum(c for c, _ in counts)
    s1 = sum((i + 1) * c for i, (c, _) in enumerate(counts))
    want = (2 * s1 - (n + 1) * s0) / (n * s0)
    got = rows["events.user_id"]
    assert got.gini == __import__("pytest").approx(want, abs=0)
    assert got.n_keys == n and got.total_rows == s0
    for r in rows.values():
        assert 0.0 <= r.gini < 1.0


def test_join_cardinality_identity_holds(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    r = load_registry()["join_cardinality_estimate"].spark(spark, SF).first()
    assert r.identity_holds
    assert r.estimated == r.actual > 0
    assert r.n_shared_keys > 0


# ---------------------------------------------------------------------------
# Hypothesis properties (batched: one Spark job per example set)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_url_strat = st.builds(
    lambda scheme, www, host, port, path, slash, q, frag: (
        f"{scheme}://{www}{host}{port}/{path}{slash}{q}{frag}"
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTTps"]),
    st.sampled_from(["", "www.", "WWW."]),
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,6}(\.[A-Za-z]{2,3}){1,2}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[A-Za-z0-9/]{0,10}", fullmatch=True),
    st.sampled_from(["", "/"]),
    st.sampled_from(["", "?a=1", "?utm_x=1", "?utm_x=1&b=2", "?b=2&utm_y=3&c=4"]),
    st.sampled_from(["", "#frag", "#x/y?z"]),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_url_strat, min_size=1, max_size=40))
def test_canonical_url_idempotent_property(spark, urls):
    """canonical(canonical(u)) == canonical(u) — the property that makes
    the canonical form a stable dedup key (re-canonicalizing stored keys
    can never split or merge groups)."""
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url(F.col("url"))
    rows = df.select(
        once.alias("c1"),
        # re-parse the canonical string through the same expression
        canonical_url(once).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, r


_iv = st.tuples(
    st.integers(min_value=0, max_value=300),
    st.integers(min_value=1, max_value=60),
)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(_iv, min_size=1, max_size=30),
    st.lists(_iv, min_size=0, max_size=30),
)
def test_coalesce_intervals_associative_property(spark, batch_a, batch_b):
    """merge(merge(A) ∪ B) == merge(A ∪ B) with member counts carried —
    the associativity the streaming islands maintainer
    (streaming/intervals.py) relies on for incremental re-merge."""
    rows_a = [("k", s, s + d) for s, d in batch_a]
    rows_b = [("k", s, s + d) for s, d in batch_b]
    schema = "k string, start_us long, end_us long"
    a = spark.createDataFrame(rows_a, schema)
    ab = spark.createDataFrame(rows_a + rows_b, schema)
    merged_a = coalesce_intervals(a, "k").select(
        "k", "start_us", "end_us", F.col("n_rows")
    )
    b_w = spark.createDataFrame(rows_b, schema).withColumn(
        "n_rows", F.lit(1).cast("long")
    ) if rows_b else None
    union = merged_a if b_w is None else merged_a.unionByName(b_w)
    incremental = coalesce_intervals(
        union, "k", weight_col="n_rows"
    )
    direct = coalesce_intervals(ab, "k")
    snap = lambda df: sorted(
        (r.island, r.start_us, r.end_us, r.n_rows) for r in df.collect()
    )
    assert snap(incremental) == snap(direct)


def test_hybrid_retrieval_fuses_both_signals(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["retrieval_hybrid_text_vector"].spark(
        spark, SF
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {"q1", "q2", "q3"}
    for qid, rs in by_q.items():
        assert [r.fused_rank for r in sorted(rs, key=lambda r: r.fused_rank)] == list(
            range(1, len(rs) + 1)
        )
        # both rankers actually contribute: some doc has a text rank,
        # some doc has a vector rank
        assert any(r.rank_a > 0 for r in rs), qid
        assert any(r.rank_b > 0 for r in rs), qid
        # scores are the two-term RRF sums of the carried ranks
        for r in rs:
            want = (1 / (60 + r.rank_a) if r.rank_a else 0.0) + (
                1 / (60 + r.rank_b) if r.rank_b else 0.0
            )
            assert r.rrf_score == want


def test_chi2_drift_matches_scipy_formula(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["drift_chi2_event_mix"].spark(spark, SF).collect()
    assert len(rows) == 5
    # recompute by hand from the observed counts
    t1 = sum(r.o1 for r in rows)
    t2 = sum(r.o2 for r in rows)
    t = t1 + t2
    chi2 = 0.0
    for r in sorted(rows, key=lambda r: r.event_type):
        e1 = t1 * ((r.o1 + r.o2) / t)
        e2 = t2 * ((r.o1 + r.o2) / t)
        assert r.e1 == __import__("pytest").approx(e1, rel=1e-12)
        chi2 += (r.o1 - e1) ** 2 / e1 + (r.o2 - e2) ** 2 / e2
    assert rows[0].chi2_total == __import__("pytest").approx(chi2, rel=1e-9)
    assert all(r.chi2_total == rows[0].chi2_total for r in rows)


def test_jl_projection_distortion_bound(spark):
    import numpy as np

    from mobilitydatalakebenchmark_spark.plans import load_registry
    from mobilitydatalakebenchmark_spark.plans.curation import _JL_D, _JL_K, _JL_SIGNS

    rows = load_registry()["vec_random_projection_jl"].spark(spark, SF).collect()
    proj = {r.vec_id: np.array([r[f"p{j}"] for j in range(_JL_K)]) for r in rows}
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    S = np.array(_JL_SIGNS)  # k x d
    # projections match numpy exactly (same fold over doubles can differ
    # from BLAS order, allow 1e-9 rel)
    for vid in list(proj)[:10]:
        np.testing.assert_allclose(proj[vid], S @ emb[vid], rtol=1e-9)
    # JL property on sampled pairs: squared-distance ratio (scaled by
    # d/k) concentrated around 1 — generous band for k=8
    ids = sorted(proj)[:40]
    ratios = []
    for a, b in zip(ids, ids[1:]):
        du = np.sum((emb[a] - emb[b]) ** 2)
        dp = np.sum((proj[a] - proj[b]) ** 2)
        if du > 0:
            ratios.append((dp / _JL_D) / (du * _JL_K / _JL_D))
    med = float(np.median(ratios))
    assert 0.3 < med < 3.0, med


def test_nucleus_prefix_is_minimal_cover(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = sorted(
        load_registry()["vocab_nucleus_topp"].spark(spark, SF).collect(),
        key=lambda r: r.rank,
    )
    assert rows
    total = rows[0].total
    kept_cum = rows[-1].cum
    # covers >= 90%
    assert 10 * kept_cum >= 9 * total
    # minimal: dropping the last kept token falls below 90%
    assert 10 * (kept_cum - rows[-1].n) < 9 * total
    # ranks are the contiguous prefix 1..m and counts are non-increasing
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.n >= b.n for a, b in zip(rows, rows[1:]))


def test_dwell_time_cap_and_top1(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["mobility_dwell_time"].spark(spark, SF).collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users)), "more than one top cell per user"
    for r in rows:
        assert r.dwell_us > 0
        # dwell can never exceed n_fixes * cap
        assert r.dwell_us <= r.n_fixes * 2 * 3600 * 10**6


def test_teleport_clean_invariants(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["trajectory_teleport_clean"].spark(spark, SF).collect()
    assert rows
    assert any(r.n_teleports > 0 for r in rows), (
        "synthetic pseudo-tracks should contain impossible speeds"
    )
    for r in rows:
        assert 0 <= r.n_teleports <= r.n_steps
        assert 0 <= r.clean_cm <= r.raw_cm
        if r.n_teleports == 0:
            assert r.clean_cm == r.raw_cm


def test_scd2_pit_join_one_state_per_purchase(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = load_registry()["scd2_point_in_time_join"].spark(spark, SF).collect()
    assert rows
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)), "a purchase matched several intervals"
    # the state really is the latest prior non-purchase event's type
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter("user_id < 40")
        .collect()
    )
    by_user = {}
    for e in ev:
        if e.event_type != "purchase":
            by_user.setdefault(e.user_id, []).append((e.ts, e.event_id, e.event_type))
    for u in by_user:
        by_user[u].sort()
    purchases = {e.event_id: e for e in ev if e.event_type == "purchase"}
    import random

    for r in random.Random(3).sample(rows, min(25, len(rows))):
        p = purchases[r.event_id]
        prior = [s for s in by_user.get(p.user_id, []) if s[0] <= p.ts]
        want = prior[-1][2] if prior else None
        assert r.state_at_purchase == want, (r.event_id, want)


# ---------------------------------------------------------------------------
# More properties + plan-shape pins for the continuation operators
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=30),
        min_size=1,
        max_size=15,
    ),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=2, max_value=3),
)
def test_phrase_match_equals_python_property(spark, texts, seed, plen):
    """phrase_match == a literal Python sliding-window count on arbitrary
    tiny-alphabet corpora (overlaps, repeated tokens, absent terms)."""
    docs = [
        (i, " ".join(t.split()))  # normalize runs of spaces like split(' ')
        for i, t in enumerate(texts)
    ]
    docs = [(i, t) for i, t in docs if t]
    if not docs:
        return
    letters = ["a", "b", "c"]
    phrase = " ".join(letters[(seed + j) % 3] for j in range(plen))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.query_id, r.doc_id): r.n_hits
        for r in phrase_match(
            positional_postings(df), literal_phrases(spark, {"q": phrase})
        ).collect()
    }
    want = {}
    ptoks = phrase.split()
    for i, t in docs:
        toks = t.split()
        n = sum(
            1
            for s in range(len(toks) - len(ptoks) + 1)
            if toks[s : s + len(ptoks)] == ptoks
        )
        if n:
            want[("q", i)] = n
    assert got == want


def test_rrf_fuse_is_symmetric(spark):
    a = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2), ("q", 30, 3)],
        "query_id string, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [("q", 20, 1), ("q", 40, 2)], "query_id string, doc_id long, rank int"
    )
    ab = {
        (r.query_id, r.doc_id): (r.fused_rank, r.rrf_score, r.rank_a, r.rank_b)
        for r in rrf_fuse(a, b).collect()
    }
    ba = {
        (r.query_id, r.doc_id): (r.fused_rank, r.rrf_score, r.rank_b, r.rank_a)
        for r in rrf_fuse(b, a).collect()
    }
    assert ab == ba


def test_new_gate_plan_shapes(spark):
    """The continuation gates keep the plans they were designed with:
    phrase matching broadcasts the phrase side, the hierarchy chain
    broadcasts the edge table, interval coalescing shares ONE real hash
    shuffle (the second Exchange is the output orderBy), and none of
    them fall back to Python row UDFs."""
    from mobilitydatalakebenchmark_spark.plans import load_registry
    from mobilitydatalakebenchmark_spark.plans.explain import (
        count_broadcast_joins,
        physical_plan,
    )

    reg = load_registry()
    phrase = reg["retrieval_phrase_match"].spark(spark, SF)
    assert count_broadcast_joins(phrase) >= 1
    hier = reg["hierarchy_ancestors"].spark(spark, SF)
    assert count_broadcast_joins(hier) >= 3
    ic = reg["interval_coalesce"].spark(spark, SF)
    plan = physical_plan(ic)
    assert plan.count("Exchange hashpartitioning") == 1
    for name in (
        "retrieval_phrase_match",
        "hierarchy_ancestors",
        "interval_coalesce",
        "url_canonical_dedup",
        "acf_lag1_per_user",
        "trajectory_teleport_clean",
    ):
        p = physical_plan(reg[name].spark(spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_collocation_lift_matches_bruteforce(spark):
    from collections import Counter

    from mobilitydatalakebenchmark_spark.plans import load_registry

    rows = sorted(
        load_registry()["text_collocation_lift"].spark(spark, SF).collect(),
        key=lambda r: r.rank,
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    uni, pairs = Counter(), Counter()
    for d in docs:
        toks = d.text.split(" ")
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    big_n = sum(uni.values())
    cand = sorted(
        (
            (-(n_ab * big_n * 1_000_000) / (uni[a] * uni[b]), a, b, n_ab)
            for (a, b), n_ab in pairs.items()
            if n_ab >= 5
        )
    )[:20]
    for r, (negscore, a, b, n_ab) in zip(rows, cand):
        assert (r.w1, r.w2, r.n_ab) == (a, b, n_ab), r.rank
        assert r.lift == (r.n_ab * big_n) / (r.n_a * r.n_b)
        assert r.n_a == uni[a] and r.n_b == uni[b]
    # lift actually discriminates: top pair beats the independence
    # expectation by a positive factor
    assert rows[0].lift > 1.0


def test_winsorized_stats_bruteforce(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    got = {
        r.flag: r
        for r in load_registry()["robust_winsorized_stats"].spark(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    ).collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(
            (round(r.l_extendedprice * 100), r.l_orderkey, r.l_linenumber)
        )
    import math

    for flag, rows in groups.items():
        rows.sort()
        n = len(rows)
        cents = [c for c, _, _ in rows]
        lo = cents[math.ceil(n / 20) - 1]
        hi = cents[math.ceil(19 * n / 20) - 1]
        w = [min(max(c, lo), hi) for c in cents]
        g = got[flag]
        assert (g.n, g.lo_cents, g.hi_cents) == (n, lo, hi), flag
        assert g.raw_mean_cents == sum(cents) / n
        assert g.winsor_mean_cents == sum(w) / n
        assert g.n_clipped == sum(1 for a, b in zip(cents, w) if a != b)
        # robustness direction: winsorized mean moves toward the median
        assert abs(g.winsor_mean_cents - cents[n // 2]) <= abs(
            g.raw_mean_cents - cents[n // 2]
        ) + 1e-9


def test_canonical_url_preserves_meaningful_parts(spark):
    """Canonicalization must collapse ONLY noise: non-default ports,
    non-utm params (and their order), path case and http-vs-https
    identity all survive."""
    pairs = [
        ("https://ex.com:9443/A/B?z=1&a=2", "https://ex.com:9443/A/B?z=1&a=2"),
        ("http://ex.com/x", "http://ex.com/x"),
        ("https://ex.com/x", "https://ex.com/x"),  # distinct from http
    ]
    df = spark.createDataFrame([(r,) for r, _ in pairs], "url string")
    got = [
        r.c
        for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [w for _, w in pairs]


def test_coalesce_degenerate_empty_intervals(spark):
    """[s, s) rows: zero-length extents inside an island merge into it;
    a standalone one forms its own zero-length island — pinned so the
    streaming maintainer's semantics can't silently drift."""
    rows = [("k", 0, 10), ("k", 5, 5), ("k", 20, 20)]
    df = spark.createDataFrame(rows, "k string, start_us long, end_us long")
    out = {
        (r.island): (r.start_us, r.end_us, r.n_rows)
        for r in coalesce_intervals(df, "k").collect()
    }
    assert out == {1: (0, 10, 2), 2: (20, 20, 1)}


def test_registry_metadata_complete():
    """Every gate carries a doc string and at least one tag — GATES.md
    stays meaningful as the registry grows."""
    from mobilitydatalakebenchmark_spark.plans import load_registry

    for name, q in load_registry().items():
        assert q.doc and len(q.doc) > 20, name
        assert q.tags, name
