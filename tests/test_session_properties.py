"""Hypothesis property tests for this session's depth operators: FIFO
lot allocation vs an imperative simulator, Theil-Sen vs brute-force
pairwise medians, and quantile normalization vs a pure-Python rank
mapper — random small inputs, few examples, one Spark pipeline each."""

from __future__ import annotations

import datetime
import statistics

from hypothesis import given, settings, strategies as st

from mobilitydatalakebenchmark_spark.plans import load_registry

qty = st.integers(1, 20)
lots = st.lists(st.tuples(qty, st.integers(1, 50)), min_size=1, max_size=8)
issues = st.lists(qty, min_size=1, max_size=8)


def _fifo_simulate(receipts, issue_qtys):
    """Imperative FIFO: walk receipt lots front-to-back per issue."""
    lots_left = [[q, u * 100] for q, u in receipts]  # [qty, unit cents]
    n_allocs = 0
    qty_total = 0
    cost = 0
    idx = 0
    offset = 0  # consumed inside current lot
    for want in issue_qtys:
        while want > 0 and idx < len(lots_left):
            avail = lots_left[idx][0] - offset
            take = min(avail, want)
            n_allocs += 1
            qty_total += take
            cost += take * lots_left[idx][1]
            want -= take
            offset += take
            if offset == lots_left[idx][0]:
                idx += 1
                offset = 0
    return n_allocs, qty_total, cost


@settings(max_examples=5, deadline=None)
@given(lots, issues)
def test_fifo_matches_imperative_simulator(spark, tmp_path_factory, rs, iss):
    tmp = tmp_path_factory.mktemp("fifo")
    rows = []
    k = 0
    day0 = datetime.datetime(1995, 1, 1)
    for flag, seq in (("N", rs), ("R", [(q, 1) for q in iss])):
        for i, (q, unit) in enumerate(seq):
            k += 1
            rows.append(
                (k, 1, 1, i + 1, float(q), float(q * unit), 0.0, flag,
                 day0 + datetime.timedelta(days=i))
            )
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_returnflag string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp}/sf/lineitem.parquet")
    got = load_registry()["fifo_lot_allocation"].spark(
        spark, str(tmp / "sf")
    ).collect()
    n_allocs, qty_total, cost = _fifo_simulate(rs, iss)
    if qty_total == 0:
        assert got == []
    else:
        r = got[0]
        assert r.n_allocs == n_allocs
        assert r.qty_allocated == qty_total
        assert r.cost_cents == cost


values = st.lists(
    st.tuples(st.integers(0, 500), st.integers(-1000, 1000)),
    min_size=2,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(max_examples=5, deadline=None)
@given(values)
def test_theil_sen_matches_bruteforce(spark, tmp_path_factory, pts):
    tmp = tmp_path_factory.mktemp("ts")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i + 1, base + datetime.timedelta(hours=h), 1, float(v))
        for i, (h, v) in enumerate(pts)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).write.mode("overwrite").parquet(f"{tmp}/sf/events.parquet")
    got = load_registry()["theil_sen_slope"].spark(
        spark, str(tmp / "sf")
    ).collect()
    slopes = [
        (v2 - v1) / (h2 - h1)
        for i, (h1, v1) in enumerate(pts)
        for (h2, v2) in pts[i + 1 :]
        if h2 != h1
    ]
    # hours are unique by construction, so every pair contributes
    assert got[0].n_pairs == len(slopes)
    assert abs(float(got[0].slope_per_hour) - statistics.median(slopes)) < 1e-6


sizes = st.lists(st.integers(1, 9), min_size=1, max_size=5)


@settings(max_examples=5, deadline=None)
@given(sizes, st.integers(0, 10_000))
def test_quantile_normalization_matches_rank_mapper(
    spark, tmp_path_factory, src_sizes, seed
):
    import random

    rng = random.Random(seed)
    tmp = tmp_path_factory.mktemp("qn")
    rows = []
    did = 0
    for s, n in enumerate(src_sizes):
        for _ in range(n):
            rows.append((did, "x", f"S{s}", rng.randint(0, 999)))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp}/sf/documents.parquet")
    got = {
        r.source: r
        for r in load_registry()["quantile_normalization"]
        .spark(spark, str(tmp / "sf"))
        .collect()
    }
    # pure-Python reference: same rank formula
    all_sorted = sorted(rows, key=lambda r: (r[3], r[0]))
    g_vals = [r[3] for r in all_sorted]
    n_all = len(rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r[2], []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: (r[3], r[0]))
        mapped = [
            g_vals[((rk * n_all) // len(docs) + 1) - 1]
            for rk in range(len(docs))
        ]
        assert got[src].n_docs == len(docs)
        assert got[src].sum_norm == sum(mapped)
        assert got[src].min_norm == min(mapped)
        assert got[src].max_norm == max(mapped)
