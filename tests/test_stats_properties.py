"""Hypothesis property tests for the late-round-9 statistics operators:
Hampel, KS, Mann-Whitney and nDCG vs pure-Python brute-force references
on random small inputs. Few examples, one Spark pipeline per example."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

cents = st.integers(-10_000, 10_000)
series = st.lists(cents, min_size=1, max_size=40)
sample = st.lists(st.integers(0, 30), min_size=1, max_size=40)


def _med2(vals):
    s = sorted(vals)
    n = len(s)
    return s[(n + 1) // 2 - 1] + s[n // 2]


@settings(max_examples=5, deadline=None)
@given(series)
def test_hampel_matches_reference(spark, xs):
    from mobilitydatalakebenchmark_spark.operators.timeseries import (
        hampel_flags,
    )

    df = spark.createDataFrame(
        [("e", i, v) for i, v in enumerate(xs)],
        "entity string, seq int, cents long",
    )
    got = [
        r.is_outlier
        for r in hampel_flags(df, "entity", ["seq"], "cents")
        .orderBy("seq")
        .collect()
    ]
    want = []
    for i, x in enumerate(xs):
        fr = xs[max(0, i - 5) : i + 6]
        med2 = _med2(fr)
        mad22 = _med2([abs(2 * v - med2) for v in fr])
        want.append(2 * abs(2 * x - med2) * 10000 > 44478 * mad22)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(sample, sample)
def test_ks_and_mwu_match_pairwise_references(spark, s1, s2):
    from mobilitydatalakebenchmark_spark.operators.nonparametric import (
        ks_two_sample,
        mann_whitney_u,
    )

    rows = [(v, 1) for v in s1] + [(v, 0) for v in s2]
    df = spark.createDataFrame(rows, "v long, g int")
    n1, n2 = len(s1), len(s2)

    ks = ks_two_sample(df, "v", F.col("g") == 1).first()
    best, c1, c2 = 0, 0, 0
    from collections import Counter

    m1, m2 = Counter(s1), Counter(s2)
    for v in sorted(set(s1) | set(s2)):
        c1 += m1[v]
        c2 += m2[v]
        best = max(best, abs(c1 * n2 - c2 * n1))
    assert (ks.n1, ks.n2, ks.d_scaled) == (n1, n2, best)

    mwu = mann_whitney_u(df, "v", F.col("g") == 1).first()
    u1_2 = sum(
        2 if a > b else (1 if a == b else 0) for a in s1 for b in s2
    )
    assert mwu.u1_scaled2 == u1_2
    # the two U statistics always tile the pair count
    assert mwu.u1_scaled2 + mwu.u2_scaled2 == 2 * n1 * n2
    assert 0.0 <= mwu.auc <= 1.0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 3), min_size=1, max_size=10).map(
        lambda rels: list(enumerate(rels, start=1))
    )
)
def test_ndcg_bounded_and_maximal_on_sorted(spark, ranked_rels):
    """nDCG is in [0, 1]; re-ranking the same docs by relevance gives 1."""
    from mobilitydatalakebenchmark_spark.operators.retrieval import ndcg_at_k

    rel_rows = [(doc, rel) for doc, rel in ranked_rels]
    rel = spark.createDataFrame(rel_rows, "doc_id long, rel int")
    run = spark.createDataFrame(
        [("q", rank, doc) for rank, (doc, _) in enumerate(ranked_rels, 1)],
        "query_id string, rank int, doc_id long",
    )
    row = ndcg_at_k(run, rel).first()
    if row.idcg_scaled == 0:
        assert row.ndcg == 0.0
        return
    assert 0.0 <= row.ndcg <= 1.0
    ideal_order = sorted(ranked_rels, key=lambda t: (-t[1], t[0]))
    ideal_run = spark.createDataFrame(
        [("q", rank, doc) for rank, (doc, _) in enumerate(ideal_order, 1)],
        "query_id string, rank int, doc_id long",
    )
    assert ndcg_at_k(ideal_run, rel).first().ndcg == 1.0
