"""Hypothesis property tests for the codec layer. Each property generates a
batch of cases and runs ONE Spark job over the whole batch (a job per
example would take minutes)."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # r13: heavy suite, excluded from the default fast tier (run with -m "" or -m slow)


import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions import codecs

coord = st.tuples(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False, width=64).map(
        lambda v: round(v, 6)
    ),
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False, width=64).map(
        lambda v: round(v, 6)
    ),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(coord, min_size=1, max_size=50))
def test_elegant_pair_inverse_property(spark, coords):
    df = spark.createDataFrame(coords, "lon double, lat double")
    z = codecs.elegant_pair(F.col("lon"), F.col("lat"))
    lon2, lat2 = codecs.elegant_unpair(z)
    for r in df.select("lon", "lat", lon2.alias("l2"), lat2.alias("t2")).collect():
        assert math.isclose(r.lon, r.l2, abs_tol=1e-9)
        assert math.isclose(r.lat, r.t2, abs_tol=1e-9)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False).map(
            lambda v: round(v, 6)
        ),
        min_size=1,
        max_size=50,
    )
)
def test_fixed_point_inverse_property(spark, values):
    mn = min(values)
    df = spark.createDataFrame([(v, mn) for v in values], "x double, mn double")
    enc = codecs.encode_fixed_point(F.col("x"), F.col("mn"))
    dec = codecs.decode_fixed_point(enc, F.col("mn"))
    for r in df.select("x", dec.alias("x2")).collect():
        assert math.isclose(r.x, r.x2, abs_tol=1e-6)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=40), min_size=1, max_size=20))
def test_fingerprint_permutation_invariant_property(spark, texts):
    from mobilitydatalakebenchmark_spark.operators.text_analysis import fingerprint

    rows = []
    for i, t in enumerate(texts):
        toks = t.split()
        rows.append((i, " ".join(toks) if toks else "x"))
        rows.append((i + 10000, " ".join(reversed(toks)) if toks else "x"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    for i in range(len(texts)):
        assert fps[i] == fps[i + 10000]


class TestRound3Properties:
    def test_pii_scrub_idempotent(self, spark):
        """scrub(scrub(x)) == scrub(x) for decorated corpus text."""
        from pyspark.sql import functions as F

        from mobilitydatalakebenchmark_spark.operators.pii import scrub

        df = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(100)
            .select(
                "doc_id",
                F.concat(
                    F.col("text"),
                    F.lit(" a@b.io 10.0.0.1 415-555-0134 078-05-1120"),
                ).alias("text"),
            )
        )
        once = df.select("doc_id", scrub(F.col("text")).alias("t1"))
        twice = once.select("doc_id", F.col("t1"), scrub(F.col("t1")).alias("t2"))
        assert twice.filter(F.col("t1") != F.col("t2")).count() == 0

    def test_mixture_sample_monotone_in_weight(self, spark):
        """Raising a stratum's keep probability never drops a previously
        kept row (threshold comparison is monotone in p)."""
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            mixture_sample,
        )

        df = spark.createDataFrame(
            [(i, "s", "t") for i in range(2000)], "doc_id long, lang string, text string"
        )
        kept_lo = {
            r.doc_id for r in mixture_sample(df, {"s": 0.2}, "lang").collect()
        }
        kept_hi = {
            r.doc_id for r in mixture_sample(df, {"s": 0.6}, "lang").collect()
        }
        assert kept_lo <= kept_hi
        assert len(kept_lo) < len(kept_hi)

    def test_shared_passages_invariant_under_doc_order(self, spark):
        """Passage runs are a function of content, not input order or ids:
        swapping which doc gets which id flips (doc_a, doc_b) only."""
        from mobilitydatalakebenchmark_spark.operators.dedup import shared_passages

        shared = " ".join(f"s{i}" for i in range(12))
        t1 = "x1 x2 x3 " + shared
        t2 = shared + " y1 y2 y3"
        df1 = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
        df2 = spark.createDataFrame([(2, t1), (1, t2)], "doc_id long, text string")
        r1 = shared_passages(df1, shingle_n=8).collect()[0]
        r2 = shared_passages(df2, shingle_n=8).collect()[0]
        assert (r1.longest_run_tokens, r1.n_shared_shingles) == (
            r2.longest_run_tokens,
            r2.n_shared_shingles,
        )
        assert r1.longest_run_tokens == 12


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.lists(
                st.floats(min_value=-1.0, max_value=1.0, allow_nan=False,
                          width=32).map(lambda v: round(v, 3)),
                min_size=4, max_size=4,
            ),
        ),
        min_size=4, max_size=30, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=8),
)
def test_semantic_dedup_cap_invariants_property(spark, rows, cap):
    """For ANY corpus and cap: membership is conserved, nothing both
    survives and drops, truncation is exactly the over-cap excess, and the
    pair output stays under the cap-quadratic ceiling."""
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        semantic_dedup_summary,
    )

    rows = [(i, v) for i, v in rows if any(x != 0.0 for x in v)]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_summary(
        df, n_clusters=2, threshold=0.9, max_cluster_size=cap
    ).collect()
    assert sum(r.n_members for r in out) == len(rows)
    for r in out:
        assert r.n_kept == r.n_members - r.n_dropped
        assert r.n_truncated == max(r.n_members - cap, 0)
        assert r.n_dup_pairs <= cap * (cap - 1) // 2
        assert r.n_dropped <= max(cap - 1, 0)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        # uppercase + digits + punctuation included so the alpha-fraction
        # rule's [a-z] semantics is actually exercised (an all-lowercase
        # alphabet would make the reference comparison vacuous)
        st.text(alphabet="abZD39.! e", min_size=1, max_size=60),
        min_size=1, max_size=15,
    )
)
def test_gopher_rules_match_python_reference_property(spark, texts):
    """The gate's JVM expressions vs a plain-python reimplementation of
    the same rules — any divergence (tokenization, rounding, thresholds)
    fails here before it can hash-mismatch an oracle."""
    from mobilitydatalakebenchmark_spark.plans import load_registry

    load_registry()
    from mobilitydatalakebenchmark_spark.plans.text import (
        _GOPHER_STOPWORDS,
        text_gopher_quality,
    )
    import os
    import tempfile

    texts = [t for t in texts if t.strip(" ")]
    if not texts:
        return
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "src0") for i, t in enumerate(texts)],
            "doc_id long, text string, source string",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: r for r in text_gopher_quality(spark, d).collect()}
    for i, t in enumerate(texts):
        words = t.split(" ")
        n = len(words)
        mwl = round(len(t.replace(" ", "")) / n, 4)
        # [a-z] exactly, as the gate and oracle define "alphabetic" — the
        # corpus is lowercase-normalized upstream; str.isalpha() would
        # diverge on uppercase/unicode and mask the narrower contract
        alpha = round(
            sum(1 for w in words if any("a" <= c <= "z" for c in w)) / n, 4
        )
        stops = len(set(words) & set(_GOPHER_STOPWORDS))
        r = got[i]
        assert r.n_words == n
        assert math.isclose(r.mean_word_len, mwl, abs_tol=1e-9)
        assert math.isclose(r.alpha_word_frac, alpha, abs_tol=1e-9)
        assert r.n_stopwords == stops
        assert r.keep == (
            20 <= n <= 80 and 3 <= mwl <= 10 and alpha >= 0.8 and stops >= 2
        )


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),
            st.text(alphabet="ab c", min_size=1, max_size=40),
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=1, max_size=25, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=2, max_value=64),
)
def test_shard_assignment_invariants_property(spark, rows, shard_tokens):
    """For ANY corpus and shard size: every doc lands in exactly one
    shard; within a source, offsets are contiguous (next start = prev
    start + prev tokens in pack order) and the shard id is exactly
    start_offset // shard_tokens."""
    from mobilitydatalakebenchmark_spark.operators.shards import assign_shards

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = assign_shards(df, shard_tokens).collect()
    assert len(out) == len(rows)
    assert len({r.doc_id for r in out}) == len(rows)
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for source, members in by_source.items():
        members.sort(key=lambda r: r.pack_order)
        offset = 0
        for r in members:
            assert r.start_offset == offset
            assert r.shard == f"{source}-{offset // shard_tokens}"
            offset += r.n_tokens


def test_temperature_alpha_one_keeps_everything(spark):
    """alpha=1 is the no-op temperature: every stratum's rate is exactly
    1.0 (p^0 normalized), so the keep filter passes every row."""
    from mobilitydatalakebenchmark_spark.operators.text_analysis import (
        temperature_keep,
        temperature_rates,
    )

    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1), f"s{i % 3}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    rates = temperature_rates(df, "source", alpha=1.0)
    assert all(r.rate == 1.0 for r in rates.collect())
    assert temperature_keep(df, rates, "source").count() == 60


# ---------------------------------------------------------------------------
# Round-7 continuation: property tests for the clamp-unrolling identity
# (CUSUM) and greedy BPE merge application against literal recursions.
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=60
    )
)
def test_cusum_clamp_identity_property(spark, xs):
    """prefix-algebra CUSUM == the literal clamped recursion, any ints."""
    from mobilitydatalakebenchmark_spark.operators.timeseries import cusum_excursions

    df = spark.createDataFrame(
        [("e", i, x) for i, x in enumerate(xs)], "entity string, seq int, cents long"
    )
    got = [
        r["s_scaled"]
        for r in cusum_excursions(df, "entity", ["seq"], "cents", 1, ref_cents=0)
        .orderBy("seq")
        .collect()
    ]
    s, want = 0, []
    for x in xs:
        s = max(0, s + x)
        want.append(s)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_greedy_merge_property(spark, texts):
    """one BPE round == literal greedy merge on arbitrary 4-symbol corpora
    (exercises repeated-token runs heavily)."""
    import collections

    from mobilitydatalakebenchmark_spark.operators.bpe import bpe_train_rounds

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rules, merged = bpe_train_rounds(docs, "text", n_rounds=1)
    got_rules = rules.collect()
    got_texts = [r["text"] for r in merged.orderBy("doc_id").collect()]

    counts: collections.Counter = collections.Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            counts[f"{toks[i]} {toks[i + 1]}"] += 1
    if not counts:  # all single-token docs: no-op round, corpus untouched
        assert got_rules == [] and got_texts == texts
        return
    got_rule = got_rules[0]
    pair = min(counts, key=lambda p: (-counts[p], p))
    a, b = pair.split(" ")
    want_texts = []
    for t in texts:
        toks = t.split(" ")
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + "@" + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        want_texts.append(" ".join(out))
    assert (got_rule["pair"], got_rule["pair_count"]) == (pair, counts[pair])
    assert got_texts == want_texts


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_snapshot_diff_partitions_key_universe(spark, left_rows, right_rows):
    """snapshot_diff covers every key exactly once with the right status,
    for arbitrary keyed tables including NULL values."""
    from mobilitydatalakebenchmark_spark.operators.diff import snapshot_diff

    left = spark.createDataFrame(left_rows or [], "k long, v int")
    right = spark.createDataFrame(right_rows or [], "k long, v int")
    got = {r["k"]: r["status"] for r in snapshot_diff(left, right, ["k"]).collect()}
    l, r = dict(left_rows), dict(right_rows)
    want = {}
    for k in set(l) | set(r):
        if k not in r:
            want[k] = "removed"
        elif k not in l:
            want[k] = "added"
        elif l[k] == r[k]:
            want[k] = "unchanged"
        else:
            want[k] = "changed"
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_zorder_interleave_bijective_property(spark, cells):
    """Morton interleave is a bijection on (x, y) cell pairs: distinct
    cells get distinct keys and the key decodes back bit-for-bit."""
    from mobilitydatalakebenchmark_spark.functions.zorder import interleave_bits

    df = spark.createDataFrame(cells, "x long, y long")
    got = df.select("x", "y", interleave_bits(F.col("x"), F.col("y")).alias("z")).collect()
    seen = set()
    for r in got:
        # python reference interleave
        z = 0
        for i in range(16):
            z |= ((r["x"] >> i) & 1) << (2 * i)
            z |= ((r["y"] >> i) & 1) << (2 * i + 1)
        assert r["z"] == z
        assert r["z"] not in seen
        seen.add(r["z"])


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.sampled_from(["en", "es", "zh"]),
        ),
        min_size=2,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),
    st.sampled_from([2, 4, 8]),
)
def test_contrastive_mining_replays_property(spark, rows, k, n_buckets):
    """Any id/label distribution: the blocked sampler equals its literal
    Python replay — same buckets, same draws, same top-k."""
    import hashlib

    from mobilitydatalakebenchmark_spark.operators.contrastive import (
        negative_samples,
    )

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def bucket(i, salt):
        return int(md5(f"{salt}{i}")[:8], 16) % n_buckets

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got: dict[int, list] = {}
    for r in negative_samples(df, "doc_id", "lang", k=k, n_buckets=n_buckets).collect():
        got.setdefault(r["anchor_id"], []).append((r["neg_rank"], r["neg_id"]))
    buckets: dict[int, list] = {}
    labels = dict(rows)
    for i, _ in rows:
        buckets.setdefault(bucket(i, "cand:"), []).append(i)
    for a, lab in rows:
        pool = [
            c
            for c in buckets.get(bucket(a, "probe:"), [])
            if labels[c] != lab and c != a
        ]
        pool.sort(key=lambda c: (md5(f"{a}:{c}"), c))
        expect = [(j + 1, c) for j, c in enumerate(pool[:k])]
        assert sorted(got.get(a, [])) == expect, a
