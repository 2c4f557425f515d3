"""Pareto-frontier operator + incremental streaming maintenance: the
maintained frontier must equal the batch frontier of everything
ingested — dominance is transitive, so a point on the full-history
frontier was on it at every prefix, making streamed counts and keeper
ids converge exactly."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # r13: heavy suite, excluded from the default fast tier (run with -m "" or -m slow)


import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.skyline import pareto_frontier
from mobilitydatalakebenchmark_spark.streaming.skyline_stream import (
    read_frontier,
    stream_frontier,
    upsert_frontier_batch,
)

SCHEMA = "g string, cost long, gain long, rid long"


def _brute(points):
    """Reference weak-dominance filter over (cost, gain) tuples."""
    out = {}
    for c, gn, rid in points:
        dominated = any(
            (c2 <= c and g2 >= gn and (c2 < c or g2 > gn))
            for c2, g2, _ in points
        )
        if not dominated:
            key = (c, gn)
            n, mid = out.get(key, (0, rid))
            out[key] = (n + 1, min(mid, rid))
    return out


def _snapshot(df):
    return {
        (r.g, r.cost, r.gain): (r.n_dups, r.rid) for r in df.collect()
    }


def test_operator_matches_bruteforce_with_negative_gains(spark):
    rng = random.Random(11)
    rows = []
    expected = {}
    for g in ("a", "b"):
        pts = [
            (rng.randint(0, 30), rng.randint(-20, 20), i)
            for i in range(60)
        ]
        rows += [(g, c, gn, rid) for c, gn, rid in pts]
        expected[g] = _brute(pts)
    df = spark.createDataFrame(rows, SCHEMA)
    got = _snapshot(pareto_frontier(df, "g", "cost", "gain", id_col="rid"))
    want = {
        (g, c, gn): v
        for g, m in expected.items()
        for (c, gn), v in m.items()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=-10, max_value=10),
        ),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=-10, max_value=10),
        ),
        min_size=0,
        max_size=25,
    ),
)
def test_frontier_merge_associative_property(spark, pts_a, pts_b):
    """frontier(frontier(A) ∪ B) == frontier(A ∪ B) with multiplicities
    carried — the algebra the streaming maintainer relies on. Holds only
    for points surviving in the full set, which is exactly what the
    frontier returns."""
    rows_a = [("g", c, gn, i) for i, (c, gn) in enumerate(pts_a)]
    rows_b = [
        ("g", c, gn, 1000 + i) for i, (c, gn) in enumerate(pts_b)
    ]
    a = spark.createDataFrame(rows_a, SCHEMA)
    ab = spark.createDataFrame(rows_a + rows_b, SCHEMA)
    fa = pareto_frontier(a, "g", "cost", "gain", id_col="rid")
    union = fa if not rows_b else fa.unionByName(
        spark.createDataFrame(rows_b, SCHEMA).withColumn(
            "n_dups", F.lit(1).cast("long")
        ).select("g", "cost", "gain", "n_dups", "rid")
    )
    inc = pareto_frontier(
        union, "g", "cost", "gain", id_col="rid", dups_col="n_dups"
    )
    direct = pareto_frontier(ab, "g", "cost", "gain", id_col="rid")
    assert _snapshot(inc) == _snapshot(direct)


def test_streamed_frontier_equals_batch(spark, tmp_path):
    data_dir, table, ckpt = (
        str(tmp_path / "data"),
        str(tmp_path / "front"),
        str(tmp_path / "ckpt"),
    )
    rng = random.Random(5)
    batches = []
    rid = 0
    for _ in range(3):
        rows = []
        for _ in range(40):
            g = rng.choice(["x", "y"])
            rows.append((g, rng.randint(0, 25), rng.randint(0, 25), rid))
            rid += 1
        batches.append(rows)
    # plant a duplicate of a likely-frontier point across batches
    batches[1].append(("x", 0, 25, rid)); rid += 1
    batches[2].append(("x", 0, 25, rid)); rid += 1
    for b in batches:
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(data_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    q = stream_frontier(stream, table, ckpt, "g", "cost", "gain", "rid")
    if not q.awaitTermination(120):
        q.processAllAvailable()
        q.stop()

    got = _snapshot(read_frontier(spark, table))
    want = _snapshot(
        pareto_frontier(
            spark.read.parquet(data_dir), "g", "cost", "gain", id_col="rid"
        )
    )
    assert got == want


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "front")
    b = spark.createDataFrame(
        [("g", 1, 5, 1), ("g", 2, 9, 2), ("g", 3, 9, 3)], SCHEMA
    )
    upsert_frontier_batch(b, table, "g", "cost", "gain", "rid", txn=("r", 0))
    once = _snapshot(read_frontier(spark, table))
    assert once == {("g", 1, 5): (1, 1), ("g", 2, 9): (1, 2)}
    upsert_frontier_batch(b, table, "g", "cost", "gain", "rid", txn=("r", 0))
    assert _snapshot(read_frontier(spark, table)) == once
    # a new epoch dominating everything shrinks the frontier to one point
    upsert_frontier_batch(
        spark.createDataFrame([("g", 0, 50, 9)], SCHEMA),
        table,
        "g",
        "cost",
        "gain",
        "rid",
        txn=("r", 1),
    )
    assert _snapshot(read_frontier(spark, table)) == {("g", 0, 50): (1, 9)}


def test_empty_batch_is_a_noop(spark, tmp_path):
    table = str(tmp_path / "front")
    upsert_frontier_batch(
        spark.createDataFrame([("g", 1, 5, 1)], SCHEMA),
        table, "g", "cost", "gain", "rid", txn=("r", 0),
    )
    before = _snapshot(read_frontier(spark, table))
    upsert_frontier_batch(
        spark.createDataFrame([], SCHEMA),
        table, "g", "cost", "gain", "rid", txn=("r", 1),
    )
    assert _snapshot(read_frontier(spark, table)) == before


def test_single_point_and_duplicate_only_batches(spark, tmp_path):
    table = str(tmp_path / "front")
    p = [("g", 3, 3, 7)]
    upsert_frontier_batch(
        spark.createDataFrame(p, SCHEMA), table, "g", "cost", "gain", "rid",
        txn=("r", 0),
    )
    # a batch consisting ONLY of duplicates bumps the count, keeps the id
    upsert_frontier_batch(
        spark.createDataFrame([("g", 3, 3, 9)], SCHEMA),
        table, "g", "cost", "gain", "rid", txn=("r", 1),
    )
    assert _snapshot(read_frontier(spark, table)) == {("g", 3, 3): (2, 7)}
