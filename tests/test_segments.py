"""Theta-sketch segment set algebra (operators/segments.py): planted
overlaps must be recovered exactly while cardinalities stay in the
sketch's exact mode, and the estimates must be symmetric-consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.segments import (
    segment_overlap,
    segment_sketches,
)


def _facts(spark):
    rows = (
        [("a", i) for i in range(0, 100)]          # A = 0..99
        + [("b", i) for i in range(50, 150)]       # B = 50..149, |A^B|=50
        + [("c", i) for i in range(200, 210)]      # C disjoint, |C|=10
        + [("a", i) for i in range(0, 100)]        # duplicates ignored
    )
    return spark.createDataFrame(rows, "seg string, uid long")


def test_planted_overlaps_recovered(spark):
    sk = segment_sketches(_facts(spark), "seg", "uid")
    sizes = {r["segment"]: r["approx_distinct"] for r in sk.collect()}
    assert sizes == {"a": 100, "b": 100, "c": 10}

    ov = {
        (r.seg_a, r.seg_b): (r.est_intersection, r.est_union, r.est_jaccard)
        for r in segment_overlap(sk).collect()
    }
    assert ov[("a", "b")][0] == 50 and ov[("a", "b")][1] == 150
    assert abs(ov[("a", "b")][2] - 50 / 150) < 1e-9
    assert ov[("a", "c")][0] == 0 and ov[("a", "c")][1] == 110
    assert ov[("b", "c")][0] == 0


def test_one_row_per_unordered_pair(spark):
    ov = segment_overlap(segment_sketches(_facts(spark), "seg", "uid"))
    pairs = [(r.seg_a, r.seg_b) for r in ov.collect()]
    assert sorted(pairs) == [("a", "b"), ("a", "c"), ("b", "c")]
    assert all(a < b for a, b in pairs)
