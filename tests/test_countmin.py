"""Count-Min sketch: never undercounts, merge == one-shot build, and
estimates are exact when a key's cells are collision-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.countmin import (
    countmin_build,
    countmin_estimates,
    countmin_merge,
)


def _truth(df, key):
    return {
        r[key]: r["n"]
        for r in df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_never_undercounts(spark):
    df = spark.range(0, 3000).select((F.col("id") % 37).alias("k"))
    cells = countmin_build(df, "k", d=3, w=16)
    est = {
        r["k"]: r["est_n"]
        for r in countmin_estimates(
            cells, df.select("k").distinct(), "k", d=3, w=16
        ).collect()
    }
    truth = _truth(df, "k")
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)


def test_merge_equals_single_build(spark):
    df = spark.range(0, 5000).select((F.col("id") % 61).alias("k"))
    a = df.filter(F.col("k") % 2 == 0)
    b = df.filter(F.col("k") % 2 == 1)
    merged = {
        (r["r"], r["b"]): r["cell"]
        for r in countmin_merge(
            countmin_build(a, "k", d=3, w=32),
            countmin_build(b, "k", d=3, w=32),
        ).collect()
    }
    single = {
        (r["r"], r["b"]): r["cell"]
        for r in countmin_build(df, "k", d=3, w=32).collect()
    }
    assert merged == single


def test_exact_when_width_exceeds_keys(spark):
    # 5 keys into w=64 with d=3: md5 routing collision-free here, so
    # every estimate is exact — the sketch degrades to the truth
    df = spark.range(0, 500).select((F.col("id") % 5).alias("k"))
    cells = countmin_build(df, "k", d=3, w=64)
    est = {
        r["k"]: r["est_n"]
        for r in countmin_estimates(
            cells, df.select("k").distinct(), "k", d=3, w=64
        ).collect()
    }
    assert est == _truth(df, "k")
