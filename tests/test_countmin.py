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


def test_property_never_undercounts_random_keys(spark):
    """Property over adversarial-ish key mixes: heavy head + long tail;
    estimates must dominate truth for EVERY key at any (d, w)."""
    from pyspark.sql import functions as F

    # zipf-ish: key = floor(sqrt(id)) gives collision-heavy small keys
    df = spark.range(0, 4000).select(
        F.floor(F.sqrt(F.col("id").cast("double"))).cast("long").alias("k")
    )
    for d, w in ((2, 8), (3, 16), (4, 64)):
        cells = countmin_build(df, "k", d=d, w=w)
        est = {
            r["k"]: r["est_n"]
            for r in countmin_estimates(
                cells, df.select("k").distinct(), "k", d=d, w=w
            ).collect()
        }
        truth = _truth(df, "k")
        assert set(est) == set(truth), (d, w)
        bad = {k: (est[k], truth[k]) for k in truth if est[k] < truth[k]}
        assert not bad, (d, w, bad)
        # total mass conservation per hash row: every row's cells sum to N
        per_row = {
            r["r"]: r["s"]
            for r in cells.groupBy("r")
            .agg(F.sum("cell").alias("s"))
            .collect()
        }
        n = df.count()
        assert all(v == n for v in per_row.values()), (d, w, per_row)


def test_unseen_keys_estimate_zero(spark):
    """CMS semantics for keys absent from the build: every one of the
    key's d cells is (usually) empty, and an empty cell means counter 0
    — the estimate must be 0 (or the collision mass if fully shadowed),
    never a dropped row or a min over only the non-empty cells."""
    from pyspark.sql import functions as F
    from mobilitydatalakebenchmark_spark.operators.countmin import (
        countmin_build,
        countmin_estimates,
    )

    seen = spark.range(0, 50).select((F.col("id") % 5).alias("k"))
    cells = countmin_build(seen, "k", d=3, w=64)
    # probe 5 seen keys + 20 unseen ones
    probes = spark.range(0, 25).select(F.col("id").alias("k"))
    est = {
        r["k"]: r["est_n"]
        for r in countmin_estimates(cells, probes, "k", d=3, w=64).collect()
    }
    assert set(est) == set(range(25))  # no probe dropped
    for k in range(5):
        assert est[k] == 10
    truth = {k: 0 for k in range(5, 25)}
    for k, t in truth.items():
        assert est[k] >= t  # never undercounts...
    # ...and with w=64 vs 5 distinct seen keys, at least one unseen key
    # has a collision-free cell somewhere, estimating exactly 0
    assert any(est[k] == 0 for k in range(5, 25))
