"""Operator-level unit tests (SURVEY.md §5): pairing inverse property,
fixed-point inverse, direction involution, hashcons determinism, temporal
as-of vs brute force."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions import codecs
from mobilitydatalakebenchmark_spark.operators import temporal_store as ts_ops


def test_elegant_pair_inverse(spark):
    rng = random.Random(1)
    coords = [
        (round(rng.uniform(4.25, 4.45), 6), round(rng.uniform(50.79, 50.91), 6))
        for _ in range(200)
    ] + [(4.25, 50.79), (4.45, 50.91), (0.0, 0.0), (-179.999999, 89.999999)]
    df = spark.createDataFrame(coords, "lon double, lat double")
    z = codecs.elegant_pair(F.col("lon"), F.col("lat"))
    lon2, lat2 = codecs.elegant_unpair(z)
    rows = df.select("lon", "lat", lon2.alias("lon2"), lat2.alias("lat2")).collect()
    for r in rows:
        assert math.isclose(r.lon, r.lon2, abs_tol=1e-9), r
        assert math.isclose(r.lat, r.lat2, abs_tol=1e-9), r


def test_cantor_pair_monotone_unique(spark):
    rng = random.Random(2)
    coords = [
        (round(rng.uniform(4.25, 4.45), 6), round(rng.uniform(50.79, 50.91), 6))
        for _ in range(500)
    ]
    df = spark.createDataFrame(set(coords), "lon double, lat double")
    z = codecs.cantor_pair(F.col("lon"), F.col("lat"))
    vals = [r.z for r in df.select(z.alias("z")).collect()]
    # pairing must be injective on distinct inputs
    assert len(set(vals)) == len(vals)


def test_fixed_point_inverse(spark):
    rng = random.Random(3)
    data = [(round(rng.uniform(4.25, 4.45), 8), 4.25) for _ in range(300)]
    df = spark.createDataFrame(data, "x double, mn double")
    enc = codecs.encode_fixed_point(F.col("x"), F.col("mn"))
    dec = codecs.decode_fixed_point(enc, F.col("mn"))
    for r in df.select("x", dec.alias("x2")).collect():
        assert math.isclose(r.x, r.x2, abs_tol=1e-8), r


def test_direction_involution(spark):
    df = spark.createDataFrame([(1,), (2,)], "d int")
    out = df.select(
        "d", codecs.decode_direction(codecs.encode_direction(F.col("d"))).alias("d2")
    ).collect()
    assert all(r.d == r.d2 for r in out)


def test_hashcons_deterministic(spark):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "s string, i int")
    out = df.select(codecs.hashcons_key(F.col("s"), F.col("i")).alias("h")).collect()
    assert out[0].h == out[1].h
    assert out[0].h != out[2].h
    assert len(out[0].h) == 32  # full digest by default (collision safety)
    short = df.select(codecs.hashcons_key(F.col("s"), length=8).alias("h")).collect()
    assert len(short[0].h) == 8  # reference-parity truncation still available


def test_asof_matches_bruteforce(spark):
    rng = random.Random(4)
    instants = sorted(
        (float(t), rng.uniform(0, 100)) for t in rng.sample(range(0, 100000), 50)
    )
    seq = [
        {"ts": f"2024-01-01 00:00:{i:02d}", "value": v}
        for i, (_, v) in enumerate(instants[:50])
    ]
    # build array<struct<ts,value>> row
    df = spark.createDataFrame(
        [(seq,)], "seq array<struct<ts:string, value:double>>"
    ).select(
        F.transform(
            "seq",
            lambda x: F.struct(
                x["ts"].cast("timestamp").alias("ts"), x["value"].alias("value")
            ),
        ).alias("seq")
    )
    for probe_i in (0, 7, 23, 49):
        probe = f"2024-01-01 00:00:{probe_i:02d}"
        got = df.select(
            ts_ops.as_of(F.col("seq"), F.lit(probe).cast("timestamp")).alias("v")
        ).collect()[0].v
        want = seq[probe_i]["value"]  # exact-instant hit
        assert math.isclose(got, want, rel_tol=1e-12)
    # probe before the first instant -> NULL
    got = df.select(
        ts_ops.as_of(F.col("seq"), F.lit("2023-12-31 00:00:00").cast("timestamp")).alias("v")
    ).collect()[0].v
    assert got is None
    # exact-instant extraction + containment
    got = df.select(
        ts_ops.at_timestamp(F.col("seq"), F.lit("2024-01-01 00:00:07").cast("timestamp")).alias("v"),
        ts_ops.contains_instant(F.col("seq"), F.lit("2024-01-01 00:00:07").cast("timestamp")).alias("c"),
    ).collect()[0]
    assert math.isclose(got.v, seq[7]["value"], rel_tol=1e-12)
    assert got.c is True


def test_epoch_helpers_tolerate_all_ts_dtypes(spark):
    """epoch_us/epoch_s must return identical values whether the source
    column arrived as TIMESTAMP, TIMESTAMP_NTZ (new driver data), or raw
    bigint nanos (legacy nanosAsLong read) — the three generations of the
    events.ts column."""
    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.functions.codecs import epoch_s, epoch_us

    iso = ["2024-03-21 13:52:00.123456", "1999-12-31 23:59:59.999999",
           "2024-03-21 00:00:00"]
    base = spark.createDataFrame([(s,) for s in iso], "iso string")
    as_ts = base.select(F.col("iso").cast("timestamp").alias("ts"))
    as_ntz = base.select(F.col("iso").cast("timestamp_ntz").alias("ts"))
    as_nanos = base.select(
        (F.unix_micros(F.col("iso").cast("timestamp")) * 1000).alias("ts")
    )
    assert dict(as_ntz.dtypes)["ts"] == "timestamp_ntz"
    assert dict(as_nanos.dtypes)["ts"] == "bigint"

    def vals(df, fn, dtype=None):
        return [r.v for r in df.select(fn("ts", dtype=dtype).alias("v")).collect()]

    us_ts = vals(as_ts, epoch_us)
    assert us_ts == vals(as_ntz, epoch_us)
    assert us_ts == vals(as_nanos, epoch_us, dtype="bigint")
    assert us_ts[0] == 1711029120123456  # 2024-03-21T13:52:00.123456Z

    s_ts = vals(as_ts, epoch_s)
    assert s_ts == vals(as_ntz, epoch_s)
    assert s_ts == vals(as_nanos, epoch_s, dtype="bigint")
    assert s_ts[0] == 1711029120


def test_surrogate_keys_matches_global_row_number(spark):
    """Range-partitioned numbering must equal row_number() OVER (ORDER BY k)
    regardless of input partitioning, including duplicate keys (ties take
    distinct consecutive ids) and a num_ranges larger than the row count."""
    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.functions.codecs import surrogate_keys

    rows = [(k, f"v{k}_{i}") for k in (5, 1, 9, 3, 5, 7, 1) for i in range(3)]
    df = spark.createDataFrame(rows, "k int, payload string").repartition(7)
    out = surrogate_keys(df, "k").orderBy("surrogate_id").collect()
    assert [r.surrogate_id for r in out] == list(range(1, len(rows) + 1))
    ks = [r.k for r in out]
    assert ks == sorted(ks)  # ids dense and ordered by key
    # ids are a permutation-stable function of k-order: re-run with
    # different partitioning and num_ranges
    out2 = (
        surrogate_keys(df.repartition(3), "k", num_ranges=50)
        .orderBy("surrogate_id")
        .collect()
    )
    assert [r.k for r in out2] == ks


def test_surrogate_keys_column_orderings(spark):
    """Column ordering expressions (desc, explicit null placement) must
    reproduce the matching partition-less row_number() numbering."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.functions.codecs import surrogate_keys

    rows = [
        (i, None if i % 7 == 0 else (i * 13) % 40, (i * 37) % 50)
        for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "id long, v long, c long").repartition(9)
    cases = [
        [F.desc("c"), F.asc("id")],
        [F.col("v").asc_nulls_first(), F.col("id")],
        [F.col("v").asc_nulls_last(), F.col("id")],
        [F.col("v").desc_nulls_last(), F.col("id")],
    ]
    for order in cases:
        ref = df.select(
            "id",
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("r"),
        ).orderBy("id").collect()
        got = surrogate_keys(df, order, out_col="r").orderBy("id").collect()
        assert [(r.id, r.r) for r in ref] == [(r.id, r.r) for r in got], order


def test_prefix_sums_matches_running_sum_window(spark):
    """prefix_sums must equal sum() OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING..CURRENT ROW) plus the matching rank and grand totals, for
    asc and desc orderings, any input partitioning, empty and 1-row
    inputs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.functions.codecs import prefix_sums

    rows = [(i, (i * 37) % 50, (i * 13) % 40) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, c long, x long").repartition(11)
    for order in (["c", "id"], [F.desc("c"), F.asc("id")]):
        ocols = [F.col(o) if isinstance(o, str) else o for o in order]
        w = Window.orderBy(*ocols)
        ref = df.select(
            "id",
            F.sum("c").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
            F.row_number().over(w).cast("long").alias("rk"),
        ).orderBy("id").collect()
        got = prefix_sums(
            df, order, ["c"], out_cols=["cum"], rank_col="rk",
            total_cols={"c": "tc", "x": "tx"},
        ).orderBy("id").collect()
        assert [(r.id, r.cum, r.rk) for r in ref] == [
            (r.id, r.cum, r.rk) for r in got
        ]
        assert all(r.tc == sum(r2[1] for r2 in rows) for r in got)
        assert all(r.tx == sum(r2[2] for r2 in rows) for r in got)
    # degenerate shapes
    assert prefix_sums(df.filter("id < 0"), ["c", "id"], ["c"]).count() == 0
    one = prefix_sums(
        df.filter("id = 1"), ["c", "id"], ["c"], rank_col="rk",
        total_cols={"c": "tc"},
    ).collect()
    assert one[0].cum_c == one[0].tc and one[0].rk == 1


def test_grouped_surrogate_keys_matches_grouped_row_number(spark):
    """grouped_surrogate_keys must equal row_number() OVER (PARTITION BY
    group ORDER BY ...) plus count(*) OVER (PARTITION BY group), for
    single- and multi-column orderings, NULL group values, tiny
    num_ranges (groups spanning ranges) and large num_ranges (many
    groups per range), and 0/1-row inputs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.functions.codecs import (
        grouped_surrogate_keys,
    )

    rows = [
        (
            i,
            None if i % 17 == 0 else f"src{(i * 7) % 5}",
            (i * 37) % 50,
        )
        for i in range(1, 201)
    ]
    df = spark.createDataFrame(rows, "id long, src string, v long").repartition(9)
    w = Window.partitionBy("src").orderBy("v", "id")
    ref = df.select(
        "id",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("n_g"),
    ).orderBy("id").collect()
    for nr in (2, 64):
        got = (
            grouped_surrogate_keys(
                df, "src", ["v", "id"], out_col="r", count_col="n_g",
                num_ranges=nr,
            )
            .orderBy("id")
            .collect()
        )
        assert [(r.id, r.r, r.n_g) for r in ref] == [
            (r.id, r.r, r.n_g) for r in got
        ], nr
    # ordering expressions (desc) and multi-column groups
    w2 = Window.partitionBy("src").orderBy(F.desc("v"), F.asc("id"))
    ref2 = df.select(
        "id", F.row_number().over(w2).cast("long").alias("r")
    ).orderBy("id").collect()
    got2 = (
        grouped_surrogate_keys(
            df, ["src"], [F.desc("v"), F.asc("id")], out_col="r", num_ranges=5
        )
        .orderBy("id")
        .collect()
    )
    assert [(r.id, r.r) for r in ref2] == [(r.id, r.r) for r in got2]
    # degenerate shapes
    assert (
        grouped_surrogate_keys(df.filter("id < 0"), "src", ["v", "id"]).count()
        == 0
    )
    one = grouped_surrogate_keys(
        df.filter("id = 1"), "src", ["v", "id"], out_col="r", count_col="n_g"
    ).collect()
    assert one[0].r == 1 and one[0].n_g == 1


def test_range_count_guard_raises_past_33_bits(spark):
    """Any range holding >= 2^33 rows must raise instead of silently
    overflowing monotonically_increasing_id's row-offset field (the
    counts are already collected, so the guard is free)."""
    import pytest

    from mobilitydatalakebenchmark_spark.functions.codecs import (
        _MAX_RANGE_ROWS,
        _guard_range_counts,
    )

    _guard_range_counts({0: 10, 1: _MAX_RANGE_ROWS - 1})  # fine
    with pytest.raises(ValueError, match="2\\^33"):
        _guard_range_counts({0: 10, 1: _MAX_RANGE_ROWS})
