"""Continuous-aggregate rollup tests: the merge of partial states must be
exactly the direct aggregation of the raw table, at any grain."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.rollup import build_rollup, merge_rollup


def _events(spark, n=300, seed=9):
    rng = random.Random(seed)
    base = dt.datetime(2024, 2, 1)
    rows = [
        (
            base + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 5)),
            rng.choice(["a", "b", "c"]),
            round(rng.uniform(-50, 50), 6),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp, k string, value double")


def _direct(df, bucket, keys):
    return {
        tuple(r[c] for c in ["bucket_ts", *keys]): (r["n"], round(r["total"], 6), r["vmin"], r["vmax"])
        for r in df.groupBy(
            F.date_trunc(bucket, "ts").alias("bucket_ts"), *keys
        )
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }


class TestRollupMerge:
    def test_day_from_hour_equals_direct(self, spark):
        df = _events(spark)
        hourly = build_rollup(df, "ts", "value", keys=("k",), bucket="hour")
        daily = merge_rollup(hourly, bucket="day", keys=("k",))
        got = {
            (r["bucket_ts"], r["k"]): (r["n"], round(r["total"], 6), r["vmin"], r["vmax"])
            for r in daily.collect()
        }
        assert got == _direct(df, "day", ["k"])

    def test_key_subset_merge_drops_dimension(self, spark):
        df = _events(spark)
        hourly = build_rollup(df, "ts", "value", keys=("k",), bucket="hour")
        daily_all = merge_rollup(hourly, bucket="day")
        got = {
            (r["bucket_ts"],): (r["n"], round(r["total"], 6), r["vmin"], r["vmax"])
            for r in daily_all.collect()
        }
        assert got == _direct(df, "day", [])

    def test_avg_is_derived_not_stored(self, spark):
        df = _events(spark, n=50)
        hourly = build_rollup(df, "ts", "value", bucket="hour")
        assert "vavg" not in hourly.columns
        merged = merge_rollup(hourly, bucket="day")
        for r in merged.collect():
            assert abs(r["vavg"] - r["total"] / r["n"]) < 1e-12


class TestDistinctSketch:
    """Mergeable HLL distinct state (round 7): hourly sketches merged to
    any coarser grain track both the direct sketch and the exact
    distinct within their published error."""

    def test_merged_estimate_tracks_direct_and_exact(self, spark):
        from mobilitydatalakebenchmark_spark.operators.rollup import (
            approx_distinct,
        )

        df = _events(spark, n=800)
        hourly = build_rollup(
            df, "ts", "value", bucket="hour", distinct_col="k"
        )
        daily = approx_distinct(merge_rollup(hourly, bucket="day"))
        direct = df.groupBy(
            F.date_trunc("day", "ts").alias("bucket_ts")
        ).agg(
            F.countDistinct("k").alias("exact"),
            F.hll_sketch_estimate(F.hll_sketch_agg("k", 12)).alias("d"),
        )
        rows = daily.join(direct, "bucket_ts").collect()
        assert rows
        rsd = 1.04 / (2**12) ** 0.5
        for r in rows:
            assert abs(r["approx_distinct"] - r["exact"]) <= max(
                1, 5 * rsd * r["exact"]
            )
            assert abs(r["approx_distinct"] - r["d"]) <= max(
                1, 3 * rsd * r["exact"]
            )

    def test_sketch_survives_parquet_roundtrip(self, spark, tmp_path):
        """The binary state must persist and keep merging after a
        write/read cycle — the continuous-aggregate storage contract."""
        from mobilitydatalakebenchmark_spark.operators.rollup import (
            approx_distinct,
        )

        df = _events(spark, n=400)
        hourly = build_rollup(
            df, "ts", "value", bucket="hour", distinct_col="k"
        )
        p = str(tmp_path / "roll")
        hourly.write.parquet(p)
        daily = approx_distinct(
            merge_rollup(spark.read.parquet(p), bucket="day")
        )
        exact = {
            r["bucket_ts"]: r["x"]
            for r in df.groupBy(
                F.date_trunc("day", "ts").alias("bucket_ts")
            ).agg(F.countDistinct("k").alias("x")).collect()
        }
        for r in daily.collect():
            # 3 distinct keys per day — sparse-mode HLL is exact here
            assert r["approx_distinct"] == exact[r["bucket_ts"]]


class TestQuantileSketch:
    """Mergeable KLL percentile state (round 7)."""

    def test_merged_quantiles_within_rank_bounds(self, spark):
        from mobilitydatalakebenchmark_spark.operators.rollup import (
            approx_quantiles,
        )

        df = _events(spark, n=1000)
        hourly = build_rollup(df, "ts", "value", bucket="hour", quantiles=True)
        daily = approx_quantiles(
            merge_rollup(hourly, bucket="day"), probs=(0.5, 0.95)
        )
        exact = {
            r["bucket_ts"]: sorted(v["value"] for v in rows)
            for r in daily.collect()
            for rows in [
                df.filter(
                    F.date_trunc("day", "ts") == r["bucket_ts"]
                ).select("value").collect()
            ]
        }
        for r in daily.collect():
            vals = exact[r["bucket_ts"]]
            n = len(vals)
            lo50, hi50 = vals[int((n - 1) * 0.45)], vals[int((n - 1) * 0.55)]
            assert lo50 <= r["p50"] <= hi50
            assert vals[int((n - 1) * 0.90)] <= r["p95"] <= vals[-1]

    def test_sketch_merge_equals_direct_build(self, spark):
        """Merging hourly KLL states to daily must estimate like a direct
        daily sketch (same k, same data) within the rank error."""
        df = _events(spark, n=600)
        hourly = build_rollup(df, "ts", "value", bucket="hour", quantiles=True)
        merged = merge_rollup(hourly, bucket="day")
        direct = build_rollup(df, "ts", "value", bucket="day", quantiles=True)
        m = {
            r["bucket_ts"]: r["q"]
            for r in merged.select(
                "bucket_ts",
                F.kll_sketch_get_quantile_double(
                    "quantile_sketch", F.lit(0.5)
                ).alias("q"),
            ).collect()
        }
        d = {
            r["bucket_ts"]: r["q"]
            for r in direct.select(
                "bucket_ts",
                F.kll_sketch_get_quantile_double(
                    "quantile_sketch", F.lit(0.5)
                ).alias("q"),
            ).collect()
        }
        assert m.keys() == d.keys()
        for k in m:
            # both are retained data values near the true median; at a few
            # hundred rows per day KLL(k=200) retains everything -> equal
            assert abs(m[k] - d[k]) <= 1e-9, (k, m[k], d[k])
