"""retract_from_rollup == rebuild-from-surviving-base, incrementally."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.forget import (
    forget_rows,
    retract_from_rollup,
)
from mobilitydatalakebenchmark_spark.operators.rollup import build_rollup

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _base(spark, n=400, users=10):
    rows = [
        (
            i,
            i % users,
            T0 + datetime.timedelta(minutes=7 * i),
            ((i * 37) % 500) - 120,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "row_id long, user_id long, ts timestamp, v long")


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "user_id long")


def _plain(df):
    return sorted(
        map(
            tuple,
            df.select("bucket_ts", "n", "total", "vmin", "vmax").collect(),
        )
    )


class TestForgetRows:
    def test_anti_join_erasure(self, spark):
        base = _base(spark)
        kept = forget_rows(base, _keys(spark, [0, 3]), "user_id")
        assert kept.filter(F.col("user_id").isin(0, 3)).count() == 0
        assert kept.count() == base.filter(~F.col("user_id").isin(0, 3)).count()


class TestRetract:
    def _check(self, spark, base, ids, **kw):
        rollup = build_rollup(base, "ts", "v", bucket="hour", **kw)
        got = retract_from_rollup(
            rollup, base, _keys(spark, ids), "user_id", "ts", "v",
            bucket="hour", **kw,
        )
        want = build_rollup(
            forget_rows(base, _keys(spark, ids), "user_id"), "ts", "v",
            bucket="hour", **kw,
        )
        return got, want

    def test_equals_rebuild(self, spark):
        base = _base(spark)
        got, want = self._check(spark, base, [2, 5, 9])
        assert _plain(got) == _plain(want)

    def test_no_deletions_identity(self, spark):
        base = _base(spark)
        got, want = self._check(spark, base, [999])
        assert _plain(got) == _plain(want)

    def test_full_bucket_deletion_drops_bucket(self, spark):
        # single-user base: erasing that user empties every bucket
        rows = [(i, 1, T0 + datetime.timedelta(minutes=i), i) for i in range(50)]
        base = spark.createDataFrame(rows, "row_id long, user_id long, ts timestamp, v long")
        got, want = self._check(spark, base, [1])
        assert _plain(got) == [] and _plain(want) == []

    def test_extreme_attained_rescans_correctly(self, spark):
        # user 0 holds the global max in one bucket: retraction must
        # produce the survivors' max, not keep the stale one
        rows = [
            (1, 0, T0, 10_000),  # the extreme, deleted
            (2, 1, T0 + datetime.timedelta(minutes=1), 5),
            (3, 2, T0 + datetime.timedelta(minutes=2), 7),
            (4, 1, T0 + datetime.timedelta(hours=2), 3),
        ]
        base = spark.createDataFrame(rows, "row_id long, user_id long, ts timestamp, v long")
        got, want = self._check(spark, base, [0])
        assert _plain(got) == _plain(want)
        b0 = got.filter(F.col("bucket_ts") == T0.replace(minute=0)).collect()[0]
        assert b0["vmax"] == 7 and b0["n"] == 2

    def test_with_group_keys(self, spark):
        base = _base(spark).withColumn(
            "shard", (F.col("row_id") % 3).cast("string")
        )
        rollup = build_rollup(base, "ts", "v", keys=("shard",), bucket="hour")
        got = retract_from_rollup(
            rollup, base, _keys(spark, [1, 4]), "user_id", "ts", "v",
            keys=("shard",), bucket="hour",
        )
        want = build_rollup(
            forget_rows(base, _keys(spark, [1, 4]), "user_id"),
            "ts", "v", keys=("shard",), bucket="hour",
        )
        cols = ["bucket_ts", "shard", "n", "total", "vmin", "vmax"]
        assert sorted(map(tuple, got.select(cols).collect())) == sorted(
            map(tuple, want.select(cols).collect())
        )

    def test_sketch_rollup_rescans_touched(self, spark):
        base = _base(spark)
        rollup = build_rollup(
            base, "ts", "v", bucket="hour", distinct_col="user_id"
        )
        got = retract_from_rollup(
            rollup, base, _keys(spark, [0, 7]), "user_id", "ts", "v",
            bucket="hour", distinct_col="user_id",
        )
        want = build_rollup(
            forget_rows(base, _keys(spark, [0, 7]), "user_id"),
            "ts", "v", bucket="hour", distinct_col="user_id",
        )
        assert _plain(got) == _plain(want)
        # sketch estimates must agree bucket-for-bucket (binary form may
        # legally differ; the estimate is the contract)
        est = lambda df: sorted(  # noqa: E731
            map(
                tuple,
                df.select(
                    "bucket_ts",
                    F.round(
                        F.hll_sketch_estimate("distinct_sketch"), 6
                    ).alias("est"),
                ).collect(),
            )
        )
        assert est(got) == est(want)


class TestRetractNulls:
    """NULL-valued rows: n counts non-NULL; deletions of NULL rows must
    not poison totals or drop buckets the rebuild keeps."""

    def _rows(self, spark, rows):
        return spark.createDataFrame(
            rows, "row_id long, user_id long, ts timestamp, v long"
        )

    def _check(self, spark, base, ids):
        rollup = build_rollup(base, "ts", "v", bucket="hour")
        got = retract_from_rollup(
            rollup, base, _keys(spark, ids), "user_id", "ts", "v", bucket="hour"
        )
        want = build_rollup(
            forget_rows(base, _keys(spark, ids), "user_id"), "ts", "v", bucket="hour"
        )
        assert _plain(got) == _plain(want)

    def test_deleting_only_null_rows(self, spark):
        base = self._rows(
            spark,
            [
                (1, 0, T0, None),
                (2, 1, T0, 5),
                (3, 1, T0, 7),
            ],
        )
        self._check(spark, base, [0])  # total must stay 12, not NULL

    def test_remaining_rows_all_null(self, spark):
        base = self._rows(
            spark,
            [
                (1, 0, T0, 9),
                (2, 1, T0, None),
            ],
        )
        # deleting user 0 leaves one NULL-valued row: bucket survives
        # with n=0, exactly like the rebuild
        self._check(spark, base, [0])

    def test_untouched_all_null_bucket_passes_through(self, spark):
        import datetime

        base = self._rows(
            spark,
            [
                (1, 0, T0, None),
                (2, 1, T0 + datetime.timedelta(hours=3), 4),
            ],
        )
        self._check(spark, base, [1])

    def test_mixed_null_and_extreme_deletion(self, spark):
        base = self._rows(
            spark,
            [
                (1, 0, T0, None),
                (2, 0, T0, 100),
                (3, 1, T0, 5),
                (4, 2, T0, 50),
            ],
        )
        self._check(spark, base, [0])

if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


class TestRetractProperty:
    def test_random_bases_and_deletions(self, spark):
        """Randomized end-to-end: incremental == rebuild for many shapes —
        multiple buckets, NULLs, full-bucket wipes, extreme deletions."""
        import random

        rng = random.Random(97)
        for trial in range(4):
            rows = []
            for i in range(rng.randint(5, 120)):
                rows.append(
                    (
                        i,
                        rng.randint(0, 6),
                        T0 + datetime.timedelta(minutes=rng.randint(0, 600)),
                        None if rng.random() < 0.15 else rng.randint(-50, 50),
                    )
                )
            base = spark.createDataFrame(
                rows, "row_id long, user_id long, ts timestamp, v long"
            )
            ids = rng.sample(range(0, 7), rng.randint(0, 4))
            rollup = build_rollup(base, "ts", "v", bucket="hour")
            got = retract_from_rollup(
                rollup, base, _keys(spark, ids), "user_id", "ts", "v",
                bucket="hour",
            )
            want = build_rollup(
                forget_rows(base, _keys(spark, ids), "user_id"),
                "ts", "v", bucket="hour",
            )
            assert _plain(got) == _plain(want), (trial, ids)
