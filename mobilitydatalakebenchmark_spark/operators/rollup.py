"""Continuous-aggregate rollups (the hypertable/materialized-rollup
pattern: TimescaleDB continuous aggregates, `stores/timescaledb_store.py`
is the reference's hypertable surface — it stores raw rows only; the
rollup layer is the standard scale extension).

A rollup is a time-bucketed table of MERGEABLE partial-aggregate states
(sum, count, min, max — avg is derived, never stored). Because every
state merges associatively, a coarser query (day from hour, all-entities
from per-entity) is answered by re-aggregating the rollup — the raw table
is never rescanned. At 100 TB this is the difference between a dashboard
query touching |buckets| x |keys| rows and one touching the full fact
history; the rollup itself is one shuffle over the raw data, written once
and partitioned by bucket for pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_rollup(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    keys: tuple[str, ...] = (),
    bucket: str = "hour",
) -> DataFrame:
    """Aggregate raw rows into per-(bucket, keys) mergeable states:
    n / total / vmin / vmax. One shuffle keyed by (bucket, keys) with
    map-side partial aggregation; output cardinality is bounded by
    |buckets| x |key combos|."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    return (
        df.groupBy(b, *[F.col(k) for k in keys])
        .agg(
            F.count(val_col).alias("n"),
            F.sum(val_col).alias("total"),
            F.min(val_col).alias("vmin"),
            F.max(val_col).alias("vmax"),
        )
    )


def merge_rollup(
    rollup: DataFrame,
    bucket: str | None = None,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Re-aggregate a rollup to a coarser grain: a larger time bucket
    (``bucket``, e.g. hour -> day) and/or a key subset. States merge
    exactly (sum of sums, sum of counts, min of mins, max of maxes) —
    the result is bit-identical to aggregating the raw table, which the
    oracle gate asserts. Input is already bucket-collapsed, so this
    shuffle moves |rollup| rows, not raw data."""
    b = (
        F.date_trunc(bucket, F.col("bucket_ts")).alias("bucket_ts")
        if bucket
        else F.col("bucket_ts")
    )
    return (
        rollup.groupBy(b, *[F.col(k) for k in keys])
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        .withColumn("vavg", F.col("total") / F.col("n"))
    )
