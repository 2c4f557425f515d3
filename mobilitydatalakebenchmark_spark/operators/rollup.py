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
    distinct_col: str | None = None,
    lgk: int = 12,
    quantiles: bool = False,
    kll_k: int = 200,
) -> DataFrame:
    """Aggregate raw rows into per-(bucket, keys) mergeable states:
    n / total / vmin / vmax, plus — when ``distinct_col`` is given — a
    Datasketches HLL sketch of that column (``distinct_sketch``, binary).
    The sketch is the continuous-aggregate answer to COUNT(DISTINCT):
    exact distinct counts do not merge (|A ∪ B| != |A| + |B|), but HLL
    registers do (element-wise max), so a coarser distinct estimate
    re-aggregates the rollup like every other state — never the raw
    table. lgk=12 gives ~1.6% relative standard error in ~4 KB per
    bucket row. One shuffle keyed by (bucket, keys) with map-side
    partial aggregation; output cardinality is bounded by |buckets| x
    |key combos|."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    aggs = [
        F.count(val_col).alias("n"),
        F.sum(val_col).alias("total"),
        F.min(val_col).alias("vmin"),
        F.max(val_col).alias("vmax"),
    ]
    if distinct_col is not None:
        aggs.append(
            F.hll_sketch_agg(F.col(distinct_col), lgk).alias(
                "distinct_sketch"
            )
        )
    if quantiles:
        # KLL quantile sketch over the value column: exact percentiles
        # do not merge either; the KLL state does (mergeable with the
        # published normalized rank error ~1.65% at k=200), giving the
        # continuous-aggregate percentile story (p50/p95/p99 per bucket,
        # re-aggregatable to any coarser grain)
        aggs.append(
            F.kll_sketch_agg_double(F.col(val_col).cast("double"), kll_k)
            .alias("quantile_sketch")
        )
    return df.groupBy(b, *[F.col(k) for k in keys]).agg(*aggs)


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
    aggs = [
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    ]
    if "distinct_sketch" in rollup.columns:
        # HLL union is register-wise max — lossless and order-invariant,
        # so the merged sketch is IDENTICAL to sketching the coarser
        # bucket's raw rows directly (pinned by test and gate)
        aggs.append(
            F.hll_union_agg("distinct_sketch").alias("distinct_sketch")
        )
    if "quantile_sketch" in rollup.columns:
        aggs.append(
            F.kll_merge_agg_double("quantile_sketch").alias(
                "quantile_sketch"
            )
        )
    return (
        rollup.groupBy(b, *[F.col(k) for k in keys])
        .agg(*aggs)
        .withColumn("vavg", F.col("total") / F.col("n"))
    )


def approx_distinct(rollup: DataFrame) -> DataFrame:
    """Read-side estimate column from the mergeable sketch state."""
    return rollup.withColumn(
        "approx_distinct",
        F.hll_sketch_estimate(F.col("distinct_sketch")),
    )


def approx_quantiles(
    rollup: DataFrame, probs: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> DataFrame:
    """Read-side percentile columns (``p50``-style names) from the
    mergeable KLL state."""
    out = rollup
    for p in probs:
        name = f"p{str(p).replace('0.', '').ljust(2, '0')}"
        out = out.withColumn(
            name,
            F.kll_sketch_get_quantile_double(
                F.col("quantile_sketch"), F.lit(float(p))
            ),
        )
    return out
