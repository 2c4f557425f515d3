"""Right-to-be-forgotten cascade: delete rows AND retract their rollups.

A GDPR/CCPA erasure request deletes a user's rows from the base table —
but a lakehouse also carries derived state (continuous-aggregate rollups,
``operators/rollup.py``) that silently keeps the user's contribution
unless it is maintained too. Recomputing every rollup from scratch on
each erasure batch is the naive answer and is O(history); this module
does the incremental version:

* ``forget_rows`` — the base-table erasure: one left-anti join per table
  (the same executor-side pattern as the streaming sinks' dedup).
* ``retract_from_rollup`` — maintains a ``build_rollup`` result under
  deletion by splitting the aggregates by algebraic class:

  - ``n`` / ``total`` are **retractable** (groups under addition): the
    deleted rows' own partial states subtract off per bucket — no base
    scan at all.
  - ``vmin`` / ``vmax`` are **not retractable** (min/max is a semilattice
    — you cannot un-take a min). But a deleted row only matters if it
    ATTAINED the bucket's extreme, so only buckets where
    ``deleted_min == vmin`` or ``deleted_max == vmax`` rescan their
    SURVIVING rows — the recompute is bounded by attained-extreme
    buckets, not history.

  Buckets whose rows are all deleted drop out entirely.

Scale: the erasure batch aggregates to per-bucket partials (one shuffle
over the batch, not the base); the retract join touches |rollup| rows;
the rescan reads only the flagged buckets' partitions of the base. At
100 TB the flagged-bucket semi-join is the difference between an erasure
costing minutes and costing a full-table rebuild.

Sketch columns (HLL/KLL/Theta) are NOT retractable and not attainability-
bounded either — a deleted element may or may not have set registers —
so rollups carrying sketches must flag ALL buckets containing deletions
for rescan; pass ``distinct_col``/``quantiles`` through and this module
does exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rollup import build_rollup


def forget_rows(base: DataFrame, forget_keys: DataFrame, key_col: str) -> DataFrame:
    """The erased base table: drop every row whose ``key_col`` appears in
    ``forget_keys`` (single column, same name). Executor-side anti-join —
    no driver-side key list, any erasure-batch size."""
    return base.join(forget_keys.select(key_col), key_col, "left_anti")


def retract_from_rollup(
    rollup: DataFrame,
    base: DataFrame,
    forget_keys: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    keys: tuple[str, ...] = (),
    bucket: str = "hour",
    distinct_col: str | None = None,
    lgk: int = 12,
    quantiles: bool = False,
    kll_k: int = 200,
) -> DataFrame:
    """Maintain ``rollup`` (a ``build_rollup(base, ...)`` result) after
    erasing ``forget_keys`` from ``base``. Returns the rollup of the
    surviving base, computed incrementally.

    Must be called with the SAME grouping arguments the rollup was built
    with. ``base`` is the PRE-deletion base table.
    """
    has_sketch = distinct_col is not None or quantiles
    group = ["bucket_ts", *keys]

    deleted = base.join(forget_keys.select(key_col), key_col, "left_semi")
    # manual partials rather than build_rollup: the retraction needs the
    # deleted ROW count too — `n`/count(val) ignores NULL values, and a
    # bucket whose deletions are all NULL-valued still loses rows
    del_partials = deleted.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        *[F.col(k) for k in keys],
    ).agg(
        F.count(F.lit(1)).alias("_drows"),
        F.count(val_col).alias("_dn"),
        F.sum(val_col).alias("_dtotal"),
        F.min(val_col).alias("_dmin"),
        F.max(val_col).alias("_dmax"),
    )

    j = rollup.join(del_partials, group, "left")
    touched = F.col("_drows").isNotNull()
    new_n = F.when(touched, F.col("n") - F.col("_dn")).otherwise(F.col("n"))
    # rescan where a deleted row attained an extreme, where the bucket's
    # non-NULL count hits zero (the rollup cannot tell "remaining rows
    # are all NULL-valued" from "no rows remain" — the rescan can), or,
    # with sketches aboard, wherever anything was deleted — sketches
    # cannot retract at all. NULL-valued deletions leave min/max intact
    # (min/max ignore NULLs) and subtract 0 from total.
    if has_sketch:
        needs_rescan: Column = touched
    else:
        needs_rescan = touched & (
            F.coalesce(F.col("_dmin") <= F.col("vmin"), F.lit(False))
            | F.coalesce(F.col("_dmax") >= F.col("vmax"), F.lit(False))
            | (new_n == 0)
        )
    j = j.withColumn("_new_n", new_n).withColumn(
        "_rescan", F.coalesce(needs_rescan, F.lit(False))
    )

    adjusted = j.filter(~F.col("_rescan")).select(
        *group,
        F.col("_new_n").alias("n"),
        F.when(touched, F.col("total") - F.coalesce(F.col("_dtotal"), F.lit(0)))
        .otherwise(F.col("total"))
        .alias("total"),
        "vmin",
        "vmax",
        *(
            [F.col("distinct_sketch")] if distinct_col is not None else []
        ),
        *([F.col("quantile_sketch")] if quantiles else []),
    )

    flagged = j.filter(F.col("_rescan")).select(*group)
    survivors = forget_rows(base, forget_keys, key_col).withColumn(
        "bucket_ts", F.date_trunc(bucket, F.col(ts_col))
    )
    rescanned = build_rollup(
        survivors.join(flagged, group, "left_semi"),
        ts_col,
        val_col,
        keys=keys,
        bucket=bucket,
        distinct_col=distinct_col,
        lgk=lgk,
        quantiles=quantiles,
        kll_k=kll_k,
    )
    return adjusted.unionByName(rescanned)
