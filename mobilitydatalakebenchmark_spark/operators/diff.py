"""Snapshot diff: keyed row-level comparison of two table versions.

The versioned store (``operators/versioned_store.py``) answers "what did
the table look like at version k"; this module answers the follow-up a
data-ops pipeline actually asks: "what CHANGED between two snapshots" —
the audit step before promoting a new training-corpus build, the drift
report between yesterday's and today's extract, the regression screen
after a backfill.

One full outer join on the key columns; row identity beyond the key is
compared column-by-column with null-safe equality (``eqNullSafe`` — the
engine's ``IS NOT DISTINCT FROM``), so NULL→value and value→NULL both
count as changes and NULL==NULL does not. No hashing is involved in the
verdict (hashes would give yes/no; the join gives WHICH columns moved).

Scale: the single shuffle is the outer join on the key (both sides
hash-partitioned); per-column comparison is pure codegen. For 100 TB
snapshots stored partitioned on the same key layout, the join is
co-located; pre-filtering both sides to a partition range diffs one
slice at a time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff ``left`` (old) → ``right`` (new).

    Returns one row per key present in either side with:

    * ``status`` — ``added`` (key only in right), ``removed`` (only in
      left), ``changed`` (both sides, any compare column differs),
      ``unchanged``;
    * ``changed_<col>`` boolean per compare column (NULL-safe inequality;
      false for added/removed rows).
    """
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in key_cols]
    # presence sentinels survive the outer join (a real row can't have a
    # NULL literal-True), so side membership needs no hashing
    j = (
        left.select(*key_cols, *[F.col(c).alias(f"_l_{c}") for c in compare_cols])
        .withColumn("_in_l", F.lit(True))
        .join(
            right.select(
                *key_cols, *[F.col(c).alias(f"_r_{c}") for c in compare_cols]
            ).withColumn("_in_r", F.lit(True)),
            key_cols,
            "full_outer",
        )
    )
    def differs(c: str) -> Column:
        return ~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))

    any_changed: Column = F.lit(False)
    for c in compare_cols:
        any_changed = any_changed | differs(c)
    status = (
        F.when(F.col("_in_l").isNull(), F.lit("added"))
        .when(F.col("_in_r").isNull(), F.lit("removed"))
        .when(any_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    both = F.col("_in_l").isNotNull() & F.col("_in_r").isNotNull()
    return j.select(
        *key_cols,
        status.alias("status"),
        *[
            F.when(both, differs(c)).otherwise(F.lit(False)).alias(f"changed_{c}")
            for c in compare_cols
        ],
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Aggregate a ``snapshot_diff`` result into the drift report: row
    counts per status plus, for each compare column, how many surviving
    rows changed it. One scan, one 4-row output."""
    changed_cols = [c for c in diff.columns if c.startswith("changed_")]
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).cast("long")).alias(f"n_{c}")
            for c in changed_cols
        ],
    )
