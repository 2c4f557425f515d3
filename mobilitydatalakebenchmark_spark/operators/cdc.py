"""Changelog (CDC) application: set-based latest-wins upsert with tombstones.

Reference parity: the reference's update-else-insert paths mutate per-entity
state row-at-a-time — ``mobility_db.py:69-93`` (UPDATE … appendInstant …
else INSERT, J9) and ``postgresql_velocity.py:104-113`` (insert-only-missing
anti-join, J8). The Spark-first form is one set-based merge over the whole
batch: union the base snapshot with the changelog, keep the highest-sequence
row per key, and drop keys whose *surviving* row is a delete. This is the
Delta ``MERGE WHEN MATCHED / NOT MATCHED`` / Hudi copy-on-write pattern
expressed on plain tables.

Scale posture: cost is O(|base| + |changes|) with exactly ONE hash shuffle
on the merge key (the window's partitionBy). No per-row probes, no driver
loop; at 100 TB the base never rewrites more than once per batch, and with
a partitioned base table the union can be restricted to touched partitions
first (same dynamic-overwrite trick as ``streaming/rollup_stream.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__cdc_rn"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Merge a changelog into a base snapshot, latest-wins.

    ``seq_cols`` break ties between versions of the same key (highest wins;
    include a unique id as the last element for determinism). When
    ``delete_col`` names a boolean column, keys whose winning row has it
    true are dropped (tombstone semantics — a later re-insert resurrects
    the key, exactly like Delta MERGE applied in sequence order).
    """
    merged = base.unionByName(changes)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    latest = (
        merged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
    if delete_col is not None:
        latest = latest.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return latest
