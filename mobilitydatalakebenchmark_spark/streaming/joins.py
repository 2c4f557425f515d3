"""Stream-stream joins with watermark-bounded state.

The reference never joins two live feeds (its ingest is a strictly ordered
replay), but any real mobility platform correlates streams — vehicle
positions with incident reports, views with purchases. Spark's
stream-stream join buffers BOTH sides in keyed state; an unbounded join
would grow forever, so the contract here is:

- both inputs carry a watermark, and
- the join condition pins the time skew (`right.ts BETWEEN left.ts AND
  left.ts + within`), so each side's state is evicted once the other
  side's watermark passes the bound.

State is therefore O(events inside the watermark+within horizon), keyed
and distributed like any shuffle — the same posture Spark's own
stream-stream join paper describes, and the plan is a
StreamingSymmetricHashJoin on the equi-key.

Outer flavors emit the unmatched row (null-padded) only when the
watermark proves no match can still arrive — the streaming analogue of
the batch left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``key`` where the right event lands
    in ``[left_ts, left_ts + within]``.

    Column names must already be disjoint apart from ``key`` (rename
    before calling); the right-side key is dropped after the join.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, f"__r_{key}"
    )
    cond = (
        (F.col(key) == F.col(f"__r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(f"__r_{key}")
