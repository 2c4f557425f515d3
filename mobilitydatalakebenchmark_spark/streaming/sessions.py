"""Streaming session windows + watermarked deduplication.

The batch gate ``session_window_native`` verifies the semantics; these
wrappers run the SAME expression incrementally: watermark bounds the
session state, and a session emits (append mode) once the watermark passes
its close. Late events inside the watermark re-open/merge their session;
later ones are dropped — the streaming contract the reference's strictly
ordered replay never needed, but any real feed does.

Scale posture: state is per (key, open session) and watermark-bounded, so
memory is O(active sessions), not O(history); keys distribute across
executors like any keyed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked session aggregation (append-mode compatible): one row
    per closed session with start/last/event count."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key, F.session_window(ts_col, gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_last"),
            F.count("*").alias("n_events"),
        )
        .select(key, "session_start", "session_last", "n_events")
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Cross-micro-batch exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps a key's state only until the
    watermark passes it (vs. dropDuplicates' unbounded state)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
