"""Streaming session windows and watermark-bounded dedup: the streamed
result must equal the batch computation over the same files."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.streaming.sessions import (
    dedup_stream_within_watermark,
    sessionize_stream,
)

BASE = dt.datetime(2024, 3, 1, 8, 0, 0)
SCHEMA = "user_id BIGINT, event_id BIGINT, ts TIMESTAMP"


def _mk_files(spark, root):
    """Three micro-files of keyed events + a far-future flush file so the
    watermark closes every real session in append mode."""
    rows = []
    eid = 0
    for u in (1, 2):
        # session A: three events 5 min apart; session B: 90 min later
        for m in (0, 5, 10):
            rows.append((u, (eid := eid + 1), BASE + dt.timedelta(minutes=m)))
        rows.append((u, (eid := eid + 1), BASE + dt.timedelta(minutes=100)))
    # a cross-batch duplicate event_id (same user, same ts)
    rows.append((1, 2, BASE + dt.timedelta(minutes=5)))
    chunks = [rows[:3], rows[3:6], rows[6:]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            f"{root}/data/f={i}"
        )
    flush = [(u, 10_000 + u, BASE + dt.timedelta(days=2)) for u in (1, 2)]
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.parquet(
        f"{root}/data/f=9"
    )


@pytest.fixture(scope="module")
def session_dirs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_sessions"))
    _mk_files(spark, root)
    return root


def _read_stream(spark, root):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/data")
    )


def test_streamed_sessions_match_batch(spark, session_dirs):
    root = session_dirs
    q = (
        sessionize_stream(_read_stream(spark, root))
        .writeStream.format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if not q.awaitTermination(180):
        q.processAllAvailable()
        q.stop()

    flush_cut = BASE + dt.timedelta(days=1)
    streamed = {
        (r.user_id, r.session_start, r.session_last, r.n_events)
        for r in spark.read.parquet(f"{root}/out")
        .filter(F.col("session_start") < flush_cut)
        .collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_last, r.n_events)
        for r in spark.read.parquet(f"{root}/data")
        .filter(F.col("ts") < flush_cut)
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
        .collect()
    }
    assert streamed == batch
    # shape check: each user has one 3-or-4-event session and one singleton
    per_user = sorted(n for (u, *_rest, n) in streamed if u == 1)
    assert per_user == [1, 4]  # dup event rides along in the first session


def test_dedup_within_watermark_drops_cross_batch_duplicate(spark, session_dirs):
    root = session_dirs
    q = (
        dedup_stream_within_watermark(
            _read_stream(spark, root), keys=["user_id", "event_id"]
        )
        .writeStream.format("parquet")
        .option("path", f"{root}/dedup_out")
        .option("checkpointLocation", f"{root}/dedup_ckpt")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if not q.awaitTermination(180):
        q.processAllAvailable()
        q.stop()

    out = spark.read.parquet(f"{root}/dedup_out")
    total = spark.read.parquet(f"{root}/data")
    assert out.count() == total.count() - 1  # exactly the planted dup gone
    assert (
        out.groupBy("user_id", "event_id").count().filter("count > 1").count() == 0
    )
