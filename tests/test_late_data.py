"""Unit tests for the streaming_late_data_window gate: hand-computed
micro-batches pinning (a) that rows delivered after the watermark passed
their window are dropped, and (b) the measured one-batch LAG of the
input-side late filter that makes the gate's double pre-late sentinel
necessary (micro-batch N filters with the watermark derived from batches
<= N-2, while emission uses the batch's own updated watermark)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import time

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.plans import load_registry
from mobilitydatalakebenchmark_spark.session import local_df


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


class _BatchWriter:
    """Sequential micro-batch writer with pinned file mtimes (the
    FileStreamSource batches by modification time; colliding mtimes
    would race the arrival order the tests depend on)."""

    def __init__(self, spark, src):
        self.spark, self.src, self.seen, self.i = spark, src, set(), 0
        self.base = time.time() - 3600.0

    def write(self, rows):
        self.i += 1
        local_df(self.spark, rows, "ts timestamp, k string").coalesce(
            1
        ).write.mode("append").parquet(self.src)
        for f in glob.glob(os.path.join(self.src, "*.parquet")):
            if f not in self.seen:
                self.seen.add(f)
                mt = self.base + self.i * 60.0
                os.utime(f, (mt, mt))


def _run_hourly_append(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "k", "n")
    )
    sq = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return {
        (r.ws.hour, r.k): r.n
        for r in spark.read.parquet(out).collect()
        if r.k != "s"
    }


class TestLateFilterSemantics:
    def test_double_sentinel_drops_all_late_rows(self, spark, tmp_path):
        # on-time hours 10/12, TWO far-future sentinels, then rows late
        # beyond the watermark, then a trailing flush sentinel: every
        # held-back row must be dropped — including ones re-opening an
        # evicted window AND ones whose window never had state
        w = _BatchWriter(spark, str(tmp_path / "src"))
        w.write([(_t(10, 5), "a"), (_t(12, 5), "a")])
        w.write([(_t(20, 0), "s")])  # sentinel A: wm -> 19:00
        w.write([(_t(20, 30), "s")])  # sentinel B: filter-wm catches up
        w.write(
            [
                (_t(10, 10), "late_samewin"),
                (_t(11, 10), "late_newwin"),
                (_t(12, 10), "late_into_a"),
            ]
        )
        w.write([(_t(23, 0), "s")])  # flush: a leak would emit here
        got = _run_hourly_append(
            spark, w.src, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        assert got == {(10, "a"): 1, (12, "a"): 1}

    def test_filter_watermark_lags_one_batch(self, spark, tmp_path):
        # the measured quirk the gate's double sentinel exists for:
        # with only ONE sentinel before the late batch, the late batch
        # is filtered by the ON-TIME watermark (batches <= N-2), so a
        # held-back row in a fresh-enough window leaks through and is
        # emitted as re-opened state. If a Spark upgrade starts
        # filtering with the current watermark, this test failing is
        # the signal the gate can drop back to a single sentinel.
        w = _BatchWriter(spark, str(tmp_path / "src"))
        w.write([(_t(10, 5), "a"), (_t(12, 5), "a")])
        w.write([(_t(20, 0), "s")])  # single sentinel: wm -> 19:00
        # late batch filtered with wm from batches <= 0: 12:05 - 1h =
        # 11:05 -> window [11,12) end 12:00 > 11:05 leaks; [10,11)
        # end 11:00 <= 11:05 is dropped
        w.write([(_t(10, 10), "late_dropped"), (_t(11, 10), "late_leaks")])
        w.write([(_t(23, 0), "s")])
        got = _run_hourly_append(
            spark, w.src, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        assert (10, "late_dropped") not in got
        assert got[(11, "late_leaks")] == 1

    def test_gate_matches_on_time_rollup(self, spark, tmp_path):
        # the registry gate end-to-end on a 3-hour hand corpus: the
        # %4==3 holdback (ids 3, 7) must vanish from the emitted rollup
        rows = [
            (0, dt.datetime(2024, 3, 1, 9, 10), "view"),
            (1, dt.datetime(2024, 3, 1, 9, 20), "view"),
            (2, dt.datetime(2024, 3, 1, 10, 5), "purchase"),
            (3, dt.datetime(2024, 3, 1, 10, 40), "purchase"),  # held back
            (4, dt.datetime(2024, 3, 1, 11, 5), "view"),
            (5, dt.datetime(2024, 3, 1, 11, 6), "click"),
            (6, dt.datetime(2024, 3, 1, 11, 7), "click"),
            (7, dt.datetime(2024, 3, 1, 11, 59), "click"),  # held back
        ]
        local_df(
            spark, rows, "event_id long, ts timestamp, event_type string"
        ).write.parquet(str(tmp_path / "events.parquet"))
        out = (
            load_registry()["streaming_late_data_window"]
            .spark(spark, str(tmp_path))
            .collect()
        )
        got = {(r.window_start, r.event_type): r.n for r in out}
        assert got == {
            ("2024-03-01 09:00:00", "view"): 2,
            ("2024-03-01 10:00:00", "purchase"): 1,
            ("2024-03-01 11:00:00", "view"): 1,
            ("2024-03-01 11:00:00", "click"): 2,
        }

    def test_no_heldback_contribution_at_gate_scale(self, spark):
        """ADVICE-r10 canary for the direction
        test_filter_watermark_lags_one_batch does NOT cover: if a Spark
        change made the input-side late filter lag MORE than one batch
        behind, the gate's two pre-late sentinels would no longer cover
        the lag and held-back (%4==3) rows would silently re-open
        windows. Pin the contract loudly at real-gate scale: the
        emitted rollup's total must equal the on-time row count EXACTLY
        — any held-back leak inflates it."""
        sf = "/root/testdata/sf0.001"
        out = (
            load_registry()["streaming_late_data_window"]
            .spark(spark, sf)
            .agg(F.sum("n").alias("total"))
            .first()
        )
        ev = spark.read.parquet(f"{sf}/events.parquet")
        n_on_time = ev.filter(F.col("event_id") % 4 != 3).count()
        n_all = ev.count()
        assert out.total == n_on_time, (
            f"emitted {out.total} != on-time {n_on_time}: "
            f"{out.total - n_on_time} held-back rows leaked — the "
            "input-side late-filter lag likely changed; re-measure the "
            "sentinel count in streaming_late_data_window"
        )
        assert n_on_time < n_all  # the holdback is non-empty by design
