"""CUSUM / EWMA operators vs the direct sequential recursions."""

from __future__ import annotations

import random

import pytest
pytestmark = pytest.mark.slow  # r13: heavy suite, excluded from the default fast tier (run with -m "" or -m slow)

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.timeseries import (
    cusum_alarm_summary,
    cusum_excursions,
    ewma_scaled,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "entity string, seq int, cents long")


def _cusum_ref(xs: list[int], threshold_cents: int):
    """The textbook clamped recursion, n-scaled exactly like the operator."""
    n, total = len(xs), sum(xs)
    s, series, alarms = 0, [], 0
    first = None
    for i, x in enumerate(xs):
        s = max(0, s + (n * x - total))
        series.append(s)
        if s > n * threshold_cents:
            alarms += 1
            if first is None:
                first = i
    return series, alarms, max(series), first


class TestCusum:
    def test_matches_sequential_recursion(self, spark):
        rng = random.Random(7)
        xs = [rng.randint(-500, 500) for _ in range(80)]
        # plant a mean shift in the back half
        xs += [rng.randint(200, 900) for _ in range(40)]
        df = _mk(spark, [("a", i, x) for i, x in enumerate(xs)])
        got = (
            cusum_excursions(df, "entity", ["seq"], "cents", 300)
            .orderBy("seq")
            .select("s_scaled", "alarm")
            .collect()
        )
        series, alarms, peak, first = _cusum_ref(xs, 300)
        assert [r["s_scaled"] for r in got] == series
        assert sum(r["alarm"] for r in got) == alarms
        summ = cusum_alarm_summary(
            df, "entity", ["seq"], "cents", 300, first_alarm_col="seq"
        ).collect()[0]
        assert summ["n_alarms"] == alarms
        assert summ["max_excursion_scaled"] == peak
        assert summ["first_alarm"] == first

    def test_shift_detected_steady_state_quiet(self, spark):
        # steady series: excursions stay small, no alarms at a loose threshold
        steady = [("q", i, 100 + (i % 3)) for i in range(60)]
        # shifted series: +5.00 step halfway through must alarm
        shifted = [("s", i, 100) for i in range(30)] + [
            ("s", i, 600) for i in range(30, 60)
        ]
        df = _mk(spark, steady + shifted)
        out = {
            r["entity"]: r
            for r in cusum_alarm_summary(df, "entity", ["seq"], "cents", 200).collect()
        }
        assert out["q"]["n_alarms"] == 0
        assert out["s"]["n_alarms"] > 0

    def test_partitioning_invariance(self, spark):
        rng = random.Random(11)
        rows = [
            (f"e{k}", i, rng.randint(-300, 300))
            for k in range(5)
            for i in range(50)
        ]
        df1 = _mk(spark, rows)
        df8 = df1.repartition(8)
        a = sorted(
            cusum_alarm_summary(df1, "entity", ["seq"], "cents", 150).collect()
        )
        b = sorted(
            cusum_alarm_summary(df8, "entity", ["seq"], "cents", 150).collect()
        )
        assert a == b


class TestEwma:
    def test_matches_truncated_recursion(self, spark):
        rng = random.Random(3)
        xs = [rng.randint(-1000, 1000) for _ in range(40)]
        df = _mk(spark, [("a", i, x) for i, x in enumerate(xs)])
        got = [
            r["ewma_scaled"]
            for r in ewma_scaled(df, "entity", ["seq"], "cents", window=16)
            .orderBy("seq")
            .collect()
        ]
        for t, g in enumerate(got):
            expected = sum(
                xs[t - j] * (1 << (15 - j)) for j in range(16) if t - j >= 0
            )
            assert g == expected, t

    def test_tracks_recursive_smoother_within_truncation(self, spark):
        # vs the untruncated recursion y_t = (x_t + y_{t-1}) / 2: the
        # truncated form differs by < sup|x| / 2^16
        xs = [((i * 37) % 400) - 200 for i in range(100)]
        df = _mk(spark, [("a", i, x) for i, x in enumerate(xs)])
        got = [
            r["ewma_scaled"] / 2.0**16
            for r in ewma_scaled(df, "entity", ["seq"], "cents", window=16)
            .orderBy("seq")
            .collect()
        ]
        y = 0.0
        for t, x in enumerate(xs):
            y = (x + y) / 2.0
            assert abs(got[t] - y) <= 200 / 2.0**16 + 1e-9


class TestStreamingCusum:
    def test_streamed_equals_batch(self, spark, tmp_path):
        import random

        from mobilitydatalakebenchmark_spark.streaming.stateful import streaming_cusum

        rng = random.Random(23)
        rows = []
        seq = 0
        for _ in range(120):
            for e in ("a", "b", "c"):
                rows.append((e, seq, rng.randint(-200, 400)))
                seq += 1
        df = spark.createDataFrame(rows, "entity string, seq long, cents long")

        # 6 parquet files = 6 micro-batches, seq-contiguous so arrival
        # order equals the batch sort order
        data_dir = tmp_path / "cusum_data"
        chunk = len(rows) // 6
        for i in range(6):
            spark.createDataFrame(
                rows[i * chunk : (i + 1) * chunk],
                "entity string, seq long, cents long",
            ).coalesce(1).write.parquet(str(data_dir / f"b{i}"))
        stream = (
            spark.readStream.schema("entity string, seq long, cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(data_dir / "*"))
        )
        out = streaming_cusum(stream, ref_cents=100, threshold_cents=1500)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("cusum_stream")
            .option("checkpointLocation", str(tmp_path / "cusum_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.processAllAvailable()
            q.stop()
        # last emission per entity = the stream's final state
        import pandas as pd  # noqa: F401

        emitted = spark.sql(
            "SELECT * FROM cusum_stream"
        ).toPandas()
        final = {}
        for e in ("a", "b", "c"):
            sub = emitted[emitted.entity == e]
            final[e] = sub[sub.n_events == sub.n_events.max()].iloc[0]

        ex = cusum_excursions(
            df, "entity", ["seq"], "cents", 1500, ref_cents=100
        )
        from pyspark.sql import Window

        last = (
            ex.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("entity").orderBy(F.desc("seq"))
                ),
            )
            .filter("rn = 1")
            .select("entity", "s_scaled")
            .collect()
        )
        batch_final_s = {r["entity"]: r["s_scaled"] for r in last}
        batch_sum = {
            r["entity"]: r
            for r in cusum_alarm_summary(
                df, "entity", ["seq"], "cents", 1500, ref_cents=100
            ).collect()
        }
        for e in ("a", "b", "c"):
            assert final[e]["s_scaled"] == batch_final_s[e], e
            assert final[e]["n_alarms"] == batch_sum[e]["n_alarms"], e
            assert final[e]["max_excursion_scaled"] == batch_sum[e]["max_excursion_scaled"], e
            assert final[e]["n_events"] == 120


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


class TestStreamingEwma:
    def test_streamed_equals_batch_per_row(self, spark, tmp_path):
        import random

        from mobilitydatalakebenchmark_spark.streaming.stateful import streaming_ewma

        rng = random.Random(41)
        rows = []
        seq = 0
        for _ in range(90):
            for e in ("a", "b"):
                rows.append((e, seq, rng.randint(-500, 500)))
                seq += 1
        data_dir = tmp_path / "ewma_data"
        chunk = len(rows) // 5
        for i in range(5):
            spark.createDataFrame(
                rows[i * chunk : (i + 1) * chunk],
                "entity string, seq long, cents long",
            ).coalesce(1).write.parquet(str(data_dir / f"b{i}"))
        stream = (
            spark.readStream.schema("entity string, seq long, cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(data_dir / "*"))
        )
        q = (
            streaming_ewma(stream, window=16)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("ewma_stream")
            .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.processAllAvailable()
            q.stop()
        got = {
            (r["entity"], r["seq"]): r["ewma_scaled"]
            for r in spark.sql("SELECT * FROM ewma_stream").collect()
        }
        df = spark.createDataFrame(rows, "entity string, seq long, cents long")
        want = {
            (r["entity"], r["seq"]): r["ewma_scaled"]
            for r in ewma_scaled(df, "entity", ["seq"], "cents", window=16).collect()
        }
        assert got == want
        assert len(got) == len(rows)


class TestStatefulRestart:
    """State-store persistence: stop the query, add data, restart on the
    SAME checkpoint — the resumed state must continue the series exactly
    (the production upgrade/crash-recovery path)."""

    def test_cusum_state_survives_restart(self, spark, tmp_path):
        import random

        from mobilitydatalakebenchmark_spark.streaming.stateful import (
            streaming_cusum,
        )

        rng = random.Random(53)
        rows = [("e", i, rng.randint(-150, 350)) for i in range(120)]
        data_dir = tmp_path / "rs_data"
        ckpt = str(tmp_path / "rs_ckpt")

        sink_dir = str(tmp_path / "rs_sink")

        def drain(n_files_present):
            # file sink, not memory: only durable sinks support resuming
            # from a checkpoint — which is the point of this test
            stream = (
                spark.readStream.schema("entity string, seq long, cents long")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(data_dir / "*"))
            )
            q = (
                streaming_cusum(stream, ref_cents=80, threshold_cents=900)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(180):
                q.processAllAvailable()
                q.stop()
            return spark.read.parquet(sink_dir).collect()

        # phase 1: first half only
        for i in range(3):
            spark.createDataFrame(
                rows[i * 20 : (i + 1) * 20],
                "entity string, seq long, cents long",
            ).coalesce(1).write.parquet(str(data_dir / f"b{i}"))
        drain(3)
        # phase 2: second half lands, NEW query restarts on the checkpoint
        for i in range(3, 6):
            spark.createDataFrame(
                rows[i * 20 : (i + 1) * 20],
                "entity string, seq long, cents long",
            ).coalesce(1).write.parquet(str(data_dir / f"b{i}"))
        out = drain(6)
        final = max(out, key=lambda r: r["n_events"])

        want = {
            r["entity"]: r
            for r in cusum_alarm_summary(
                spark.createDataFrame(rows, "entity string, seq long, cents long"),
                "entity", ["seq"], "cents", 900, ref_cents=80,
            ).collect()
        }["e"]
        assert final["n_events"] == 120
        assert final["n_alarms"] == want["n_alarms"]
        assert final["max_excursion_scaled"] == want["max_excursion_scaled"]


class TestEwmaWindows:
    def test_multiple_window_sizes_match_recursion(self, spark):
        import random

        rng = random.Random(7)
        xs = [rng.randint(-400, 400) for _ in range(30)]
        df = _mk(spark, [("a", i, x) for i, x in enumerate(xs)])
        for w in (4, 8, 16, 24):
            got = [
                r["ewma_scaled"]
                for r in ewma_scaled(df, "entity", ["seq"], "cents", window=w)
                .orderBy("seq")
                .collect()
            ]
            for t, g in enumerate(got):
                expected = sum(
                    xs[t - j] * (1 << (w - 1 - j)) for j in range(w) if t - j >= 0
                )
                assert g == expected, (w, t)
