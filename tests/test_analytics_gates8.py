"""Round-9 session depth gates, batch 8: per-entity R², truncation
loss, dow x hour heatmap, join-type matrix — hand-computed references
on constructed tables."""

from __future__ import annotations

import datetime

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
    return str(tmp_path / "sf")


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
    return str(tmp_path / "sf")


class TestLinregR2:
    def test_perfect_line_r2_one(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i + 1, base + datetime.timedelta(seconds=10 * i), 1, "v",
             float(2 * i))
            for i in range(6)
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["linreg_r2_per_entity"].spark(
            spark, sf
        ).collect()[0]
        assert float(got.r2) == 1.0

    def test_r2_matches_bruteforce(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        ys = [3.0, 7.0, 4.0, 9.0, 12.0, 8.0]
        rows = [
            (i + 1, base + datetime.timedelta(seconds=60 * i), 1, "v", y)
            for i, y in enumerate(ys)
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["linreg_r2_per_entity"].spark(
            spark, sf
        ).collect()[0]
        xs = [60 * i for i in range(6)]
        ycents = [int(y * 100) for y in ys]
        n = len(xs)
        sx, sy = sum(xs), sum(ycents)
        sxy = sum(x * y for x, y in zip(xs, ycents))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ycents)
        want = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert abs(float(got.r2) - want) < 1e-6

    def test_constant_y_excluded(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i + 1, base + datetime.timedelta(seconds=i), 1, "v", 5.0)
            for i in range(4)
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["linreg_r2_per_entity"].spark(spark, sf).collect()
        assert got == []  # n*syy - sy^2 == 0: undefined, filtered


class TestTruncationLoss:
    def test_losses_by_hand(self, spark, tmp_path):
        short = "w " * 99 + "w"          # 100 tokens
        long = "w " * 199 + "w"          # 200 tokens: 72 lost at 128
        rows = [(0, short, "A", 1), (1, long, "A", 1), (2, long, "B", 1)]
        sf = _write_docs(spark, tmp_path, rows)
        got = {
            r.source: r
            for r in load_registry()["truncation_loss_report"]
            .spark(spark, sf)
            .collect()
        }
        a = got["A"]
        assert a.n_docs == 2 and a.total_tokens == 300
        assert a.n_truncated == 1 and a.tokens_lost == 72
        assert float(a.doc_share_truncated) == 0.5
        assert float(a.token_share_lost) == 0.24
        assert got["B"].tokens_lost == 72


class TestDowHourHeatmap:
    def test_epoch_dow_arithmetic(self, spark, tmp_path):
        # 2024-01-01 is a Monday; (day+4)%7 maps Thursday(1970-01-01)->4,
        # so Monday -> (19723+4)%7
        ts = datetime.datetime(2024, 1, 1, 13, 30)
        rows = [(1, ts, 1, "v", 2.0), (2, ts, 1, "v", 3.0)]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["dow_hour_heatmap"].spark(spark, sf).collect()
        assert len(got) == 1
        r = got[0]
        assert r.dow == (19723 + 4) % 7
        assert r.hour == 13
        assert r.n == 2 and r.sum_cents == 500
        assert float(r.share) == 1.0


class TestJoinTypeMatrix:
    def test_null_keys_never_match(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # left side (view): users 11 (NULL via %11), 1, 2
        for uid in (11, 1, 2):
            eid += 1
            rows.append((eid, ts, uid, "view", 0.0))
        # right side (purchase): users 7 (NULL via %7), 1, 3
        for uid in (7, 1, 3):
            eid += 1
            rows.append((eid, ts, uid, "purchase", 0.0))
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["join_type_matrix"].spark(spark, sf).collect()[0]
        # left keys: NULL, 1, 2; right keys (distinct): NULL, 1, 3
        assert got.n_left_rows == 3 and got.n_right_rows == 3
        assert got.n_inner == 1       # only key 1
        assert got.n_left == 3        # 1 matched + NULL + 2 padded
        assert got.n_right == 3       # 1 matched + NULL + 3 padded
        assert got.n_full == 5        # inner 1 + left-only 2 + right-only 2
        assert got.n_semi == 1 and got.n_anti == 2

    def test_full_equals_inner_plus_onlies(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for uid in range(1, 30):
            eid += 1
            rows.append((eid, ts, uid, "view", 0.0))
            if uid % 3 == 0:
                eid += 1
                rows.append((eid, ts, uid, "purchase", 0.0))
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["join_type_matrix"].spark(spark, sf).collect()[0]
        left_only = got.n_left - got.n_inner
        right_only = got.n_right - got.n_inner
        assert got.n_full == got.n_inner + left_only + right_only
        assert got.n_semi + got.n_anti == got.n_left_rows
