"""Round-9 session depth gates, batch 11: seasonal-naive forecast
skill, NOT IN null trap, langid confusion matrix, SMA crossovers —
hand-computed references on constructed tables."""

from __future__ import annotations

import datetime

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
    return str(tmp_path / "sf")


class TestForecastMase:
    def test_perfect_seasonality_skill_zero(self, spark, tmp_path):
        # 24h-periodic hourly series: seasonal naive is exact, lag-1 not
        base = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day in range(3):
            for h in range(24):
                eid += 1
                rows.append(
                    (eid, base + datetime.timedelta(days=day, hours=h), 1,
                     "v", float(h % 5))
                )
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["forecast_mase_seasonal_naive"].spark(
            spark, sf
        ).collect()[0]
        assert got.sae_seasonal == 0
        assert got.sae_naive1 > 0
        assert float(got.seasonal_skill_ratio) == 0.0
        # eval rows: 72 hours minus the 24-hour warm-up
        assert got.n_eval == 48

    def test_errors_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        vals = list(range(26))  # 26 consecutive hours, values 0..25 dollars
        rows = [
            (i + 1, base + datetime.timedelta(hours=i), 1, "v", float(v))
            for i, v in enumerate(vals)
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["forecast_mase_seasonal_naive"].spark(
            spark, sf
        ).collect()[0]
        # eval rows are hours 24,25: e1 = 100 cents each; e24 = 2400 each
        assert got.n_eval == 2
        assert got.sae_naive1 == 200 and got.sae_seasonal == 4800
        assert float(got.seasonal_skill_ratio) == 24.0


class TestNotInNullTrap:
    def test_null_poisons_not_in(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for uid in (1, 2, 3):
            eid += 1
            rows.append((eid, ts, uid, "view", 0.0))
        # purchases from users 5 (NULL via %5) and 1
        for uid in (5, 1):
            eid += 1
            rows.append((eid, ts, uid, "purchase", 0.0))
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["not_in_null_trap"].spark(spark, sf).collect()[0]
        assert got.n_left == 3 and got.n_null_rhs == 1
        # the NULL in the subquery poisons NOT IN entirely
        assert got.n_not_in == 0
        # NOT EXISTS and the anti-join agree on the true complement {2,3}
        assert got.n_not_exists == 2 and got.n_anti_join == 2

    def test_without_null_all_three_agree(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        rows = [
            (1, ts, 1, "view", 0.0),
            (2, ts, 2, "view", 0.0),
            (3, ts, 1, "purchase", 0.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["not_in_null_trap"].spark(spark, sf).collect()[0]
        assert got.n_null_rhs == 0
        assert got.n_not_in == got.n_not_exists == got.n_anti_join == 1


class TestLangidConfusion:
    def test_matrix_counts(self, spark, tmp_path):
        rows = [
            (0, "the cat and the dog of it", "en", "A", 1),
            (1, "the house and the tree", "en", "A", 1),
            (2, "le chat et la maison des gens", "fr", "A", 1),
            (3, "xyzzy qwerty", "en", "A", 1),  # no markers -> 'und'
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
        got = {
            (r.declared, r.detected): r
            for r in load_registry()["langid_confusion_matrix"]
            .spark(spark, str(tmp_path / "sf"))
            .collect()
        }
        assert got[("en", "en")].n == 2
        assert got[("fr", "fr")].n == 1
        assert got[("en", "und")].n == 1
        assert got[("en", "en")].n_declared == 3
        assert abs(float(got[("en", "en")].cell_share) - 2 / 3) < 1e-6


class TestSmaCrossover:
    def _run(self, spark, tmp_path, cents_series):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i + 1, base + datetime.timedelta(minutes=i), 1, "v", c / 100.0)
            for i, c in enumerate(cents_series)
        ]
        sf = _write_events(spark, tmp_path, rows)
        return load_registry()["sma_crossover_signals"].spark(
            spark, sf
        ).collect()

    def test_warmup_excluded(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [100] * 11)
        assert got == []  # never reaches a full 12-row frame

    def test_flat_series_no_crossovers(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [100] * 20)
        r = got[0]
        assert r.n_obs == 9  # rows 12..20
        assert r.n_crossovers == 0
        assert r.min_sgn == 0 and r.max_sgn == 0

    def test_trend_reversal_crosses(self, spark, tmp_path):
        # ramp up then hard ramp down: the fast avg crosses below slow
        series = list(range(100, 100 + 16 * 10, 10)) + list(
            range(250, 250 - 10 * 30, -30)
        )
        got = self._run(spark, tmp_path, series)
        r = got[0]
        assert r.min_sgn == -1 and r.max_sgn == 1
        assert r.n_crossovers >= 1
