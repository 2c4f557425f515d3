"""Round-9 session depth gates, batch 6: delta bit-width audit, FIFO
lot allocation, cohort LTV curve, CSV source fidelity — pinned against
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


class TestDeltaBitwidth:
    def test_bitwidths_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        # deltas in µs: 1 (1 bit), 3 (2 bits), 8 (4 bits), 0 (0 bits)
        offsets_us = [0, 1, 4, 12, 12]
        rows = [
            (i + 1, base + datetime.timedelta(microseconds=us), 1, "view", 0.0)
            for i, us in enumerate(offsets_us)
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["delta_bitwidth_histogram"].spark
        got = {r.n_bits: r.n_deltas for r in q(spark, sf).collect()}
        assert got == {0: 1, 1: 1, 2: 1, 4: 1}

    def test_deltas_never_cross_users(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (1, base, 1, "view", 0.0),
            (2, base + datetime.timedelta(seconds=1), 1, "view", 0.0),
            (3, base + datetime.timedelta(days=5), 2, "view", 0.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["delta_bitwidth_histogram"].spark
        got = q(spark, sf).collect()
        # only ONE delta exists (user 1's 1s); user 2's first row has none
        assert sum(r.n_deltas for r in got) == 1
        assert got[0].n_bits == 20  # 1_000_000 µs needs 20 bits
        assert float(got[0].share) == 1.0


class TestFifoLotAllocation:
    def _run(self, spark, tmp_path, receipts, issues):
        # rows: (qty, unit_dollars) in FIFO order
        rows = []
        k = 0
        day0 = datetime.datetime(1995, 1, 1)
        for flag, lots in (("N", receipts), ("R", issues)):
            for i, (qty, unit) in enumerate(lots):
                k += 1
                rows.append(
                    (
                        k,
                        1,
                        1,
                        i + 1,
                        float(qty),
                        float(qty * unit),
                        0.0,
                        flag,
                        day0 + datetime.timedelta(days=i),
                    )
                )
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_returnflag string, l_shipdate timestamp",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        q = load_registry()["fifo_lot_allocation"].spark
        return q(spark, str(tmp_path / "sf")).collect()

    def test_textbook_fifo(self, spark, tmp_path):
        # receipts: 10 @ $1, 10 @ $2; issue: 15
        # FIFO: 10 from lot 1 ($1) + 5 from lot 2 ($2) = 1000 + 1000 cents
        got = self._run(spark, tmp_path, [(10, 1), (10, 2)], [(15, 0)])
        assert len(got) == 1
        r = got[0]
        assert r.n_allocs == 2
        assert r.qty_allocated == 15
        assert r.cost_cents == 10 * 100 + 5 * 200

    def test_issue_exceeding_stock_allocates_stock_only(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [(5, 3)], [(9, 0)])
        r = got[0]
        assert r.qty_allocated == 5 and r.cost_cents == 5 * 300

    def test_multiple_issues_split_one_lot(self, spark, tmp_path):
        # one receipt 10 @ $1; issues 4 and 6: allocations 4 and 6
        got = self._run(spark, tmp_path, [(10, 1)], [(4, 0), (6, 0)])
        r = got[0]
        assert r.n_allocs == 2 and r.qty_allocated == 10
        assert r.cost_cents == 1000


class TestCohortLtvCurve:
    def test_cumulative_per_user_by_hand(self, spark, tmp_path):
        w0 = datetime.datetime(2024, 1, 4)  # both signups in one epoch-week
        rows = [
            (1, w0, 1, "signup", 0.0),
            (2, w0, 2, "signup", 0.0),
            (3, w0 + datetime.timedelta(hours=1), 1, "purchase", 10.0),
            (4, w0 + datetime.timedelta(days=7), 1, "purchase", 20.0),
            (5, w0 + datetime.timedelta(days=7), 2, "purchase", 40.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["cohort_ltv_curve"].spark
        got = {r.age_weeks: r for r in q(spark, sf).collect()}
        assert got[0].week_cents == 1000 and got[0].cum_cents == 1000
        assert got[1].week_cents == 6000 and got[1].cum_cents == 7000
        assert got[1].n_users == 2
        assert float(got[1].ltv_per_user) == 3500.0

    def test_pre_signup_purchases_excluded(self, spark, tmp_path):
        w0 = datetime.datetime(2024, 1, 18)
        rows = [
            (1, w0, 1, "signup", 0.0),
            (2, w0 - datetime.timedelta(days=8), 1, "purchase", 99.0),
            (3, w0 + datetime.timedelta(hours=2), 1, "purchase", 5.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["cohort_ltv_curve"].spark
        got = q(spark, sf).collect()
        assert len(got) == 1 and got[0].week_cents == 500


class TestCsvRoundtrip:
    def test_microseconds_and_quoting_survive(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 5, 12, 34, 56, 789123)
        rows = [
            (1, ts, 7, "purchase", 12.34),
            (2, ts + datetime.timedelta(microseconds=1), 7, "purchase", 0.01),
            (3, ts, 8, "view, with comma", 1.5),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["csv_roundtrip_scan"].spark
        got = {r.event_type: r for r in q(spark, sf).collect()}
        p = got["purchase"]
        assert p.n == 2 and p.sum_cents == 1234 + 1
        # the 1 µs gap must survive the text round-trip
        assert p.max_us - p.min_us == 1
        # embedded comma in the type column survives quoting
        assert got["view, with comma"].n == 1
