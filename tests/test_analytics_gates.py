"""Round-9 session analytics gates: RFM segmentation, ABC/Pareto
classification, period-over-period revenue, hourly gap detection — each
pinned against a hand-computed reference on constructed tables (the gate
oracles cover engine-vs-engine parity at the test SFs; these cover the
MATH and the calendar/boundary edge cases a diff would blur)."""

from __future__ import annotations

import datetime

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


class TestRfmSegmentation:
    def test_quintiles_by_hand(self, spark, tmp_path):
        # 5 customers with strictly ordered recency/frequency/monetary:
        # customer k has k orders, latest on day k, each 100*k dollars.
        rows = []
        okey = 0
        for cust in range(1, 6):
            for j in range(cust):
                okey += 1
                rows.append((okey, cust, _ts(2024, 1, cust), 100.0 * cust))
        path = str(tmp_path / "sf")
        _write_orders(spark, path, rows)
        q = load_registry()["rfm_segmentation"].spark
        got = {
            (r.r_score, r.f_score, r.m_score): r
            for r in q(spark, path).collect()
        }
        # with n=5 every rank is its own quintile: customer 5 (most
        # recent, most frequent, biggest) scores (5,5,5); customer 1
        # scores (1,1,1); all diagonal
        assert set(got) == {(k, k, k) for k in range(1, 6)}
        assert got[(5, 5, 5)].min_custkey == 5
        assert got[(1, 1, 1)].min_custkey == 1
        # exact cents: customer 5 has 5 orders x $500
        assert got[(5, 5, 5)].segment_cents == 5 * 50000

    def test_partition_and_totals(self, spark, tmp_path):
        rows = [
            (i, i % 7, _ts(2024, 1, 1 + (i % 20)), 50.0 + i) for i in range(40)
        ]
        path = str(tmp_path / "sf")
        _write_orders(spark, path, rows)
        q = load_registry()["rfm_segmentation"].spark
        out = q(spark, path).collect()
        # the grid partitions the customer dim exactly
        assert sum(r.n_customers for r in out) == 7
        assert all(1 <= r.r_score <= 5 for r in out)
        assert all(1 <= r.f_score <= 5 for r in out)
        assert all(1 <= r.m_score <= 5 for r in out)
        # cents conserve: sum of segment cents == sum of all order cents
        assert sum(r.segment_cents for r in out) == sum(
            round((50.0 + i) * 100) for i in range(40)
        )


class TestAbcParetoClass:
    def _run(self, spark, tmp_path, part_rev):
        # one lineitem per part, discount 0, price = rev dollars
        rows = [
            (i + 1, pk, 1.0, float(rev), 0.0)
            for i, (pk, rev) in enumerate(part_rev)
        ]
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_quantity double,"
            " l_extendedprice double, l_discount double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        q = load_registry()["abc_pareto_class"].spark
        return {r.cls: r for r in q(spark, str(tmp_path / "sf")).collect()}

    def test_textbook_cuts(self, spark, tmp_path):
        # revenues 80, 15, 5: cum shares are exactly 0.80 / 0.95 / 1.00 —
        # the <= boundary keeps the 80% part in A and the 95% part in B
        got = self._run(spark, tmp_path, [(1, 80), (2, 15), (3, 5)])
        assert got["A"].n_parts == 1 and got["B"].n_parts == 1
        assert got["C"].n_parts == 1
        assert float(got["A"].revenue_share) == 0.8
        assert float(got["B"].revenue_share) == 0.15

    def test_shares_partition_revenue(self, spark, tmp_path):
        got = self._run(
            spark, tmp_path, [(k, 100 + 7 * k) for k in range(1, 30)]
        )
        total_parts = sum(r.n_parts for r in got.values())
        assert total_parts == 29
        assert abs(sum(float(r.revenue_share) for r in got.values()) - 1.0) < 1e-9

    def test_single_part_is_class_c_boundary(self, spark, tmp_path):
        # one part holds 100% of revenue: cum*100 = 100*total > 95*total
        got = self._run(spark, tmp_path, [(1, 42)])
        assert list(got) == ["C"] and got["C"].n_parts == 1


class TestPeriodOverPeriod:
    def test_calendar_joins_respect_gaps(self, spark, tmp_path):
        # months: 2023-12, 2024-01, 2024-03 (feb missing), 2024-12, 2025-01
        rows = [
            (1, 1, _ts(2023, 12, 5), 100.0),
            (2, 1, _ts(2024, 1, 5), 110.0),
            (3, 1, _ts(2024, 3, 5), 90.0),
            (4, 1, _ts(2024, 12, 5), 240.0),
            (5, 1, _ts(2025, 1, 5), 220.0),
        ]
        path = str(tmp_path / "sf")
        _write_orders(spark, path, rows)
        q = load_registry()["period_over_period_revenue"].spark
        got = {(r.y, r.m): r for r in q(spark, path).collect()}
        # January rolls over the year boundary for MoM
        assert float(got[(2024, 1)].mom_pct) == 0.1
        # March's previous calendar month (Feb) is absent: NULL, not the
        # lag-over-rows answer (Jan)
        assert got[(2024, 3)].mom_pct is None
        # YoY joins the same month last year
        assert float(got[(2025, 1)].yoy_pct) == 1.0
        assert float(got[(2024, 12)].yoy_pct) == 1.4
        # 2023-03 never existed: March 2024 has no YoY base
        assert got[(2024, 3)].yoy_pct is None


class TestTsGapDetection:
    def _run(self, spark, tmp_path, user_hours):
        rows = []
        eid = 0
        base = datetime.datetime(2024, 1, 1)
        for uid, hours in user_hours.items():
            for h in hours:
                eid += 1
                rows.append(
                    (eid, base + datetime.timedelta(hours=h, minutes=7), uid)
                )
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
        q = load_registry()["ts_gap_detection"].spark
        return {r.user_id: r for r in q(spark, str(tmp_path / "sf")).collect()}

    def test_known_gaps(self, spark, tmp_path):
        # user 1 observed at hours 0,1,4,5,9: gaps [2,3] and [6,7,8]
        got = self._run(spark, tmp_path, {1: [0, 1, 4, 5, 9]})
        r = got[1]
        assert r.span_hours == 10 and r.observed_hours == 5
        assert r.missing_hours == 5 and r.n_gaps == 2
        assert r.max_gap_hours == 3

    def test_dense_and_singleton_users(self, spark, tmp_path):
        got = self._run(
            spark, tmp_path, {1: [0, 1, 2, 3], 2: [42], 3: [0, 2]}
        )
        assert got[1].n_gaps == 0 and got[1].missing_hours == 0
        assert got[1].max_gap_hours == 0
        assert got[2].span_hours == 1 and got[2].n_gaps == 0
        assert got[3].n_gaps == 1 and got[3].max_gap_hours == 1

    def test_duplicate_hours_collapse(self, spark, tmp_path):
        # two events inside the same hour count as one observed hour
        got = self._run(spark, tmp_path, {1: [0, 0, 1, 5]})
        r = got[1]
        assert r.observed_hours == 3 and r.missing_hours == 3
        assert r.n_gaps == 1 and r.max_gap_hours == 3
