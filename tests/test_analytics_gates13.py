"""Round-10 continuation gates, batch 13: session bounce rate, hourly
OHLC candles, degree assortativity, ratio-to-parent shares, cumulative
reach, MRR@10 — hand-computed references on constructed tables."""

from __future__ import annotations

import datetime

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
    return str(tmp_path / "sf")


def _gate(name):
    return load_registry()[name].spark


class TestSessionBounceRate:
    def test_bounce_and_depth_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1, 12, 0)
        m = datetime.timedelta(minutes=1)
        h = datetime.timedelta(hours=2)
        # user 0 (cohort 0): session A of 3 events, then a 2h gap,
        # then session B of 1 event (a bounce)
        rows = [
            (1, base, 0, "v", 1.0),
            (2, base + m, 0, "v", 1.0),
            (3, base + 2 * m, 0, "v", 1.0),
            (4, base + h, 0, "v", 1.0),
            # user 5 (cohort 0 too): one single-event session
            (5, base, 5, "v", 1.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r.cohort: r for r in
               _gate("session_bounce_rate")(spark, sf).collect()}
        c0 = got[0]
        assert c0.n_sessions == 3 and c0.n_bounce == 2
        assert c0.n_events == 5 and c0.max_session_events == 3
        assert abs(float(c0.bounce_rate) - 2 / 3) < 1e-6

    def test_fractional_second_boundary(self, spark, tmp_path):
        """The ADVICE-r10 convention pin: the 30-min gap compare is
        microsecond-exact on BOTH engines, so a 1800.5 s gap with
        fractional misalignment splits the session (old floored-seconds
        code read it as exactly 1800 and kept one session), while a gap
        of exactly 1800.0 s does NOT split (strict >)."""
        # base frac .200 + 1800.5 s -> second event frac .700, so the
        # floored-seconds diff is exactly 1800 (no split) while the
        # exact diff is 1800.5 s (split)
        base = datetime.datetime(2024, 1, 1, 12, 0, 0, 200_000)
        rows = [
            # user 1: gap 1800.5 s crossing whole-second floors such
            # that floor(b)-floor(a) == 1800 -> the floored compare
            # says "not late" but the exact compare splits
            (1, base, 1, "v", 1.0),
            (2, base + datetime.timedelta(seconds=1800, milliseconds=500),
             1, "v", 1.0),
            # user 2: gap exactly 1800.0 s -> one session on both
            (3, base, 2, "v", 1.0),
            (4, base + datetime.timedelta(seconds=1800), 2, "v", 1.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        bounce = {r.cohort: r for r in
                  _gate("session_bounce_rate")(spark, sf).collect()}
        assert bounce[1].n_sessions == 2 and bounce[1].n_bounce == 2
        assert bounce[2].n_sessions == 1 and bounce[2].n_bounce == 0
        w5 = {r.user_id: r for r in
              _gate("w5_sessionize")(spark, sf).collect()}
        assert w5[1].n_sessions == 2 and w5[2].n_sessions == 1


class TestOhlc:
    def test_candle_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1, 9, 0)
        m = datetime.timedelta(minutes=10)
        rows = [
            (1, base, 1, "p", 3.00),        # open 300
            (2, base + m, 1, "p", 9.00),    # high 900
            (3, base + 2 * m, 1, "p", 1.00),  # low 100
            (4, base + 3 * m, 1, "p", 5.00),  # close 500
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = _gate("ts_resample_ohlc")(spark, sf).collect()[0]
        assert (got.open_cents, got.high_cents, got.low_cents,
                got.close_cents, got.volume) == (300, 900, 100, 500, 4)

    def test_tie_on_ts_breaks_by_event_id(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1, 9, 0)
        rows = [
            (2, base, 1, "p", 7.00),
            (1, base, 1, "p", 4.00),  # same ts, lower id -> open
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = _gate("ts_resample_ohlc")(spark, sf).collect()[0]
        assert got.open_cents == 400 and got.close_cents == 700


class TestAssortativity:
    def test_star_graph_is_null_free_negative(self, spark, tmp_path):
        # orders {1: (10, 20)}, {2: (10, 30)}, {3: (10, 40)}: a star
        # around part 10 -> hub degree 3, leaves 1: r = -1
        li = [
            (1, 10), (1, 20),
            (2, 10), (2, 30),
            (3, 10), (3, 40),
        ]
        spark.createDataFrame(
            [(o, p, 1, datetime.datetime(2024, 1, 1), 1.0, 1.0)
             for o, p in li],
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_shipdate timestamp, l_quantity double,"
            " l_extendedprice double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        got = _gate("graph_degree_assortativity")(
            spark, str(tmp_path / "sf")
        ).collect()[0]
        # arcs: 3 edges x 2 = 6; every arc pairs degree 3 with degree 1
        assert got.n_arcs == 6
        assert got.sum_deg == 12  # 3 arcs from hub (3) + 3 from leaves (1)
        assert float(got.assortativity) == -1.0

    def test_regular_graph_pins_null(self, spark, tmp_path):
        # single edge: both endpoints degree 1 -> zero variance -> NULL
        li = [(1, 10), (1, 20)]
        spark.createDataFrame(
            [(o, p, 1, datetime.datetime(2024, 1, 1), 1.0, 1.0)
             for o, p in li],
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_shipdate timestamp, l_quantity double,"
            " l_extendedprice double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        got = _gate("graph_degree_assortativity")(
            spark, str(tmp_path / "sf")
        ).collect()[0]
        assert got.assortativity is None


class TestRatioToParent:
    def test_shares_by_hand(self, spark, tmp_path):
        spark.createDataFrame(
            [(0, "R0")], "r_regionkey long, r_name string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/region.parquet")
        spark.createDataFrame(
            [(0, "NA", 0), (1, "NB", 0)],
            "n_nationkey long, n_name string, n_regionkey long",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/nation.parquet")
        spark.createDataFrame(
            [(1, 0), (2, 1)], "c_custkey long, c_nationkey long"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/customer.parquet")
        spark.createDataFrame(
            [(1, 1, 3.0), (2, 1, 1.0), (3, 2, 4.0)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
        got = {r.nation: r for r in
               _gate("ratio_to_parent_share")(
                   spark, str(tmp_path / "sf")).collect()}
        assert got["NA"].nation_cents == 400
        assert got["NA"].region_cents == 800
        assert float(got["NA"].share_of_region) == 0.5
        assert float(got["NB"].share_of_region) == 0.5


class TestCumulativeReach:
    def test_reach_curve_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        d = datetime.timedelta(days=1)
        rows = [
            (1, base, 1, "v", 1.0),          # user 1 first day 0
            (2, base + d, 1, "v", 1.0),      # repeat, not new
            (3, base + d, 2, "v", 1.0),      # user 2 first day 1
            (4, base + 3 * d, 3, "v", 1.0),  # user 3 first day 3 (gap)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = _gate("cumulative_reach_daily")(spark, sf).collect()
        d0 = base.date().toordinal() - datetime.date(1970, 1, 1).toordinal()
        assert [(r.day - d0, r.n_new, r.users_to_date) for r in out] == [
            (0, 1, 1), (1, 1, 2), (3, 1, 3)
        ]


class TestMrr:
    def test_mrr_scaling_identity(self, spark):
        # pure arithmetic contract: 2520 div r is exact for r in 1..10
        for r in range(1, 11):
            assert 2520 % r == 0

    def test_mrr_on_corpus(self, spark):
        # on the smoke corpus: rr_scaled == 2520 div first_rel_rank and
        # mrr equals the hand mean over the returned rows
        out = _gate("retrieval_mrr_eval")(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(out) == 3
        for r in out:
            if r.first_rel_rank is not None:
                assert r.rr_scaled == 2520 // r.first_rel_rank
            else:
                assert r.rr_scaled == 0
        mean = sum(r.rr_scaled for r in out) / (len(out) * 2520)
        assert abs(float(out[0].mrr) - round(mean, 6)) < 1e-9
