"""Round-9 session depth gates, batch 9: window-function matrix,
shipment SLA, any-order funnel completion, canonical keep-best dedup —
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


class TestWindowFunctionMatrix:
    def test_rank_family_on_ties(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        # user 1 values (cents%100): 10, 10, 20 -> tie on 10
        rows = [
            (1, ts, 1, "v", 0.10),
            (2, ts, 1, "v", 0.10),
            (3, ts, 1, "v", 0.20),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {
            r.event_id: r
            for r in load_registry()["window_function_matrix"]
            .spark(spark, sf)
            .collect()
        }
        # row_number unique; rank gaps (1,1,3); dense_rank no gaps (1,1,2)
        assert [got[i].rn for i in (1, 2, 3)] == [1, 2, 3]
        assert [got[i].rnk for i in (1, 2, 3)] == [1, 1, 3]
        assert [got[i].drnk for i in (1, 2, 3)] == [1, 1, 2]
        # lead default -1 on the last row; lag NULL on the first
        assert got[3].lead_v == -1 and got[1].lag_v is None
        # nth_value(2) inside the running frame: NULL on row 1
        assert got[1].nth2_v is None and got[2].nth2_v == 10
        # percent_rank exact rationals: (rank-1)/(n-1)
        assert float(got[3].prank) == 1.0 and float(got[1].prank) == 0.0
        # cume_dist counts ties together: value 10 covers 2/3 rows
        assert abs(float(got[1].cdist) - 2 / 3) < 1e-6
        assert float(got[3].cdist) == 1.0

    def test_ntile_remainder_distribution(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        rows = [
            (i, ts, 1, "v", float(i) / 100) for i in range(1, 7)
        ]  # 6 rows into 4 tiles: sizes 2,2,1,1
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["window_function_matrix"].spark(
            spark, sf
        ).collect()
        tiles = sorted(r.tile4 for r in got)
        assert tiles == [1, 1, 2, 2, 3, 4]


class TestSlaShipmentReport:
    def test_lag_days_by_hand(self, spark, tmp_path):
        d0 = datetime.datetime(1995, 1, 1)
        orders = [(1, 1, "1-URGENT", 10.0, d0), (2, 1, "2-HIGH", 10.0, d0)]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderpriority string,"
            " o_totalprice double, o_orderdate timestamp",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
        li = [
            (1, 1, 1, 1.0, 10.0, 0.0, d0 + datetime.timedelta(days=5)),
            (1, 2, 2, 1.0, 10.0, 0.0, d0 + datetime.timedelta(days=20)),
            (2, 3, 3, 1.0, 10.0, 0.0, d0 + datetime.timedelta(days=40)),
        ]
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_shipdate timestamp",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        got = {
            r.priority: r
            for r in load_registry()["sla_shipment_report"]
            .spark(spark, str(tmp_path / "sf"))
            .collect()
        }
        u = got["1-URGENT"]
        assert u.n_items == 2 and u.n_within_7d == 1 and u.n_within_30d == 2
        assert float(u.sla_7d) == 0.5 and float(u.sla_30d) == 1.0
        h = got["2-HIGH"]
        assert h.n_within_30d == 0


class TestMultiEventCompletion:
    def test_window_bound_is_seven_days(self, spark, tmp_path):
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            # user 1: all three within 2 days -> complete
            (1, t0, 1, "view", 0.0),
            (2, t0 + datetime.timedelta(days=1), 1, "click", 0.0),
            (3, t0 + datetime.timedelta(days=2), 1, "purchase", 0.0),
            # user 2: spread over 9 days -> NOT complete
            (4, t0, 2, "view", 0.0),
            (5, t0 + datetime.timedelta(days=1), 2, "click", 0.0),
            (6, t0 + datetime.timedelta(days=9), 2, "purchase", 0.0),
            # user 3: missing purchase
            (7, t0, 3, "view", 0.0),
            (8, t0, 3, "click", 0.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["multi_event_completion"].spark(
            spark, sf
        ).collect()[0]
        assert got.n_users == 3 and got.n_complete == 1
        assert abs(float(got.completion_rate) - 1 / 3) < 1e-6

    def test_refresh_inside_window_counts(self, spark, tmp_path):
        # user repeats view+click later so the 7-day window around the
        # late purchase is satisfied even though the FIRST pair is old
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "view", 0.0),
            (2, t0, 1, "click", 0.0),
            (3, t0 + datetime.timedelta(days=20), 1, "view", 0.0),
            (4, t0 + datetime.timedelta(days=21), 1, "click", 0.0),
            (5, t0 + datetime.timedelta(days=22), 1, "purchase", 0.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = load_registry()["multi_event_completion"].spark(
            spark, sf
        ).collect()[0]
        assert got.n_complete == 1


class TestDedupCanonicalSelection:
    def test_keep_longest_then_lowest_id(self, spark, tmp_path):
        rows = [
            (0, "Same Text", "A", 9),
            (1, "same text", "B", 9),      # same normalized hash as 0
            (2, "  same text  ", "C", 13),  # trim: same hash, longer n_chars
            (3, "unique", "A", 6),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
        got = {
            r.source: r
            for r in load_registry()["dedup_canonical_selection"]
            .spark(spark, str(tmp_path / "sf"))
            .collect()
        }
        # doc 2 (n_chars 13) wins the duplicate group; docs 0,1 removed
        assert got["C"].n_kept == 1 and got["C"].n_removed == 0
        assert got["A"].n_kept == 1  # only "unique"
        assert got["A"].n_removed == 1
        assert got["B"].n_removed == 1 and got["B"].n_kept == 0
