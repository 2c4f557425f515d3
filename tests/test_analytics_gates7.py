"""Round-9 session depth gates, batch 7: JSONL/ORC source fidelity,
hive-partitioned pruned read (with the PartitionFilters plan pin), and
the NULL-semantics matrix — hand-computed references plus the plan
assert the oracle compare can't express."""

from __future__ import annotations

import datetime

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
    return str(tmp_path / "sf")


class TestJsonlRoundtrip:
    def test_microseconds_survive_jsonl(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 3, 1, 2, 3, 456789)
        rows = [
            (1, ts, 1, "view", 1.25),
            (2, ts + datetime.timedelta(microseconds=3), 1, "view", 2.5),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["jsonl_roundtrip_scan"].spark
        got = q(spark, sf).collect()
        assert len(got) == 1
        r = got[0]
        assert r.n == 2 and r.sum_cents == 125 + 250
        # max_us carries the full microsecond payload
        assert r.max_us % 1000000 == 456792

    def test_special_chars_in_type(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 3)
        rows = [(1, ts, 1, 'quote " and \\\\ backslash', 1.0)]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["jsonl_roundtrip_scan"].spark
        got = q(spark, sf).collect()
        assert got[0].n == 1 and got[0].n_types == 1


class TestOrcRoundtrip:
    def test_payload_fidelity(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 7, 23, 59, 59, 999999)
        rows = [
            (1, ts, 3, "view", 0.07),
            (2, ts, 13, "view", 0.09),  # same bucket 3
            (3, ts, 4, "view", 1.11),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["orc_roundtrip_scan"].spark
        got = {r.bucket: r for r in q(spark, sf).collect()}
        assert got[3].n == 2 and got[3].sum_cents == 7 + 9
        assert got[4].max_us % 1000000 == 999999


class TestPartitionedWritePrune:
    def _sf(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)  # epoch day 19723
        rows = []
        for d in range(8):  # days 19723..19730
            for i in range(3):
                rows.append(
                    (
                        d * 10 + i,
                        base + datetime.timedelta(days=d, hours=i),
                        1,
                        "view" if i else "click",
                        float(d),
                    )
                )
        return _write_events(spark, tmp_path, rows)

    def test_only_filtered_days_survive(self, spark, tmp_path):
        sf = self._sf(spark, tmp_path)
        q = load_registry()["partitioned_write_prune"].spark
        got = q(spark, sf).collect()
        days = {r.day for r in got}
        assert days == {19725, 19726, 19727}
        assert sum(r.n for r in got) == 9

    def test_partition_pruning_pinned_in_plan(self, spark, tmp_path):
        sf = self._sf(spark, tmp_path)
        q = load_registry()["partitioned_write_prune"].spark
        plan = q(spark, sf)._jdf.queryExecution().executedPlan().toString()
        # the day bounds must reach the scan as PartitionFilters — a
        # post-scan Filter over all directories would still be value-
        # correct but reads 8 days instead of 3
        assert "PartitionFilters" in plan
        head = plan[plan.index("PartitionFilters"):][:200]
        assert "19725" in head and "19727" in head


class TestNullSemanticsMatrix:
    def test_matrix_by_hand(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        # cents: 700 (NULL), 701, 701, 703, 1400 (NULL)
        vals = [7.00, 7.01, 7.01, 7.03, 14.00]
        rows = [
            (i + 1, ts, 1, "view", v) for i, v in enumerate(vals)
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["null_semantics_matrix"].spark
        got = q(spark, sf).collect()[0]
        assert got.n_rows == 5 and got.n_nonnull == 3 and got.n_nulls == 2
        assert got.sum_nonnull == 701 + 701 + 703
        assert got.min_nonnull == 701 and got.max_nonnull == 703
        assert got.n_distinct_nonnull == 2  # {701, 703}
        # GROUP BY keeps NULL as one extra group
        assert got.n_groups_with_null == 3
        # null-safe equality with NULL is TRUE exactly on the nulls
        assert got.n_nullsafe_eq_null == 2

    def test_all_null_column(self, spark, tmp_path):
        ts = datetime.datetime(2024, 1, 1)
        rows = [(1, ts, 1, "view", 7.0), (2, ts, 1, "view", 14.0)]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["null_semantics_matrix"].spark
        got = q(spark, sf).collect()[0]
        assert got.n_nonnull == 0 and got.sum_nonnull is None
        assert got.min_nonnull is None and got.n_distinct_nonnull == 0
        assert got.n_groups_with_null == 1
