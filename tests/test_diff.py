"""snapshot_diff: statuses, NULL-safe column verdicts, summary counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.diff import diff_summary, snapshot_diff


@pytest.fixture(scope="module")
def versions(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (3, "c", None),
            (4, None, 40),
            (5, "e", 50),
        ],
        "k long, s string, v int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),       # unchanged
            (2, "B", 20),       # changed s
            (3, "c", 30),       # changed v (NULL -> 30)
            (4, None, 40),      # unchanged (NULL == NULL null-safely)
            (6, "f", 60),       # added; 5 removed
        ],
        "k long, s string, v int",
    )
    return old, new


class TestSnapshotDiff:
    def test_statuses_and_column_flags(self, versions):
        old, new = versions
        d = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
        assert d[1]["status"] == "unchanged"
        assert d[2]["status"] == "changed" and d[2]["changed_s"] and not d[2]["changed_v"]
        assert d[3]["status"] == "changed" and d[3]["changed_v"] and not d[3]["changed_s"]
        assert d[4]["status"] == "unchanged"  # NULL == NULL is not a change
        assert d[5]["status"] == "removed" and not d[5]["changed_s"]
        assert d[6]["status"] == "added" and not d[6]["changed_v"]

    def test_summary_counts(self, versions):
        old, new = versions
        s = {
            r["status"]: r
            for r in diff_summary(snapshot_diff(old, new, ["k"])).collect()
        }
        assert s["unchanged"]["n_rows"] == 2
        assert s["changed"]["n_rows"] == 2
        assert s["added"]["n_rows"] == 1
        assert s["removed"]["n_rows"] == 1
        assert s["changed"]["n_changed_s"] == 1
        assert s["changed"]["n_changed_v"] == 1

    def test_compare_cols_subset(self, versions):
        old, new = versions
        # compare only s: row 3's v change becomes invisible
        d = {
            r["k"]: r["status"]
            for r in snapshot_diff(old, new, ["k"], ["s"]).collect()
        }
        assert d[3] == "unchanged"
        assert d[2] == "changed"

    def test_identical_snapshots_all_unchanged(self, versions):
        old, _ = versions
        s = diff_summary(snapshot_diff(old, old, ["k"])).collect()
        assert len(s) == 1 and s[0]["status"] == "unchanged" and s[0]["n_rows"] == 5

    def test_stays_jvm_side(self, versions):
        old, new = versions
        plan = (
            snapshot_diff(old, new, ["k"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
