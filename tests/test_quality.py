"""operators/quality.py — planted-violation coverage (the sf tables are
clean by construction, so the gate only proves parity of the counting
machinery; these tests prove the checks actually catch dirt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators import quality as q


def _by_check(df):
    return {r["check"]: (r.n_checked, r.n_violations, r.passed) for r in df.collect()}


class TestQualityChecks:
    def test_planted_violations_all_caught(self, spark):
        rows = [
            (1, "a", "en", 5),       # n_chars lies (5 vs len 1)
            (2, None, "en", 3),      # null text (also fails len check)
            (2, "bb", "xx", 2),      # dup id + bad lang
            (3, "ccc", "de", 3),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
        report = q.run_suite(
            [
                q.check_not_null(df, "text"),
                q.check_unique(df, ["doc_id"]),
                q.check_accepted_values(df, "lang", ["en", "de"]),
                q.check_in_range(df, "n_chars", 1, 4),
                q.check_expression(
                    df, "len_ok", F.col("n_chars") == F.length("text")
                ),
            ]
        )
        got = _by_check(report)
        assert got["not_null(text)"] == (4, 1, False)
        assert got["unique(doc_id)"] == (4, 1, False)
        assert got["accepted_values(lang)"] == (4, 1, False)
        assert got["in_range(n_chars,1,4)"] == (4, 1, False)
        # len_ok violations: row 1 (wrong n_chars) + row 2 (null → coalesce)
        assert got["len_ok"] == (4, 2, False)

    def test_referential_orphans(self, spark):
        child = spark.createDataFrame([(1,), (2,), (9,), (9,)], ["fk"])
        parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
        got = _by_check(q.check_referential(child, parent, "fk", "pk"))
        assert got["referential(fk->pk)"] == (4, 2, False)

    def test_clean_table_passes(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
        report = q.run_suite(
            [q.check_not_null(df, "v"), q.check_unique(df, ["id"])]
        )
        assert all(r.passed and r.n_violations == 0 for r in report.collect())

    def test_empty_table_report_shape(self, spark):
        df = spark.createDataFrame([], "id INT, v STRING")
        got = _by_check(
            q.run_suite([q.check_not_null(df, "v"), q.check_unique(df, ["id"])])
        )
        assert got["not_null(v)"] == (0, 0, True)
        assert got["unique(id)"] == (0, 0, True)
