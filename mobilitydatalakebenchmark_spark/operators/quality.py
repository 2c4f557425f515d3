"""Declarative data-quality checks (dbt-test / Deequ style), computed in
ONE aggregate pass per table.

The reference validates data only implicitly (row counts printed during
ingest, `mobility_db.py:68,115` — A7); a 100 TB training pipeline needs
explicit, cheap assertions. The scale-critical design point: a table's
whole check list compiles into a SINGLE scan-aggregate (one conditional-sum
/ count-distinct column per check), then unpivots to one report row per
check — k checks cost one pass, not k passes. Referential integrity is the
only join-bearing check (left-anti count; broadcast when the parent key
set is small).

Every report row is ``(check, n_checked, n_violations, passed)``; a suite
is the unionByName of its tables' reports.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A named violation rule: ``violation`` marks bad rows (row-level
    checks) — or, for whole-table rules, ``agg_violations`` supplies the
    violation count as an aggregate expression directly."""

    name: str
    violation: Column | None = None
    agg_violations: Column | None = None


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", violation=F.col(col).isNull())


def accepted_values(col: str, values: Sequence) -> Check:
    return Check(
        f"accepted_values({col})",
        violation=~F.col(col).isin(list(values)) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})", violation=c.isNull() | (c < lo) | (c > hi)
    )


def expression(name: str, predicate: Column) -> Check:
    """Generic row-level invariant; ``predicate`` is the PASS condition."""
    return Check(name, violation=~F.coalesce(predicate, F.lit(False)))


def unique(cols: Sequence[str]) -> Check:
    """Violations = rows beyond the first of each duplicate key group
    (count − count_distinct): 0 iff the key is unique."""
    return Check(
        f"unique({','.join(cols)})",
        agg_violations=F.count(F.lit(1))
        - F.count_distinct(*[F.col(c) for c in cols]),
    )


def table_report(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """All checks for one table in a single scan-aggregate, unpivoted to
    one row per check."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, ck in enumerate(checks):
        expr = (
            ck.agg_violations
            if ck.agg_violations is not None
            # sum over zero rows is NULL — an empty table passes every check
            else F.coalesce(F.sum(F.when(ck.violation, 1).otherwise(0)), F.lit(0))
        )
        aggs.append(expr.cast("long").alias(f"__v{i}"))
    row = df.agg(*aggs)
    per_check = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ck.name).alias("check"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, ck in enumerate(checks)
            ]
        )
    ).alias("c")
    return row.select(F.col("__n").alias("n_checked"), per_check).select(
        F.col("c.check").alias("check"),
        "n_checked",
        F.col("c.n_violations").alias("n_violations"),
        (F.col("c.n_violations") == 0).alias("passed"),
    )


def check_referential(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Orphaned-FK count via left-anti join (broadcastable parent key set)."""
    name = f"referential({fk}->{pk})"
    n_checked = child.agg(F.count(F.lit(1)).alias("n_checked"))
    orphans = (
        child.select(F.col(fk))
        .join(parent.select(F.col(pk)), child[fk] == parent[pk], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return n_checked.crossJoin(orphans).select(
        F.lit(name).alias("check"),
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# -- single-check conveniences (each still one scan; prefer table_report
# -- to batch several checks into the same pass) ----------------------------


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return table_report(df, [not_null(col)])


def check_accepted_values(df: DataFrame, col: str, values: Sequence) -> DataFrame:
    return table_report(df, [accepted_values(col, values)])


def check_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    return table_report(df, [in_range(col, lo, hi)])


def check_expression(df: DataFrame, name: str, predicate: Column) -> DataFrame:
    return table_report(df, [expression(name, predicate)])


def check_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    return table_report(df, [unique(cols)])


def run_suite(checks: Sequence[DataFrame]) -> DataFrame:
    """Union report frames into one suite report, ordered by check name."""
    return reduce(DataFrame.unionByName, checks).orderBy("check")
