"""Plan-assertion helpers: verify that the physical plan Catalyst produced
is the plan we designed for (pushdown reached the scan, small sides
broadcast, codegen covers the hot path). Used by tests/test_plans.py —
the 100 TB design is enforced, not assumed."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True when `fragment` appears inside a PushedFilters: [...] clause."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the parquet ReadSchema clauses (pruning check)."""
    import re

    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema:" in line:
            cols.extend(re.findall(r"(\w+):", line.split("ReadSchema:")[1]))
    return cols


def count_broadcast_joins(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def count_sortmerge_joins(df: DataFrame) -> int:
    return physical_plan(df).count("SortMergeJoin")


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the physical plan (AQE may collapse at runtime)."""
    plan = physical_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_partition_filter(df: DataFrame, column: str) -> bool:
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PartitionFilters:" in line and column in line:
            return True
    return False


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen span count in the FINAL adaptive plan — AQE only
    materializes codegen stages once the query has executed."""
    import re

    df.collect()  # count() would build a separate QueryExecution
    plan = physical_plan(df)
    # codegen stages appear as "*(n) Operator" stars in the final plan
    stages = {m for m in re.findall(r"\*\((\d+)\)", plan)}
    return max(len(stages), plan.count("WholeStageCodegen"))
