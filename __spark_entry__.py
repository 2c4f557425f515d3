"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every gate query from the registry in
``mobilitydatalakebenchmark_spark/plans/`` (one per SURVEY.md §2 operator
or BASELINE.json north-star operator). The local parity harness
``tools/check_oracle.py`` replicates the driver compare.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mobilitydatalakebenchmark_spark.plans import load_registry  # noqa: E402

_REGISTRY = load_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["flagship_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    BASELINE.json dedup/similarity/text operators)."""
    return {name: q.spark for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins. Keys absent here (approx/LSH-bucket ops) get the
    driver's weaker rows-only check by design."""
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
