"""Query registry: every SURVEY.md §2 operator exposed as a named query over
the driver test tables, with a DuckDB-oracle SQL twin (the t2 gate)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Q:
    """One gate entry: a Spark implementation and (when SQL-expressible) the
    equivalent DuckDB SQL over the same parquet views. ``oracle=None`` means
    the driver records a weaker rows-only check."""

    spark: SparkQuery
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = Q(spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load_registry() -> dict[str, Q]:
    """Import all query modules (side-effect: fills REGISTRY)."""
    from . import relational  # noqa: F401
    from . import tpch  # noqa: F401
    from . import windows  # noqa: F401
    from . import mobility  # noqa: F401
    from . import text  # noqa: F401
    from . import vectors  # noqa: F401
    from . import advanced  # noqa: F401

    return REGISTRY
