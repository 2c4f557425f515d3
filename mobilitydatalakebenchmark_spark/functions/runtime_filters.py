"""Runtime bloom-filter join pruning (the dynamic cousin of static
partition pruning — SURVEY.md §4's scan-minimization story at 100 TB).

When a selective dimension side feeds a shuffle join, Catalyst can inject a
``bloom_filter_agg`` on the build side and a ``might_contain`` probe into
the fact-side scan, discarding non-joining rows BEFORE the shuffle. On a
1000-executor cluster this is often the single biggest shuffle reducer for
star joins that are too big to broadcast.

Spark gates the rewrite on size estimates tuned for clusters
(application-side scan ≥ 10 GB by default), so local tests must lower the
thresholds — production jobs should usually keep the defaults and just
ensure the feature flag is on.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FLAG = "spark.sql.optimizer.runtime.bloomFilter.enabled"
_CREATION = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
_APPLICATION = (
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
)


def enable_runtime_bloom_filters(
    spark: SparkSession,
    creation_side_threshold: str = "10MB",
    application_side_threshold: str = "10GB",
) -> dict[str, str]:
    """Turn on runtime bloom-filter injection; returns the previous conf
    values so callers/tests can restore them."""
    prev = {
        k: spark.conf.get(k, None)
        for k in (_FLAG, _CREATION, _APPLICATION)
    }
    spark.conf.set(_FLAG, "true")
    spark.conf.set(_CREATION, creation_side_threshold)
    spark.conf.set(_APPLICATION, application_side_threshold)
    return {k: v for k, v in prev.items() if v is not None}


def restore_conf(spark: SparkSession, prev: dict[str, str]) -> None:
    for k, v in prev.items():
        spark.conf.set(k, v)
