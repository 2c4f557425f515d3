"""Runtime bloom-filter join pruning: the filter must be injected into the
physical plan for a selective shuffle join, and must not change results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions.runtime_filters import (
    enable_runtime_bloom_filters,
    restore_conf,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def shuffle_join_conf(spark):
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # local parquet is tiny; drop the size gates so the rewrite fires
    prev = enable_runtime_bloom_filters(
        spark, creation_side_threshold="100MB", application_side_threshold="1KB"
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    restore_conf(spark, prev)


def _join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


def test_bloom_filter_injected_and_result_unchanged(spark, shuffle_join_conf):
    df = _join(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, plan[:2000]
    with_bloom = [(r.o_orderpriority, r.n) for r in df.collect()]

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    baseline_df = _join(spark)
    baseline_plan = baseline_df._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" not in baseline_plan
    assert with_bloom == [
        (r.o_orderpriority, r.n) for r in baseline_df.collect()
    ]
