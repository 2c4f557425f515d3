"""Bucketed co-located join: same bucket spec on both sides must produce a
join plan with no shuffle (Exchange) on either input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.plans import explain
from mobilitydatalakebenchmark_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("wh")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8, path=str(warehouse / "li"))
    write_bucketed(orders, "o_bucketed", "o_orderkey", n_buckets=8, path=str(warehouse / "o"))
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the bucketed path (not BHJ) is what we observe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        n_shuffles = explain.count_shuffles(j)
        assert n_shuffles == 0, explain.physical_plan(j)
        assert explain.count_sortmerge_joins(j) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
    got = j.groupBy().agg(F.count("*").alias("n")).collect()[0].n
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want
