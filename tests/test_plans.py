"""Physical-plan quality gates (the 'would this survive 100 TB' checks):
filters push into scans, projections prune columns, dimension joins
broadcast, point reads prune partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.plans import explain, load_registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_registry()


def test_point_lookup_pushes_filter(spark, registry):
    df = registry["f1_point_lookup"].spark(spark, SF)
    assert explain.has_pushed_filter(df, "l_orderkey"), explain.formatted_plan(df)


def test_projection_prunes_columns(spark, registry):
    df = registry["f1_point_lookup"].spark(spark, SF)
    cols = explain.scan_read_schema(df)
    assert "l_extendedprice" not in cols  # unused fact columns never read
    assert "l_shipdate" not in cols


def test_snowflake_broadcasts_dims(spark, registry):
    df = registry["j4_snowflake_revenue"].spark(spark, SF)
    # customer/nation/region are explicit broadcasts; orders may also
    # broadcast at this SF — at least the 3 hinted dims must be BHJ
    assert explain.count_broadcast_joins(df) >= 3, explain.physical_plan(df)


def test_flagship_single_shuffle_agg(spark, registry):
    df = registry["flagship_pricing_summary"].spark(spark, SF)
    plan = explain.physical_plan(df)
    # partial_ aggregation before the exchange = map-side combine
    assert "partial_sum" in plan
    assert explain.count_shuffles(df) <= 2  # agg exchange + final sort


def test_topk_uses_takeordered_or_window(spark, registry):
    df = registry["s1_scan_order_limit"].spark(spark, SF)
    # orderBy+limit must not global-sort: TakeOrderedAndProject expected
    assert "TakeOrderedAndProject" in explain.physical_plan(df)


def test_flat_store_partition_pruning(spark, tmp_path, documents_df):
    from mobilitydatalakebenchmark_spark.operators.flat_store import FlatParquetStore

    store = FlatParquetStore(str(tmp_path / "t"))
    store.write(documents_df)
    ts = documents_df.select("timestamp").orderBy("timestamp").limit(1).collect()[0][0]
    flat = store.scan().filter(
        (F.col("ts_bucket") == ts[:13]) & (F.col("timestamp") == ts)
    )
    assert explain.has_partition_filter(flat, "ts_bucket")
    assert explain.has_pushed_filter(flat, "timestamp")


def test_gate_queries_stay_jvm_side(spark, registry):
    """No gate query may fall back to a row-at-a-time Python UDF
    (BatchEvalPython); Arrow-batched plans (ArrowEvalPython/MapInPandas)
    are allowed only for declared kernel operators (none in the gate)."""
    for name, q in registry.items():
        df = q.spark(spark, SF)
        plan = explain.physical_plan(df)
        assert "BatchEvalPython" not in plan, f"{name} uses a Python UDF"
        if "kernel" not in q.tags:  # declared Arrow-batched kernels excepted
            assert "InPandas" not in plan, f"{name} unexpectedly uses pandas"


def test_codegen_covers_flagship(spark, registry):
    df = registry["flagship_pricing_summary"].spark(spark, SF)
    assert explain.codegen_stage_count(df) >= 1
