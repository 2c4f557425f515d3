"""Incremental materialized-join maintenance: the view must equal a
from-scratch recompute after every interleaving of appends."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.ivm import MaterializedJoin

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def lineitem(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_partkey", "l_quantity"
    )
    df.cache().count()
    return df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_recompute(spark, orders, lineitem, tmp_path):
    mj = MaterializedJoin(str(tmp_path / "mj"), on="o_orderkey")
    o1 = orders.filter(F.col("o_orderkey") % 3 == 0)
    o2 = orders.filter(F.col("o_orderkey") % 3 == 1)
    o3 = orders.filter(F.col("o_orderkey") % 3 == 2)
    l1 = lineitem.filter(F.col("l_partkey") % 2 == 0)
    l2 = lineitem.filter(F.col("l_partkey") % 2 == 1)

    mj.build(o1, l1)
    assert _rows(mj.view(spark)) == _rows(mj.recompute(spark))

    mj.append(left_delta=o2)  # left-only batch
    assert _rows(mj.view(spark)) == _rows(mj.recompute(spark))

    mj.append(right_delta=l2)  # right-only batch
    assert _rows(mj.view(spark)) == _rows(mj.recompute(spark))

    mj.append(left_delta=o3)  # late left rows joining the grown right
    assert _rows(mj.view(spark)) == _rows(mj.recompute(spark))

    # final content is the full join of everything
    full = orders.join(lineitem, "o_orderkey")
    assert _rows(mj.view(spark)) == _rows(full)


def test_simultaneous_two_sided_batch(spark, orders, lineitem, tmp_path):
    """One append carrying both sides must include the ΔL ⋈ ΔR cross
    term exactly once."""
    mj = MaterializedJoin(str(tmp_path / "mj2"), on="o_orderkey")
    o1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    o2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    l1 = lineitem.filter(F.col("l_quantity") <= 25)
    l2 = lineitem.filter(F.col("l_quantity") > 25)
    mj.build(o1, l1)
    mj.append(left_delta=o2, right_delta=l2)
    assert _rows(mj.view(spark)) == _rows(orders.join(lineitem, "o_orderkey"))


def test_view_prunes_key_buckets(spark, orders, lineitem, tmp_path):
    """The bucket partitioning is the point of the layout: a key-equality
    read of the view must scan a pruned file subset (partition filters
    present in the plan)."""
    mj = MaterializedJoin(str(tmp_path / "mj3"), on="o_orderkey")
    mj.build(orders, lineitem)
    some_key = orders.first()["o_orderkey"]
    q = spark.read.parquet(str(tmp_path / "mj3" / "view.parquet")).filter(
        (F.col("_key_bucket") == F.pmod(F.xxhash64(F.lit(some_key).cast("long")), 32))
        & (F.col("o_orderkey") == some_key)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert q.count() > 0


def test_streamed_left_inserts_keep_view_current(spark, orders, lineitem, tmp_path):
    """Stream the second half of orders into a view built on the first:
    final view == full batch join, and a full replay through a fresh
    checkpoint changes nothing (idempotent append)."""
    from mobilitydatalakebenchmark_spark.streaming.ivm_stream import (
        stream_to_materialized_join,
    )

    o1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    o2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    mj = MaterializedJoin(str(tmp_path / "mjs"), on="o_orderkey")
    mj.build(o1, lineitem)

    landing = str(tmp_path / "landing")
    o2.repartition(2).write.parquet(landing)

    def run(ckpt):
        stream = (
            spark.readStream.schema(o2.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )
        stream_to_materialized_join(
            stream, mj, str(tmp_path / ckpt), row_id_col="o_orderkey"
        ).awaitTermination(120)

    run("ckpt1")
    want = _rows(orders.join(lineitem, "o_orderkey"))
    assert _rows(mj.view(spark)) == want

    run("ckpt2")  # full re-delivery from scratch
    assert _rows(mj.view(spark)) == want


def test_crash_between_view_and_base_write_converges(
    spark, orders, lineitem, tmp_path
):
    """Replay after the append's crash window: a previous attempt wrote
    the VIEW delta but died before appending the left base. The replayed
    epoch must complete the base append without double-inserting view
    rows (two-sided dedup)."""
    from mobilitydatalakebenchmark_spark.streaming.ivm_stream import (
        stream_to_materialized_join,
    )

    o1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    o2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    mj = MaterializedJoin(str(tmp_path / "mjc"), on="o_orderkey")
    mj.build(o1, lineitem)

    # crashed attempt: view delta written, base append lost
    delta = o2.join(mj._read(spark, "right"), "o_orderkey").localCheckpoint()
    mj._write_view(delta)

    landing = str(tmp_path / "landing")
    o2.coalesce(1).write.parquet(landing)
    stream = spark.readStream.schema(o2.schema).parquet(landing)
    stream_to_materialized_join(
        stream, mj, str(tmp_path / "ckpt"), row_id_col="o_orderkey"
    ).awaitTermination(120)

    want = _rows(orders.join(lineitem, "o_orderkey"))
    assert _rows(mj.view(spark)) == want
    # unmatched left rows must have reached the base too
    assert (
        spark.read.parquet(str(tmp_path / "mjc" / "left.parquet")).count()
        == orders.count()
    )


def test_crash_between_base_and_view_write_converges(
    spark, orders, lineitem, tmp_path
):
    """The opposite partial state (base rows present, view delta lost)
    must also converge: the view-side dedup sees nothing for the batch
    and re-derives its join rows."""
    from mobilitydatalakebenchmark_spark.streaming.ivm_stream import (
        stream_to_materialized_join,
    )

    o1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    o2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    mj = MaterializedJoin(str(tmp_path / "mjb"), on="o_orderkey")
    mj.build(o1, lineitem)

    # crashed attempt: base appended, view delta lost
    mj._append_base(o2, "left")

    landing = str(tmp_path / "landing")
    o2.coalesce(1).write.parquet(landing)
    stream = spark.readStream.schema(o2.schema).parquet(landing)
    stream_to_materialized_join(
        stream, mj, str(tmp_path / "ckpt"), row_id_col="o_orderkey"
    ).awaitTermination(120)

    want = _rows(orders.join(lineitem, "o_orderkey"))
    assert _rows(mj.view(spark)) == want
    assert _rows(mj.recompute(spark)) == want
