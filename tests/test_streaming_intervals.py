"""Incremental interval-island maintenance: the maintained table must
equal the batch coalesce of everything ingested — across micro-batches,
out-of-order arrivals that bridge previously separate islands, restarts,
and replayed epochs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.timeseries import coalesce_intervals
from mobilitydatalakebenchmark_spark.streaming.intervals import (
    read_islands,
    stream_islands,
    upsert_islands_batch,
)

SCHEMA = "k string, start_us long, end_us long"


def _snapshot(df):
    return {
        (r["k"], r["island"]): (r["start_us"], r["end_us"], r["n_rows"])
        for r in df.collect()
    }


def _batch_truth(spark, data_dir):
    everything = spark.read.parquet(data_dir)
    return _snapshot(
        coalesce_intervals(everything, "k", "start_us", "end_us")
    )


def _drain(spark, data_dir, table, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    q = stream_islands(stream, table, ckpt, "k")
    if not q.awaitTermination(120):
        q.processAllAvailable()
        q.stop()


def test_streamed_islands_equal_batch(spark, tmp_path):
    data_dir, table, ckpt = (
        str(tmp_path / "data"),
        str(tmp_path / "islands"),
        str(tmp_path / "ckpt"),
    )
    b1 = [("a", 0, 10), ("a", 40, 50), ("b", 5, 9)]
    b2 = [("a", 8, 20), ("b", 100, 110)]
    # b3 bridges a's two islands [0,20) and [40,50) into one
    b3 = [("a", 18, 45)]
    for b in (b1, b2, b3):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(data_dir)

    _drain(spark, data_dir, table, ckpt)
    got = _snapshot(read_islands(spark, table, "k"))
    assert got == _batch_truth(spark, data_dir)
    # the bridge actually happened: a has ONE island covering [0, 50)
    assert got[("a", 1)] == (0, 50, 4)


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    data_dir, table, ckpt = (
        str(tmp_path / "data"),
        str(tmp_path / "islands"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        [("a", 0, 10), ("b", 0, 5)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(data_dir)
    _drain(spark, data_dir, table, ckpt)

    # stream stopped; late + new data lands, including an out-of-order
    # row that extends a's existing island backwards-overlapping
    spark.createDataFrame(
        [("a", 5, 30), ("c", 7, 8)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(data_dir)
    _drain(spark, data_dir, table, ckpt)  # same checkpoint

    assert _snapshot(read_islands(spark, table, "k")) == _batch_truth(
        spark, data_dir
    )


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "islands")
    batch = spark.createDataFrame(
        [("a", 0, 10), ("a", 8, 20), ("b", 1, 2)], SCHEMA
    )
    upsert_islands_batch(batch, table, "k", txn=("run1", 0))
    once = _snapshot(read_islands(spark, table, "k"))
    # the crash window: same (run, epoch) delivered again
    upsert_islands_batch(batch, table, "k", txn=("run1", 0))
    assert _snapshot(read_islands(spark, table, "k")) == once
    # a NEW epoch with genuinely new data still merges
    upsert_islands_batch(
        spark.createDataFrame([("a", 15, 40)], SCHEMA),
        table,
        "k",
        txn=("run1", 1),
    )
    got = _snapshot(read_islands(spark, table, "k"))
    assert got[("a", 1)] == (0, 40, 3)
    assert got[("b", 1)] == (1, 2, 1)


def test_only_touched_buckets_rewrite(spark, tmp_path):
    import os

    table = str(tmp_path / "islands")
    upsert_islands_batch(
        spark.createDataFrame([("a", 0, 10), ("b", 0, 5)], SCHEMA),
        table,
        "k",
        txn=("r", 0),
    )
    partitions_before = {
        p: os.path.getmtime(os.path.join(table, p))
        for p in os.listdir(table)
        if p.startswith("kbucket=")
    }
    # touch only key "a" in epoch 1
    upsert_islands_batch(
        spark.createDataFrame([("a", 100, 110)], SCHEMA),
        table,
        "k",
        txn=("r", 1),
    )
    a_bucket = spark.createDataFrame([("a",)], "k string").select(
        F.pmod(F.hash("k"), F.lit(16)).alias("b")
    ).first().b
    b_bucket = spark.createDataFrame([("b",)], "k string").select(
        F.pmod(F.hash("k"), F.lit(16)).alias("b")
    ).first().b
    if a_bucket == b_bucket:  # hash collision would void the assertion
        return
    untouched = f"kbucket={b_bucket}"
    assert (
        os.path.getmtime(os.path.join(table, untouched))
        == partitions_before[untouched]
    ), "dynamic overwrite rewrote a partition the batch never touched"


def test_empty_batch_is_a_noop(spark, tmp_path):
    table = str(tmp_path / "islands")
    upsert_islands_batch(
        spark.createDataFrame([("a", 0, 10)], SCHEMA), table, "k", txn=("r", 0)
    )
    before = _snapshot(read_islands(spark, table, "k"))
    empty = spark.createDataFrame([], SCHEMA)
    upsert_islands_batch(empty, table, "k", txn=("r", 1))
    assert _snapshot(read_islands(spark, table, "k")) == before


def test_first_batch_creates_table(spark, tmp_path):
    table = str(tmp_path / "islands")
    # empty batch against a missing table must not create anything
    upsert_islands_batch(
        spark.createDataFrame([], SCHEMA), table, "k", txn=("r", 0)
    )
    import os

    assert not os.path.exists(table)


def test_recreated_checkpoint_gets_new_identity(spark, tmp_path):
    """The r8 ADVICE fix: run_id = md5(checkpoint PATH) alone collides
    across checkpoint lifetimes — delete the checkpoint but keep the
    islands table, and the new stream restarts at epoch 0 under the old
    run_id, so the (run, epoch) replay guard silently DROPS the
    genuinely-new first batches. With the per-creation nonce mixed in,
    the recreated checkpoint is a new identity and fresh data applies."""
    import shutil

    data_dir, table, ckpt = (
        str(tmp_path / "data"),
        str(tmp_path / "islands"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        [("a", 0, 10), ("b", 0, 5)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(data_dir)
    _drain(spark, data_dir, table, ckpt)

    # checkpoint lost (operator error / retention job), table kept;
    # a FRESH data dir so the new run's epoch 0 carries new rows
    shutil.rmtree(ckpt)
    data2 = str(tmp_path / "data2")
    spark.createDataFrame(
        [("a", 5, 30), ("c", 7, 8)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(data2)
    _drain(spark, data2, table, ckpt)

    got = _snapshot(read_islands(spark, table, "k"))
    # both runs' rows must be present: a's islands merged to [0,30),
    # and c — delivered in the recreated run's epoch 0 — NOT dropped
    assert got[("a", 1)] == (0, 30, 2)
    assert got[("c", 1)] == (7, 8, 1)
