"""Manifest-committed versioned store: atomic visibility, time travel,
orphan invisibility, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.versioned_store import (
    VersionedParquetStore,
)


@pytest.fixture()
def batches(spark):
    return [
        spark.range(0, 10).withColumn("b", F.lit(i)) for i in range(3)
    ]


def test_append_history_and_time_travel(spark, batches, tmp_path):
    s = VersionedParquetStore(str(tmp_path / "vs"))
    for b in batches:
        s.commit(b)
    assert s.history() == [0, 1, 2]
    assert s.snapshot(spark, 0).count() == 10
    assert s.snapshot(spark, 1).count() == 20
    assert s.snapshot(spark).count() == 30
    assert {r.b for r in s.snapshot(spark, 1).select("b").distinct().collect()} == {0, 1}


def test_overwrite_resets_but_history_survives(spark, batches, tmp_path):
    s = VersionedParquetStore(str(tmp_path / "vs"))
    s.commit(batches[0])
    s.commit(batches[1])
    v = s.commit(batches[2], mode="overwrite")
    assert s.snapshot(spark, v).count() == 10
    assert {r.b for r in s.snapshot(spark, v).select("b").distinct().collect()} == {2}
    # pre-overwrite versions still readable
    assert s.snapshot(spark, 1).count() == 20


def test_orphan_dirs_are_invisible(spark, batches, tmp_path):
    """A crashed commit = data dir written, manifest missing. Readers at
    every version must not see it."""
    s = VersionedParquetStore(str(tmp_path / "vs"))
    s.commit(batches[0])
    orphan = tmp_path / "vs" / "data" / "v99"
    batches[1].write.parquet(str(orphan))
    assert s.latest_version() == 0
    assert s.snapshot(spark).count() == 10
    # the next commit numbers itself after the MANIFEST history, and the
    # orphan stays unreferenced
    s.commit(batches[2])
    assert s.snapshot(spark).count() == 20


def test_vacuum_drops_history_and_orphans(spark, batches, tmp_path):
    s = VersionedParquetStore(str(tmp_path / "vs"))
    for b in batches:
        s.commit(b)
    batches[0].write.parquet(str(tmp_path / "vs" / "data" / "v99"))  # orphan
    deleted = s.vacuum(keep_latest=1)
    # latest version still reads in full; orphan and nothing referenced
    # by it are gone
    assert s.history() == [2]
    assert s.snapshot(spark).count() == 30
    assert any(d.endswith("v99") for d in deleted)
    # append-mode manifests reference ALL prior dirs, so vacuum keeps them
    assert not any(d.endswith(("v0", "v1", "v2")) for d in deleted)


def test_txn_commit_is_idempotent(spark, batches, tmp_path):
    s = VersionedParquetStore(str(tmp_path / "vs"))
    v0 = s.commit(batches[0], txn=("runA", 0))
    v_again = s.commit(batches[0], txn=("runA", 0))  # replayed epoch
    assert v_again == v0
    assert s.history() == [0]
    v1 = s.commit(batches[1], txn=("runA", 1))  # genuinely new epoch
    assert v1 == 1
    assert s.snapshot(spark).count() == 20


def test_streamed_commits_one_version_per_epoch(spark, batches, tmp_path):
    from mobilitydatalakebenchmark_spark.streaming.versioned_stream import (
        stream_to_versioned_store,
    )

    landing = str(tmp_path / "landing")
    data = batches[0].unionByName(batches[1])
    data.repartition(2).write.parquet(landing)
    s = VersionedParquetStore(str(tmp_path / "vs"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(data.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )
        stream_to_versioned_store(
            stream, s, str(tmp_path / ckpt)
        ).awaitTermination(120)

    run("ckpt")
    versions = s.history()
    assert len(versions) >= 1
    assert s.snapshot(spark).count() == data.count()

    # restarting the SAME checkpoint re-delivers nothing and, even if an
    # epoch were replayed, its txn stamp skips the commit
    run("ckpt")
    assert s.history() == versions
    assert s.snapshot(spark).count() == data.count()
