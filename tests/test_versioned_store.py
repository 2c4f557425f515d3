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
