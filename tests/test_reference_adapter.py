"""The adapter must satisfy the reference's BaseStore behavioral contract:
ingest N snapshots, random point lookups reconstruct the originals, size
is positive after writes, reset clears everything."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # r13: heavy suite, excluded from the default fast tier (run with -m "" or -m slow)


import random

from mobilitydatalakebenchmark_spark.operators.adapter import ReferenceStoreAdapter

from .test_roundtrip_flat import _assert_feature_eq, _canon_features


def _run_reference_workload(adapter, snapshots, n_reads=10):
    adapter.reset()
    for ts, data in snapshots:
        adapter.store_document(data, ts)
    # O4: seeded random reads, reference benchmark.py:74
    rng = random.Random(42)
    for ts in rng.choices([ts for ts, _ in snapshots], k=n_reads):
        want = dict(snapshots)[ts]
        got = adapter.get_document(ts)
        assert got is not None
        got_by, want_by = _canon_features(got), _canon_features(want)
        assert set(got_by) == set(want_by)
        for key in want_by:
            for g, w in zip(got_by[key], want_by[key]):
                _assert_feature_eq(g, w)
    assert adapter.get_total_size() > 0


def test_buffered_adapter_contract(spark, tmp_path, snapshots):
    adapter = ReferenceStoreAdapter(spark, str(tmp_path / "a"), batch_size=20)
    _run_reference_workload(adapter, snapshots)


def test_read_your_writes_before_flush(spark, tmp_path, snapshots):
    adapter = ReferenceStoreAdapter(spark, str(tmp_path / "b"), batch_size=1000)
    adapter.reset()
    ts, data = snapshots[0]
    adapter.store_document(data, ts)
    got = adapter.get_document(ts)  # still only in the buffer
    assert got is not None and len(got["features"]) == len(data["features"])


def test_reset_clears(spark, tmp_path, snapshots):
    adapter = ReferenceStoreAdapter(spark, str(tmp_path / "c"), batch_size=5)
    adapter.reset()
    for ts, data in snapshots[:8]:
        adapter.store_document(data, ts)
    assert adapter.get_total_size() > 0
    adapter.reset()
    assert adapter.get_total_size() == 0
    assert adapter.get_document(snapshots[0][0]) is None
