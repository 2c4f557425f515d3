"""Round-trip tests for the encoded stores (pairing-packed and fixed-point
zone-map coordinates). Same multiset-by-uuid invariant; coordinate
tolerance follows the encoding precision (float32 on the way back)."""

from __future__ import annotations

import pytest

from mobilitydatalakebenchmark_spark.operators.encoded_store import (
    CantorParquetStore,
    VelocitySplitParquetStore,
)

from .test_roundtrip_flat import _assert_feature_eq, _canon_features


def _check(spark, store, snapshots, indices=(0, 2, 30)):
    for idx in indices:
        ts, data = snapshots[idx]
        rows = store.get_document(spark, ts).collect()
        assert len(rows) == 1
        got = rows[0].asDict(recursive=True)
        got_by, want_by = _canon_features(got["data"]), _canon_features(data)
        assert set(got_by) == set(want_by)
        for key in want_by:
            for g, w in zip(got_by[key], want_by[key]):
                _assert_feature_eq(g, w)


@pytest.mark.parametrize("packed", [True, False], ids=["binary15", "decimal"])
def test_cantor_roundtrip(spark, tmp_path, documents_df, snapshots, packed):
    store = CantorParquetStore(str(tmp_path / f"cantor_{packed}"), packed=packed)
    store.write(documents_df)
    _check(spark, store, snapshots)


def test_velocity_split_roundtrip(spark, tmp_path, documents_df, snapshots):
    store = VelocitySplitParquetStore(str(tmp_path / "vsplit"))
    store.write(documents_df)
    _check(spark, store, snapshots)


def test_encoded_columns_are_integers(spark, tmp_path, documents_df):
    store = VelocitySplitParquetStore(str(tmp_path / "vsplit2"))
    store.write(documents_df)
    obs = spark.read.parquet(f"{store.path}/obs")
    dtypes = dict(obs.dtypes)
    assert dtypes["lon_fp"] == "bigint" and dtypes["lat_fp"] == "bigint"
    # offsets from the zone minimum are non-negative
    from pyspark.sql import functions as F

    assert obs.filter((F.col("lon_fp") < 0) | (F.col("lat_fp") < 0)).count() == 0
