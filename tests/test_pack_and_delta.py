"""P13 byte-packing round trip + Delta stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions import codecs
from mobilitydatalakebenchmark_spark.operators import delta_store


def test_pack_unpack_roundtrip(spark):
    df = spark.createDataFrame(
        [(4.30123456, 50.85654321), (4.25, 50.79), (4.45, 50.91)], "lon double, lat double"
    )
    # offset=0: the reference's positive-coordinate domain, where the
    # paired value fits the 15-byte packing (apache_parquet_cantor.py:104)
    z = codecs.elegant_pair(F.col("lon"), F.col("lat"), offset=0)
    packed = codecs.pack_le_bytes(z)
    out = df.select(
        z.alias("z"),
        F.length(packed).alias("n_bytes"),
        codecs.unpack_le_bytes(packed).alias("z2"),
    ).collect()
    for r in out:
        assert r.n_bytes == codecs.PACK_BYTES
        assert int(r.z) == int(r.z2)


def test_pack_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "z decimal(38,0)")
    out = df.select(codecs.pack_le_bytes(F.col("z")).alias("b")).collect()
    assert out[0].b is None


@pytest.mark.skipif(delta_store.HAS_DELTA, reason="delta present: stub paths n/a")
def test_delta_unavailable_error_is_clear(spark, documents_df):
    store = delta_store.DeltaDocumentStore("/tmp/never-created")
    with pytest.raises(delta_store.DeltaUnavailable, match="parquet stores"):
        store.append(documents_df)


@pytest.mark.skipif(not delta_store.HAS_DELTA, reason="delta not installed")
def test_delta_roundtrip(spark, documents_df, tmp_path):  # pragma: no cover
    store = delta_store.DeltaDocumentStore(str(tmp_path / "d"))
    store.append(documents_df)
    ts = documents_df.limit(1).collect()[0].timestamp
    assert store.get_document(spark, ts).count() == 1
