"""Hypothesis property tests for the codec layer. Each property generates a
batch of cases and runs ONE Spark job over the whole batch (a job per
example would take minutes)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions import codecs

coord = st.tuples(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False, width=64).map(
        lambda v: round(v, 6)
    ),
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False, width=64).map(
        lambda v: round(v, 6)
    ),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(coord, min_size=1, max_size=50))
def test_elegant_pair_inverse_property(spark, coords):
    df = spark.createDataFrame(coords, "lon double, lat double")
    z = codecs.elegant_pair(F.col("lon"), F.col("lat"))
    lon2, lat2 = codecs.elegant_unpair(z)
    for r in df.select("lon", "lat", lon2.alias("l2"), lat2.alias("t2")).collect():
        assert math.isclose(r.lon, r.l2, abs_tol=1e-9)
        assert math.isclose(r.lat, r.t2, abs_tol=1e-9)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False).map(
            lambda v: round(v, 6)
        ),
        min_size=1,
        max_size=50,
    )
)
def test_fixed_point_inverse_property(spark, values):
    mn = min(values)
    df = spark.createDataFrame([(v, mn) for v in values], "x double, mn double")
    enc = codecs.encode_fixed_point(F.col("x"), F.col("mn"))
    dec = codecs.decode_fixed_point(enc, F.col("mn"))
    for r in df.select("x", dec.alias("x2")).collect():
        assert math.isclose(r.x, r.x2, abs_tol=1e-6)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=40), min_size=1, max_size=20))
def test_fingerprint_permutation_invariant_property(spark, texts):
    from mobilitydatalakebenchmark_spark.operators.text_analysis import fingerprint

    rows = []
    for i, t in enumerate(texts):
        toks = t.split()
        rows.append((i, " ".join(toks) if toks else "x"))
        rows.append((i + 10000, " ".join(reversed(toks)) if toks else "x"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    for i in range(len(texts)):
        assert fps[i] == fps[i + 10000]
