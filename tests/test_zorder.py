"""Morton interleave exactness + clustering effect on row-group bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions.zorder import (
    cluster_by_zorder,
    interleave_bits,
    zorder_key,
)


def _py_interleave(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (0b1010, 0b0101), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(cases, "x long, y long")
    got = df.select("x", "y", interleave_bits(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r.z == _py_interleave(r.x, r.y), (r.x, r.y)


def test_zorder_key_monotone_in_cells(spark):
    # same cell -> same key; neighboring cells -> nearby keys
    bbox_x, bbox_y = (4.25, 4.45), (50.79, 50.91)
    df = spark.createDataFrame(
        [(4.30, 50.85), (4.300001, 50.850001), (4.44, 50.90)], "lon double, lat double"
    )
    keys = [
        r.z
        for r in df.select(
            zorder_key(F.col("lon"), F.col("lat"), bbox_x, bbox_y).alias("z")
        ).collect()
    ]
    assert keys[0] == keys[1]  # sub-cell points collapse to one key
    assert keys[2] != keys[0]


def test_clustering_tightens_chunk_bounds(spark, tmp_path):
    """Sorting by the Morton key must reduce the average per-chunk bbox
    area (that area is exactly what parquet min/max stats prune on)."""
    import random

    rng = random.Random(13)
    rows = [
        (rng.uniform(4.25, 4.45), rng.uniform(50.79, 50.91)) for _ in range(20000)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double").coalesce(1)

    def avg_chunk_area(d):
        chunked = d.withColumn(
            "chunk", F.floor(F.monotonically_increasing_id() / 1000)
        )
        stats = (
            chunked.groupBy("chunk")
            .agg(
                (F.max("lon") - F.min("lon")).alias("w"),
                (F.max("lat") - F.min("lat")).alias("h"),
            )
            .select(F.avg(F.col("w") * F.col("h")).alias("a"))
            .collect()
        )
        return stats[0].a

    unsorted_area = avg_chunk_area(df)
    clustered = cluster_by_zorder(df, "lon", "lat", (4.25, 4.45), (50.79, 50.91)).coalesce(1)
    clustered_area = avg_chunk_area(clustered)
    # random chunks span ~the whole bbox; z-ordered chunks are local
    assert clustered_area < unsorted_area / 4, (unsorted_area, clustered_area)
