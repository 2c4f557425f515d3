"""Compaction (fewer files, identical rows) and retention expiry."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions.codecs import ts_bucket
from mobilitydatalakebenchmark_spark.operators.flat_store import explode_features
from mobilitydatalakebenchmark_spark.operators.maintenance import (
    compact_partitions,
    expire_partitions,
)
from mobilitydatalakebenchmark_spark.schemas import TS_BUCKET_COL


def _fragmented_table(spark, documents_df, path):
    flat = (
        explode_features(documents_df)
        .withColumn(TS_BUCKET_COL, ts_bucket(F.col("timestamp")))
        .repartition(40)  # deliberately shatter into many small files
    )
    flat.write.partitionBy(TS_BUCKET_COL).parquet(path)
    return flat


def test_compaction_reduces_files_preserves_rows(spark, tmp_path, documents_df):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, documents_df, path)
    before = spark.read.parquet(path)
    before_counts = {
        tuple(r): 1 for r in before.groupBy("timestamp").count().collect()
    }
    stats = compact_partitions(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= stats["partitions"] * 2
    after = spark.read.parquet(path)
    after_counts = {
        tuple(r): 1 for r in after.groupBy("timestamp").count().collect()
    }
    assert after_counts == before_counts
    assert set(after.columns) == set(before.columns)


def test_expire_partitions(spark, tmp_path, documents_df, snapshots):
    path = str(tmp_path / "exp")
    _fragmented_table(spark, documents_df, path)
    buckets = sorted({ts[:13] for ts, _ in snapshots})
    assert len(buckets) >= 2  # generator spans an hour boundary
    cutoff = buckets[-1]
    deleted = expire_partitions(spark, path, cutoff_bucket=cutoff)
    assert deleted == buckets[:-1]
    remaining = spark.read.parquet(path)
    assert remaining.select(TS_BUCKET_COL).distinct().collect()[0][0] == cutoff
    n_last_bucket = sum(
        len(d["features"]) for ts, d in snapshots if ts[:13] == cutoff
    )
    assert remaining.count() == n_last_bucket


def test_compaction_with_zorder_clusters_files(spark, tmp_path):
    """compact_partitions(zorder=...) preserves the row multiset AND
    tightens per-file spatial envelopes vs plain compaction (the min/max
    stats later bbox scans prune on)."""
    import random

    from mobilitydatalakebenchmark_spark.operators.maintenance import (
        compact_partitions,
    )

    rng = random.Random(29)
    rows = [
        (f"2024-03-01T{h:02d}", rng.uniform(4.25, 4.45), rng.uniform(50.79, 50.91))
        for h in (10, 11)
        for _ in range(8000)
    ]
    path = str(tmp_path / "zc")
    df = spark.createDataFrame(rows, "ts_bucket string, lon double, lat double")
    df.repartition(8).write.partitionBy("ts_bucket").parquet(path)

    def avg_file_area(p):
        d = spark.read.parquet(p).withColumn(
            "f", F.input_file_name()
        )
        stats = (
            d.groupBy("f")
            .agg(
                (F.max("lon") - F.min("lon")).alias("w"),
                (F.max("lat") - F.min("lat")).alias("h"),
            )
            .agg(F.avg(F.col("w") * F.col("h")))
            .collect()
        )
        return stats[0][0]

    plain_path = str(tmp_path / "plain")
    spark.read.parquet(path).write.partitionBy("ts_bucket").parquet(plain_path)

    before = sorted(
        map(tuple, spark.read.parquet(path).select("lon", "lat").collect())
    )
    # small target -> several files per partition, each z-clustered
    compact_partitions(
        spark,
        path,
        partition_col="ts_bucket",
        target_file_bytes=16 * 1024,
        zorder=("lon", "lat", (4.25, 4.45), (50.79, 50.91)),
    )
    after = sorted(
        map(tuple, spark.read.parquet(path).select("lon", "lat").collect())
    )
    assert after == before
    # each file covers one contiguous z block; with ~16 files per bucket
    # the average file bbox must be well under the full-extent files the
    # plain rewrite produces (ragged z-boundaries keep this short of the
    # ideal 1/F, hence the conservative 1/3 bound)
    assert avg_file_area(path) < avg_file_area(plain_path) / 3
