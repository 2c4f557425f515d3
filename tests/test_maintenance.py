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
