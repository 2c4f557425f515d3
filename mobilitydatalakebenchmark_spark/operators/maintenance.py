"""Table maintenance — the operational side of a 100 TB lake.

A 20 s snapshot cadence writes ~4.3k files/day/partition-column into the
flat store; small-file proliferation is the classic lake failure mode.

- ``compact_partitions``: rewrite a partitioned table so each partition
  holds ~target-sized files (read -> coalesce per partition -> atomic swap
  via the Hadoop FileSystem API). Stats-preserving: same rows, same
  partition column, fewer files.
- ``expire_partitions``: retention — drop hour-bucket partitions older
  than a cutoff without touching surviving data (directory-level delete;
  no rewrite).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TS_BUCKET_COL
from ..sources.size import dir_size


def _hadoop_fs(spark: SparkSession):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    return jvm, jvm.org.apache.hadoop.fs.FileSystem.get(conf)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = TS_BUCKET_COL,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite `path` with ~target_file_bytes files per partition.

    Per-partition output file count = ceil(partition_bytes / target); the
    rewrite repartitions by (partition_col, uniform salt) so each output
    task writes one file of its own partition. Swap is
    write-temp -> delete -> rename (same barrier pattern as
    TemporalStore.append_batch)."""
    total_bytes = dir_size(path)
    df = spark.read.parquet(path)
    n_parts = max(df.select(partition_col).distinct().count(), 1)
    per_partition = max(total_bytes // n_parts, 1)
    files_per_partition = max(1, math.ceil(per_partition / target_file_bytes))

    before_files = _count_data_files(spark, path)
    tmp = path + "__compacting"
    (
        df.repartition(
            n_parts * files_per_partition,
            F.col(partition_col),
            F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), files_per_partition),
        )
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    jvm, fs = _hadoop_fs(spark)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs.delete(dst, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst)
    return {
        "files_before": before_files,
        "files_after": _count_data_files(spark, path),
        "partitions": n_parts,
    }


def _count_data_files(spark: SparkSession, path: str) -> int:
    import os

    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def expire_partitions(
    spark: SparkSession,
    path: str,
    cutoff_bucket: str,
    partition_col: str = TS_BUCKET_COL,
) -> list[str]:
    """Delete partitions with bucket < cutoff_bucket (ISO prefixes compare
    lexicographically). Directory-level: surviving partitions untouched.
    Returns the deleted partition values."""
    import os

    deleted = []
    jvm, fs = _hadoop_fs(spark)
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{partition_col}="):
            continue
        value = entry.split("=", 1)[1]
        if value < cutoff_bucket:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{entry}"), True)
            deleted.append(value)
    return deleted
