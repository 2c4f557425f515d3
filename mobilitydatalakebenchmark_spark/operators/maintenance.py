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
    zorder: tuple[str, str, tuple[float, float], tuple[float, float]] | None = None,
) -> dict:
    """Rewrite `path` with ~target_file_bytes files per partition.

    Per-partition output file count = ceil(partition_bytes / target); the
    rewrite repartitions by (partition_col, uniform salt) so each output
    task writes one file of its own partition. Swap is
    write-temp -> delete -> rename (same barrier pattern as
    TemporalStore.append_batch).

    ``zorder=(x_col, y_col, x_range, y_range)`` additionally clusters
    every rewritten file by the 2-D Morton key (the Delta
    ``OPTIMIZE ... ZORDER BY`` maintenance job): partitionBy keeps
    handling time, the within-file sort tightens each row group's
    per-column min/max envelope so later bbox filters skip row groups —
    compaction is exactly when that sort is free, since the data is
    being rewritten anyway."""
    total_bytes = dir_size(path)
    df = spark.read.parquet(path)
    n_parts = max(df.select(partition_col).distinct().count(), 1)
    per_partition = max(total_bytes // n_parts, 1)
    files_per_partition = max(1, math.ceil(per_partition / target_file_bytes))

    before_files = _count_data_files(spark, path)
    tmp = path + "__compacting"
    if zorder is not None:
        # OPTIMIZE ... ZORDER BY semantics: RANGE-partition on the Morton
        # key (a salt would scatter each z-block uniformly over the
        # bucket's files, leaving every FILE spanning the whole bbox),
        # so each output file covers one contiguous z block and its
        # file/row-group min-max envelope is tight enough to skip
        from ..functions.zorder import zorder_key

        x_col, y_col, x_range, y_range = zorder
        zk = zorder_key(F.col(x_col), F.col(y_col), x_range, y_range)
        out = (
            df.withColumn("_z", zk)
            .repartitionByRange(
                n_parts * files_per_partition, F.col(partition_col), F.col("_z")
            )
            .sortWithinPartitions(partition_col, "_z")
            .drop("_z")
        )
    else:
        out = df.repartition(
            n_parts * files_per_partition,
            F.col(partition_col),
            F.pmod(
                F.spark_partition_id() + F.monotonically_increasing_id(),
                files_per_partition,
            ),
        )
    out.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
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
