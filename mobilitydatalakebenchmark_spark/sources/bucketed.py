"""Bucketed tables — co-located big-big joins without a shuffle.

The reference's dimension joins are all broadcast-able; at 100 TB the
fact⋈fact joins (l2⋈main at fleet scale, lineitem⋈orders here) need both
sides hash-bucketed on the join key at WRITE time so the join is a local
zip of bucket files — no Exchange in the plan. Spark implements this via
``bucketBy(n, key).sortBy(key).saveAsTable`` (bucket metadata lives in the
catalog, hence saveAsTable rather than a bare path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """`path` makes it an external table (warehouse.dir is a static conf —
    it cannot be pointed at a temp dir after session start)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, key).sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a SortMergeJoin with ZERO Exchange operators."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_l] == right[key_r])
