"""Normalized ("velocity") pipeline — the 3-table star strategy, Spark-native.

Reference: ``stores/apache_parquet_velocity.py`` (main/l1/l2 with in-memory
first-seen dedup and integer surrogate ids), ``stores/postgresql_velocity.py``
(hash-consed dims, IN-list existence probe, insert-only-missing).

Spark-first deviations (documented, SURVEY.md §2.9 / §7):

- l1 (vehicle dim) is keyed by an md5 hash-cons key (P14) instead of a
  mutable integer counter (`apache_parquet_velocity.py:38-40`): hash keys
  are deterministic and allocation-free, so the dim build parallelizes
  with no shared state — the only strategy that survives 1000 executors.
- first-seen semantics (`:81-85`) become a window rank over (uuid, ts)
  (A9/F5) — same result, no in-memory hash table.
- "insert only missing dims" (`postgresql_velocity.py:104-113`) is the
  left-anti novelty join (F4/J8) against the stored dim.

Scale posture: main is tiny (1 row/snapshot); l1 is bounded by the fleet
size (broadcastable); l2 is the fact table, partitioned by hour bucket.
Point reads prune l2 partitions, then two broadcast hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.codecs import ts_bucket
from ..schemas import TS_BUCKET_COL
from .flat_store import explode_features, feature_struct


def _l1_key() -> F.Column:
    """Dim key = FULL md5 of the uuid alone. uuid-only matters: l2 rows must
    reference the same dim row even when a vehicle's mutable attributes
    (direction at a terminus, color) drift between snapshots — first-seen
    attribute values win, exactly the reference's in-memory-hash-table
    semantics (apache_parquet_velocity.py:81-85). Untruncated: a truncated
    hash birthday-collides at fleet scale and a collision would silently
    cross-wire two vehicles' observations."""
    return F.md5(F.col("uuid"))


def build_velocity_tables(
    documents: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """documents -> (main, l1, l2).

    main: (timestamp, ts_bucket)            one row per snapshot (incl. empty)
    l1:   (l1_id, uuid, vid, color, direction, lineId)   first-seen per uuid
    l2:   (timestamp, ts_bucket, l1_id, distance, pointId,
           distanceFromPoint, coordinates_0, coordinates_1)
    """
    flat = explode_features(documents)

    main = documents.select(
        "timestamp", ts_bucket(F.col("timestamp")).alias(TS_BUCKET_COL)
    )

    # A9: first occurrence of each uuid wins the dim row
    w = Window.partitionBy("uuid").orderBy("timestamp")
    l1 = (
        flat.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            _l1_key().alias("l1_id"),
            "uuid",
            F.col("id").alias("vid"),
            "color",
            "direction",
            "lineId",
        )
    )

    l2 = flat.select(
        "timestamp",
        ts_bucket(F.col("timestamp")).alias(TS_BUCKET_COL),
        _l1_key().alias("l1_id"),
        "distance",
        "pointId",
        "distanceFromPoint",
        "coordinates_0",
        "coordinates_1",
    )
    return main, l1, l2


class VelocityParquetStore:
    """3-table normalized store with incremental append semantics."""

    def __init__(self, path: str):
        self.path = path

    def _p(self, table: str) -> str:
        return f"{self.path}/{table}"

    def write(self, documents: DataFrame, mode: str = "overwrite") -> None:
        main, l1, l2 = build_velocity_tables(documents)
        if mode == "append":
            # J7/J8/F4: only novel dim rows are appended (existence probe
            # as left-anti join against the stored dim)
            spark = documents.sparkSession
            try:
                existing = spark.read.parquet(self._p("l1")).select("l1_id")
                l1 = l1.join(existing, "l1_id", "left_anti")
            except Exception as exc:  # first batch: nothing stored yet —
                # but ONLY that shape; a genuinely corrupt store (schema
                # drift, permissions) must fail loudly, not be overwritten
                from ..errors import is_missing_store_error

                if not is_missing_store_error(exc):
                    raise
        main.write.mode(mode).parquet(self._p("main"))
        l1.write.mode(mode).parquet(self._p("l1"))
        l2.write.mode(mode).partitionBy(TS_BUCKET_COL).parquet(self._p("l2"))

    def tables(self, spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
        return (
            spark.read.parquet(self._p("main")),
            spark.read.parquet(self._p("l1")),
            spark.read.parquet(self._p("l2")),
        )

    def get_document(self, spark: SparkSession, timestamp: str) -> DataFrame:
        """J6: main ⨝ l2 ⨝ l1 reconstruction
        (reference ``apache_parquet_velocity.py:222-249``)."""
        main, l1, l2 = self.tables(spark)
        bucket = timestamp[:13]
        main_hit = main.filter(F.col("timestamp") == timestamp).select("timestamp")
        obs = (
            l2.filter((F.col(TS_BUCKET_COL) == bucket) & (F.col("timestamp") == timestamp))
            .join(F.broadcast(main_hit), "timestamp")
            .join(F.broadcast(l1), "l1_id")
            .withColumn("id", F.col("vid"))
        )
        features = obs.groupBy("timestamp").agg(
            F.sort_array(F.collect_list(feature_struct())).alias("_features")
        )
        # empty snapshots exist in main but have no l2 rows -> left join
        return (
            main_hit.join(features, "timestamp", "left")
            .select(
                "timestamp",
                F.struct(
                    F.lit("FeatureCollection").alias("type"),
                    F.coalesce(
                        F.col("_features"),
                        F.array().cast(features.schema["_features"].dataType),
                    ).alias("features"),
                ).alias("data"),
            )
        )

    def total_size(self) -> int:
        from ..sources.size import dir_size

        return dir_size(self.path)
