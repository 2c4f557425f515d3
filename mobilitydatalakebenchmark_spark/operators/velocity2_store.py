"""Two-level normalized pipeline — the snowflake strategy.

Reference: ``stores/postgresql_velocity_2levels.py`` (item + subitem
hash-consed dims, ``:77-85``; read path chains two dim joins ``:155-196``)
and ``stores/postgresql_velocity_split.py`` (the 'bus' dim ``:78-89``).

Levels here:
- bus dim:     one row per (color, direction, lineId) — the static route
               identity shared by many vehicles;
- vehicle dim: one row per uuid, referencing its bus (first-seen, A9);
- obs fact:    one row per observation, referencing the vehicle.

Reconstruction = obs ⋈ vehicle ⋈ bus (J4: chained broadcast joins).
Keys are full md5 hashes (deterministic, parallel, collision-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.codecs import ts_bucket
from ..schemas import TS_BUCKET_COL
from .flat_store import explode_features, feature_struct


def build_velocity2_tables(
    documents: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    flat = explode_features(documents)
    bus_key = F.md5(
        F.concat_ws("|", F.col("color"), F.col("direction").cast("string"), F.col("lineId"))
    )
    veh_key = F.md5(F.col("uuid"))

    # first-seen vehicle row wins (A9); its bus assignment freezes there too
    w = Window.partitionBy("uuid").orderBy("timestamp")
    vehicle = (
        flat.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            veh_key.alias("vehicle_id"),
            "uuid",
            F.col("id").alias("vid"),
            bus_key.alias("bus_id"),
        )
    )
    bus = (
        flat.select(bus_key.alias("bus_id"), "color", "direction", "lineId")
        .dropDuplicates(["bus_id"])
    )
    obs = flat.select(
        "timestamp",
        ts_bucket(F.col("timestamp")).alias(TS_BUCKET_COL),
        veh_key.alias("vehicle_id"),
        "distance",
        "pointId",
        "distanceFromPoint",
        "coordinates_0",
        "coordinates_1",
    )
    return bus, vehicle, obs


class Velocity2ParquetStore:
    """Two-level snowflake store (bus ⟵ vehicle ⟵ obs)."""

    def __init__(self, path: str):
        self.path = path

    def _p(self, table: str) -> str:
        return f"{self.path}/{table}"

    def write(self, documents: DataFrame, mode: str = "overwrite") -> None:
        bus, vehicle, obs = build_velocity2_tables(documents)
        if mode == "append":
            spark = documents.sparkSession
            # J7/J8: novelty anti-joins per dim level
            for name, df_new, key in (("bus", bus, "bus_id"), ("vehicle", vehicle, "vehicle_id")):
                try:
                    existing = spark.read.parquet(self._p(name)).select(key)
                    df_new = df_new.join(existing, key, "left_anti")
                except Exception as exc:  # first batch only — a corrupt
                    # store must fail loudly, not be silently re-seeded
                    from ..errors import is_missing_store_error

                    if not is_missing_store_error(exc):
                        raise
                df_new.write.mode(mode).parquet(self._p(name))
        else:
            bus.write.mode(mode).parquet(self._p("bus"))
            vehicle.write.mode(mode).parquet(self._p("vehicle"))
        obs.write.mode(mode).partitionBy(TS_BUCKET_COL).parquet(self._p("obs"))

    def get_document(self, spark: SparkSession, timestamp: str) -> DataFrame:
        bus = spark.read.parquet(self._p("bus"))
        vehicle = spark.read.parquet(self._p("vehicle"))
        obs = spark.read.parquet(self._p("obs")).filter(
            (F.col(TS_BUCKET_COL) == timestamp[:13]) & (F.col("timestamp") == timestamp)
        )
        flat = (
            obs.join(F.broadcast(vehicle), "vehicle_id")
            .join(F.broadcast(bus), "bus_id")
            .withColumn("id", F.col("vid"))
        )
        return flat.groupBy("timestamp").agg(
            F.sort_array(F.collect_list(feature_struct())).alias("_features")
        ).select(
            "timestamp",
            F.struct(
                F.lit("FeatureCollection").alias("type"),
                F.col("_features").alias("features"),
            ).alias("data"),
        )

    def total_size(self) -> int:
        from ..sources.size import dir_size

        return dir_size(self.path)
