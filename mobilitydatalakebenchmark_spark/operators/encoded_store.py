"""Encoded storage pipelines — the coordinate-compression strategies.

Reference stores reproduced:
- ApacheParquetCantorStore (``stores/apache_parquet_cantor.py``): flat table
  with (lon, lat) replaced by one pairing-function integer, packed to
  15-byte little-endian binary (P12+P13). Decode on read.
- PostgreSQLVelocitySplitStore (``stores/postgresql_velocity_split.py``):
  per-document zone map (min lon/lat, A4) + fixed-point delta-encoded
  coordinates against the zone minimum (P11), restored on read
  (``:176-179``).

Both are pure column-expression transforms over the flat observation table;
compression comes from storing small/structured integers that parquet
encodes tightly (delta/bit-packing), exactly the physical effect the
reference was measuring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codecs import (
    decode_fixed_point,
    elegant_pair,
    elegant_unpair,
    encode_fixed_point,
    pack_le_bytes,
    ts_bucket,
    unpack_le_bytes,
)
from ..schemas import TS_BUCKET_COL
from .flat_store import explode_features, renest_documents


class CantorParquetStore:
    """Flat store with paired+packed coordinates (P12/P13).

    ``packed=True`` stores the 15-byte binary exactly like the reference's
    ``pyarrow.binary(15)`` column; ``packed=False`` keeps the Decimal(38,0)
    pair (pure-expression path, no pandas_udf in the write). Positive
    coordinates only (offset=0), matching the reference's domain."""

    def __init__(self, path: str, bucket_len: int = 13, packed: bool = True):
        self.path = path
        self.bucket_len = bucket_len
        self.packed = packed

    def write(self, documents: DataFrame, mode: str = "overwrite") -> None:
        flat = explode_features(documents)
        pair = elegant_pair(
            F.col("coordinates_0").cast("double"),
            F.col("coordinates_1").cast("double"),
            offset=0,
        )
        coord_col = pack_le_bytes(pair) if self.packed else pair
        encoded = flat.withColumns(
            {
                "coords_paired": coord_col,
                TS_BUCKET_COL: ts_bucket(F.col("timestamp"), self.bucket_len),
            }
        ).drop("coordinates_0", "coordinates_1")
        (
            encoded.write.mode(mode)
            .partitionBy(TS_BUCKET_COL)
            .parquet(self.path)
        )

    def scan_decoded(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.path)
        z = (
            unpack_le_bytes(F.col("coords_paired"))
            if self.packed
            else F.col("coords_paired")
        )
        lon, lat = elegant_unpair(z, offset=0)
        return df.withColumns(
            {
                "coordinates_0": lon.cast("float"),
                "coordinates_1": lat.cast("float"),
            }
        ).drop("coords_paired")

    def get_document(self, spark: SparkSession, timestamp: str) -> DataFrame:
        flat = self.scan_decoded(spark).filter(
            (F.col(TS_BUCKET_COL) == timestamp[: self.bucket_len])
            & (F.col("timestamp") == timestamp)
        )
        return renest_documents(flat)

    def total_size(self) -> int:
        from ..sources.size import dir_size

        return dir_size(self.path)


class VelocitySplitParquetStore:
    """Zone-mapped fixed-point store (A4 + P11).

    doc table: (timestamp, min_lon, min_lat) — the per-document zone map;
    obs table: coordinates as long offsets from the zone minimum."""

    def __init__(self, path: str, bucket_len: int = 13):
        self.path = path
        self.bucket_len = bucket_len

    def _p(self, table: str) -> str:
        return f"{self.path}/{table}"

    def write(self, documents: DataFrame, mode: str = "overwrite") -> None:
        flat = explode_features(documents)
        zone = flat.groupBy("timestamp").agg(
            F.min(F.col("coordinates_0").cast("double")).alias("min_lon"),
            F.min(F.col("coordinates_1").cast("double")).alias("min_lat"),
        )
        obs = (
            flat.join(F.broadcast(zone), "timestamp")
            .withColumns(
                {
                    "lon_fp": encode_fixed_point(
                        F.col("coordinates_0").cast("double"), F.col("min_lon")
                    ),
                    "lat_fp": encode_fixed_point(
                        F.col("coordinates_1").cast("double"), F.col("min_lat")
                    ),
                    TS_BUCKET_COL: ts_bucket(F.col("timestamp"), self.bucket_len),
                }
            )
            .drop("coordinates_0", "coordinates_1", "min_lon", "min_lat")
        )
        zone.write.mode(mode).parquet(self._p("doc"))
        obs.write.mode(mode).partitionBy(TS_BUCKET_COL).parquet(self._p("obs"))

    def get_document(self, spark: SparkSession, timestamp: str) -> DataFrame:
        zone = spark.read.parquet(self._p("doc")).filter(
            F.col("timestamp") == timestamp
        )
        obs = spark.read.parquet(self._p("obs")).filter(
            (F.col(TS_BUCKET_COL) == timestamp[: self.bucket_len])
            & (F.col("timestamp") == timestamp)
        )
        flat = (
            obs.join(F.broadcast(zone), "timestamp")
            .withColumns(
                {
                    "coordinates_0": decode_fixed_point(
                        F.col("lon_fp"), F.col("min_lon")
                    ).cast("float"),
                    "coordinates_1": decode_fixed_point(
                        F.col("lat_fp"), F.col("min_lat")
                    ).cast("float"),
                }
            )
            .drop("lon_fp", "lat_fp", "min_lon", "min_lat")
        )
        return renest_documents(flat)

    def total_size(self) -> int:
        from ..sources.size import dir_size

        return dir_size(self.path)
