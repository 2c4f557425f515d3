"""Z-order (Morton) clustering key — multi-dimensional data skipping.

Partitioning handles time; spatial point queries (bbox filters on
lon/lat) need BOTH dimensions clustered so parquet row-group min/max
stats prune. Sorting by the interleaved-bit Morton code gives each row
group a tight 2-D bounding box — the same idea as Delta's OPTIMIZE
ZORDER, as a pure column expression here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """double in [lo, hi] -> integer rank in [0, 2^bits)."""
    cells = (1 << bits) - 1
    frac = (col.cast("double") - F.lit(lo)) / F.lit(hi - lo)
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.round(clamped * F.lit(cells)).cast("long")


def interleave_bits(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code: bit i of x -> bit 2i, bit i of y -> bit 2i+1.
    Static unroll (shift amounts must be literals); stays JVM-side."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1).cast("long")), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1)
        )
    return z


def zorder_key(
    x: Column, y: Column, x_range: tuple[float, float], y_range: tuple[float, float], bits: int = 16
) -> Column:
    """Morton key for two bounded doubles (e.g. lon/lat over the service
    bbox). Ranges are fixed constants — data-independent, so the key is
    stable across ingest batches (no global min/max pass)."""
    return interleave_bits(
        _normalize(x, *x_range, bits=bits), _normalize(y, *y_range, bits=bits), bits=bits
    )


def cluster_by_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 16,
) -> DataFrame:
    """Sort within partitions by the Morton key (prepended to any existing
    write path: partitionBy handles time, z-order handles space)."""
    key = zorder_key(F.col(x_col), F.col(y_col), x_range, y_range, bits)
    return df.withColumn("_z", key).sortWithinPartitions("_z").drop("_z")
