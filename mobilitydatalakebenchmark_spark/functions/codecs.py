"""Scalar encode/decode expressions (SURVEY.md §2.2).

All are native Column expressions — no Python UDFs — so they stay inside
WholeStageCodegen. The Cantor/elegant pairing functions need >64-bit integer
math (PRECISION=16 scaling ⇒ values ~1e33, reference ``stores/cantor
helpers`` at ``apache_parquet_cantor.py:13-55``); they use DecimalType(38,0)
arithmetic, which Spark evaluates JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- P6: direction ±1 involution (apache_parquet.py:35 / citus_store.py:121)


def encode_direction(direction: Column) -> Column:
    """direction ∈ {1,2} -> boolean (stored as direction-1)."""
    return (direction - F.lit(1)).cast("boolean")


def decode_direction(stored: Column) -> Column:
    """boolean -> direction ∈ {1,2}."""
    return stored.cast("int") + F.lit(1)


# -- P7/W1: timestamp bucketing (apache_parquet.py:17,27,107)


def ts_bucket(timestamp: Column, length: int = 13) -> Column:
    """Prefix bucket of the ISO timestamp string; 13 = hour granularity.
    Used as the partition column -> Spark partition pruning replaces the
    reference's filename arithmetic (F7)."""
    return F.substring(timestamp, 1, length)


# -- P8: ISO timestamp parse


def parse_ts(timestamp: Column) -> Column:
    return F.to_timestamp(timestamp)


# -- P11: fixed-point scaling (postgresql_velocity_split.py:121-122/176-179)

FIXED_POINT_SCALE = 10**8


def encode_fixed_point(x: Column, minimum: Column) -> Column:
    """(x - min) * 1e8 -> long. min comes from the per-document zone map (A4).
    round() before cast so float noise doesn't truncate to the wrong int."""
    return F.round((x - minimum) * F.lit(FIXED_POINT_SCALE)).cast("long")


def decode_fixed_point(stored: Column, minimum: Column) -> Column:
    return stored.cast("double") / F.lit(FIXED_POINT_SCALE) + minimum


# -- P12: Cantor / elegant pairing on DecimalType(38,0)
#    (apache_parquet_cantor.py:18-55). With PRECISION=16 the scaled ints are
#    ~1e16 and the paired value ~1e33 — beyond int64, within Decimal(38,0).

PAIRING_PRECISION = 16
_PAIR_SCALE = 10**PAIRING_PRECISION
_DEC = "decimal(38,0)"


def _scale_coord(x: Column, offset: int = 200) -> Column:
    """Coordinate -> non-negative integer: (x + offset) * 10^precision.
    offset 200 clears any lon/lat range. Rounding matches reference intent
    (int truncation there loses the last digit to float noise)."""
    return F.round((x + F.lit(offset)) * F.lit(_PAIR_SCALE)).cast(_DEC)


def _unscale_coord(n: Column, offset: int = 200) -> Column:
    return n.cast("double") / F.lit(float(_PAIR_SCALE)) - F.lit(float(offset))


def cantor_pair(x: Column, y: Column) -> Column:
    """Cantor pairing of scaled coords: (a+b)(a+b+1)/2 + b, Decimal(38,0).

    The halving happens on the even factor BEFORE the multiply: Spark's
    decimal division forces scale >= 6, and a scale-6 Decimal(38) tops out
    at 1e32 — s*(s+1) ~ 1.7e37 would overflow. (s/2)*(s+1) keeps every
    intermediate within Decimal(38,0)."""
    a = _scale_coord(x)
    b = _scale_coord(y)
    s = (a + b).cast(_DEC)
    s1 = (s + F.lit(1).cast(_DEC)).cast(_DEC)
    half_product = (
        F.when(s % 2 == 0, (s / 2).cast(_DEC) * s1).otherwise(s * (s1 / 2).cast(_DEC))
    ).cast(_DEC)
    return half_product + b


def elegant_pair(x: Column, y: Column) -> Column:
    """Szudzik 'elegant' pairing: if a >= b then a² + a + b else a + b²."""
    a = _scale_coord(x)
    b = _scale_coord(y)
    return F.when(a >= b, (a * a + a + b).cast(_DEC)).otherwise((a + b * b).cast(_DEC))


def elegant_unpair(z: Column) -> tuple[Column, Column]:
    """Inverse of elegant_pair -> (lon, lat) doubles.

    The reference inverts with float ``math.sqrt`` which loses precision at
    1e33 (SURVEY §7 'what's hard'); Decimal has no sqrt in Spark, so we take
    the float sqrt as a *seed* and correct it with ±1 integer adjustment —
    exact for our magnitudes.
    """
    zf = z.cast("double")
    seed = F.floor(F.sqrt(zf)).cast(_DEC)
    # correct the float sqrt: largest s with s*s <= z
    s1 = seed + F.lit(1).cast(_DEC)
    s_1 = seed - F.lit(1).cast(_DEC)
    s = (
        F.when(s1 * s1 <= z, s1)
        .when(seed * seed <= z, seed)
        .otherwise(s_1)
        .cast(_DEC)
    )
    diff = (z - s * s).cast(_DEC)
    a = F.when(diff < s, diff).otherwise(s)
    b = F.when(diff < s, s).otherwise((diff - s).cast(_DEC))
    return _unscale_coord(a), _unscale_coord(b)


# -- P14: md5 hash-consing key (postgresql_velocity.py:64-67)


def hashcons_key(*cols: Column, length: int = 8) -> Column:
    """md5(concat(cols))[:length] — deterministic dimension key."""
    return F.md5(F.concat_ws("", *[c.cast("string") for c in cols])).substr(1, length)


# -- P15: WKT point text (mobility_db_batch.py:87-89)


def wkt_point(lon: Column, lat: Column) -> Column:
    return F.format_string("POINT(%s %s)", lon.cast("string"), lat.cast("string"))


# -- P18: dense surrogate key by key order (postgresql_python_conv.py:55-56)


def surrogate_key(order_col: str):
    """row_number over a global ordering. NOTE: single-partition window —
    fine for dimension tables / per-bucket document ids; for fact-scale data
    use zipWithIndex-style (monotonically_increasing_id + offset fix) or key
    by the natural key instead. Callers at scale pass a partition column."""
    from pyspark.sql import Window

    return F.row_number().over(Window.orderBy(order_col))
