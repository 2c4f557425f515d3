"""Skew mitigation — salting for hot keys (SURVEY §4 posture; AQE's
skew-join splitting covers joins automatically, salting covers the
aggregation side and pre-AQE engines).

Pattern: two-phase aggregation. Phase 1 groups on (key, salt) — the hot
key's rows spread over `n_salts` reducers; phase 2 merges the partials per
key. Correct for any algebraic aggregate (sum/count/min/max); averages
carry (sum, count) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Uniform int salt derived from a stable row hash (no RNG, so retries
    and speculative tasks agree)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe sum+count per key. Output columns:
    (key..., total, n)."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_ps"), F.count("*").alias("_pc")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_ps").alias("total"), F.sum("_pc").cast("long").alias("n")
    )


def replicate_broadcast_for_salted_join(
    dim: DataFrame, n_salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Explode the (small) dim side across all salt values so a salted fact
    can still equi-join it: fact(key, salt) ⋈ dim(key, salt)."""
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
