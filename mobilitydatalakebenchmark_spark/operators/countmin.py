"""Count-Min sketch as a relational table — mergeable point-frequency
estimates for key spaces too large to count exactly.

The CMS is d hash rows x w buckets of counters; estimate(k) = min over
rows of cell[r][h_r(k)]. Expressed relationally the sketch IS a tiny
(d*w)-row table built by ONE shuffle (explode keys into their d cells,
groupBy-sum), and two sketches MERGE by unioning cell tables and
re-summing — the property that lets every shard/stream epoch sketch
independently and combine later (the same mergeability story as the
rollup's HLL/KLL states, here for point frequencies; Misra-Gries in
text_analysis.py answers top-k, CMS answers "how often is THIS key").

Estimates never undercount (each cell >= the key's true count) and
overcount by at most the collision mass of the key's d cells — with
deterministic md5-derived hashes the whole construction is
engine-exact, so the oracle twin recomputes identical cells, estimates
and overcounts (no probabilistic bound needs asserting: the driver
compares the actual values).

Scale: the cell table is d*w rows regardless of corpus size —
broadcast-joinable everywhere; building is one explode (xd) plus one
bounded-width shuffle with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cm_bucket(key_col: str, r, w: int):
    """Deterministic md5-derived bucket: row-salted, engine-portable
    (DuckDB twin: CAST('0x'||substr(md5('cm'||r||':'||key),1,8) AS
    BIGINT) % w)."""
    r_str = r.cast("string") if hasattr(r, "cast") else F.lit(str(r))
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cm"), r_str, F.lit(":"),
                        F.col(key_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def countmin_build(
    df: DataFrame, key_col: str, d: int = 3, w: int = 64
) -> DataFrame:
    """Build the (r, b, cell) table from raw rows: each row lands in one
    bucket per hash row. One explode (xd) + one (d*w)-wide shuffle."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r")
    return (
        df.select(F.col(key_col), rows)
        .select(
            "r",
            _cm_bucket(key_col, F.col("r"), w).alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def countmin_merge(*cell_tables: DataFrame) -> DataFrame:
    """Merge independently-built sketches: union + re-sum. Exactly the
    sketch a single build over the concatenated inputs produces."""
    it = iter(cell_tables)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    return out.groupBy("r", "b").agg(F.sum("cell").alias("cell"))


def countmin_estimates(
    cells: DataFrame, keys: DataFrame, key_col: str, d: int = 3, w: int = 64
) -> DataFrame:
    """Point estimates for ``keys``: route each key to its d cells
    (broadcast of the d*w-row cell table) and take the min.

    LEFT join + zero-fill, not inner: a cell absent from the table means
    its counter is 0, so a key never seen at build time (and not fully
    shadowed by collisions) correctly estimates 0 — an inner join would
    either drop the key from the output (all d cells empty) or
    overestimate from its non-empty cells only."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r")
    routed = keys.select(F.col(key_col), rows).select(
        key_col,
        "r",
        _cm_bucket(key_col, F.col("r"), w).alias("b"),
    )
    return (
        routed.join(F.broadcast(cells), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cell"), F.lit(0).cast("long"))).alias(
                "est_n"
            )
        )
    )
