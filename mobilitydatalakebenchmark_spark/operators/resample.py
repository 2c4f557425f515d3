"""Regular-grid resampling with linear interpolation (gap filling).

The reference's feed is a 20 s snapshot cadence with dropouts (vehicles
missing from snapshots); resampling onto a regular grid is the standard
repair before any per-entity time-series modeling. Shape: per entity,
generate the grid with `sequence()` (no driver loop), union grid points
into the observation stream, and carry the nearest real observation to
each side with IGNORE NULLS window frames — two window passes over one
entity-keyed shuffle, no joins, no explode of cross products.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.codecs import epoch_us


def resample_linear(
    df: DataFrame,
    step_s: int,
    id_col: str = "uuid",
    ts_col: str = "ts",
    val_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """One row per (entity, grid instant) at `step_s` spacing across the
    entity's own [min ts, max ts], each value linearly interpolated
    between the nearest real observations (exact at grid points that
    coincide with observations; edge grid points clamp to the boundary
    observation). Output: id, grid_ts, <val>_interp per value column."""
    us = epoch_us(ts_col)
    bounds = df.groupBy(id_col).agg(
        F.min(us).alias("_t0"), F.max(us).alias("_t1")
    )
    step_us = F.lit(step_s * 1_000_000)
    # ceil-align the grid start to the step so grids are phase-stable
    # across entities: first point = ceil(t0/step)*step
    grid_start = (-F.floor(-F.col("_t0") / step_us) * step_us).cast("long")
    # an entity whose span contains no grid multiple (e.g. a single
    # observation between grid points) gets an EMPTY grid — same as the
    # SQL generate_series contract; an unguarded sequence() would throw
    # on grid_start > _t1 and abort the whole job
    grid = bounds.select(
        id_col,
        F.explode(
            F.when(
                grid_start <= F.col("_t1"),
                F.sequence(grid_start, F.col("_t1"), step_us.cast("long")),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("_gus"),
    ).withColumn("_is_grid", F.lit(True))

    obs = df.select(
        F.col(id_col),
        us.alias("_gus"),
        F.lit(False).alias("_is_grid"),
        *[F.col(c).cast("double").alias(f"_v_{c}") for c in val_cols],
    )
    # grid rows order AFTER a coincident observation (False < True) so the
    # backward window sees the observation at the same instant
    merged = obs.unionByName(grid, allowMissingColumns=True)
    w_back = (
        Window.partitionBy(id_col)
        .orderBy("_gus", "_is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(id_col)
        .orderBy("_gus", "_is_grid")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_us = F.when(~F.col("_is_grid"), F.col("_gus"))
    prev_us = F.last(obs_us, ignorenulls=True).over(w_back)
    next_us = F.first(obs_us, ignorenulls=True).over(w_fwd)
    out_cols = [
        F.col(id_col),
        F.timestamp_micros(F.col("_gus")).alias("grid_ts"),
    ]
    for c in val_cols:
        pv = F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w_back)
        nv = F.first(F.col(f"_v_{c}"), ignorenulls=True).over(w_fwd)
        span = (next_us - prev_us).cast("double")
        frac = F.when(span > 0, (F.col("_gus") - prev_us) / span).otherwise(0.0)
        interp = F.coalesce(pv + (nv - pv) * frac, pv, nv)
        out_cols.append(interp.alias(f"{c}_interp"))
    return (
        merged.select(*out_cols, F.col("_is_grid"))
        .filter(F.col("_is_grid"))
        .drop("_is_grid")
    )
