"""Deterministic multiplier bootstrap: resampling CIs without an RNG.

A 100-TB pipeline cannot bootstrap the classical way (draw B row-level
resamples of the full table): materializing B copies is B full shuffles,
and a seeded per-executor RNG is not replayable across retries or
engines. The standard scale trick (Poisson/multiplier bootstrap: weight
every row i.i.d. with mean-1 integer multipliers, one pass per replicate,
all replicates in ONE pass via an explode) becomes fully deterministic
here by drawing the multiplier from a hash instead of an RNG:

    w(row, rep) = md5("<salt><rep>_<key>") mod 3   in {0, 1, 2}, mean 1

Every engine that can md5 a string reproduces the exact same resample, so
the gate's DuckDB twin replays the full CI computation value-for-value —
the same trick the classifier/contrastive/A-Res operators in this repo
use for their sampling steps.

Exactness: weighted sums stay BIGINT (integer cents x {0,1,2} weights);
each replicate mean is ONE double division of two bigints; the CI bounds
are order statistics of the replicate means (no averaging of floats), so
there is no aggregation-order noise anywhere.

Scale: the explode is reps x corpus rows, but it feeds a map-side
combinable groupBy(rep) — the shuffle carries ``reps`` rows per map
partition, not reps x rows. One pass over the data regardless of B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_weight(rep, key, salt: str, mod: int = 3):
    """md5-derived integer multiplier in [0, mod) — the engine-portable
    bucket arithmetic shared with operators/classifier.py."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        rep.cast("string"),
                        F.lit("_"),
                        key.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def replicate_means(
    df: DataFrame,
    key_col: str,
    cents_col: str,
    reps: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """One row per bootstrap replicate: (rep, wsum, wn, mean).

    mean = sum(w * cents) / sum(w) — both sums exact BIGINT, one double
    division. ``sum(w)`` can only be 0 if every row drew weight 0
    (probability ~3^-n); callers on non-trivial inputs never see it, and
    the division then yields NULL rather than a wrong number.
    """
    rep = F.explode(F.sequence(F.lit(1), F.lit(reps))).alias("rep")
    weighted = df.select(
        F.col(key_col).alias("_k"), F.col(cents_col).alias("_c"), rep
    ).withColumn("_w", _hash_weight(F.col("rep"), F.col("_k"), salt))
    return (
        weighted.groupBy("rep")
        .agg(
            F.sum(F.col("_w") * F.col("_c")).alias("wsum"),
            F.sum("_w").alias("wn"),
        )
        .withColumn(
            # guarded: ANSI mode would otherwise CRASH (not NULL) on the
            # all-weights-zero replicate a tiny input can produce
            "mean",
            F.when(
                F.col("wn") > 0,
                F.col("wsum").cast("double") / F.col("wn").cast("double"),
            ),
        )
    )


def bootstrap_ci_mean(
    df: DataFrame,
    key_col: str,
    cents_col: str,
    reps: int = 32,
    lo_rank: int = 4,
    hi_rank: int = 29,
    salt: str = "boot",
) -> DataFrame:
    """Single-row bootstrap summary: point estimate + percentile CI.

    (n_reps, est_mean_cents, boot_lo_cents, boot_hi_cents): the point
    estimate is the plain mean (exact bigint sum / count); the bounds are
    the lo_rank-th and hi_rank-th ORDER STATISTICS of the replicate means
    (rank ties broken by rep id) — the percentile-bootstrap CI without
    interpolation, deterministic for any engine that sorts doubles the
    same way. Defaults: rank 4/29 of 32 reps ~ a 10%/90% interval.
    """
    means = replicate_means(df, key_col, cents_col, reps, salt)
    # explicit NULLS FIRST: degenerate zero-weight replicates carry NULL
    # means, and Spark ASC defaults NULLS FIRST while SQL oracles
    # default NULLS LAST — the rank order must be pinned, not assumed
    rn = F.row_number().over(
        Window.orderBy(F.col("mean").asc_nulls_first(), "rep")
    )
    ranked = means.withColumn("rn", rn)
    summary = ranked.agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.round(F.min(F.when(F.col("rn") == lo_rank, F.col("mean"))), 6).alias(
            "boot_lo_cents"
        ),
        F.round(F.min(F.when(F.col("rn") == hi_rank, F.col("mean"))), 6).alias(
            "boot_hi_cents"
        ),
    )
    point = df.agg(
        F.round(
            F.sum(F.col(cents_col)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("est_mean_cents")
    )
    # 1-row x 1-row: broadcast, no shuffle
    return summary.crossJoin(F.broadcast(point)).select(
        "n_reps", "est_mean_cents", "boot_lo_cents", "boot_hi_cents"
    )
