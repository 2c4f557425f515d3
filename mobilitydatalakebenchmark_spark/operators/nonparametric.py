"""Nonparametric two-sample tests, exact-integer style: KS and
Mann-Whitney U.

The chi-square drift gate (plans/curation.drift_chi2_event_mix) screens
CATEGORICAL mix shift; a pipeline also needs the continuous-distribution
complements: did the VALUE distribution drift between two windows (KS),
and does one group stochastically dominate another (Mann-Whitney U,
whose normalization U/(n1*n2) is exactly the AUC — the statistic every
ranking/classifier eval reports)?

Both statistics are rational numbers with known denominators, so the
whole computation stays BIGINT until one final division:

* KS: D = max |F1(v) - F2(v)| over observed values. Multiplying through
  by n1*n2 gives d_scaled = max |cum1*n2 - cum2*n1| — integer.
* MWU: with midranks for ties, 2*midrank of a tie-run starting at
  1-based position s with length c is the integer 2s + c - 1, so
  2*R1 = sum(c1 * (2s + c - 1)) and 2*U1 = 2*R1 - n1*(n1+1) are exact;
  AUC = 2*U1 / (2*n1*n2).

Plan shape: one groupBy(value) collapse of the raw data (the only
corpus-sized shuffle), then a RANGE-PARTITIONED prefix sum over the
distinct values (functions/codecs.prefix_sums: rank within sampled
ranges + broadcast cumulative range offsets) — no unpartitioned window,
so no task ever sorts the whole distinct-value table even when value
cardinality approaches row count (continuous measures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import prefix_sums


def _group_counts(
    df: DataFrame, value_col: str, is_g1: Column
) -> DataFrame:
    """Collapse to one row per distinct value with per-group counts."""
    return df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.when(is_g1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(is_g1, 0).otherwise(1)).alias("c2"),
    )


def ks_two_sample(df: DataFrame, value_col: str, is_g1: Column) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance, exact until one division.

    Output (single row): n1, n2, d_scaled = max|cum1*n2 - cum2*n1|
    (BIGINT), and d = round(d_scaled/(n1*n2), 6).
    """
    counts = _group_counts(df, value_col, is_g1)
    # scale-safe running sums: range-partitioned prefix sums (codecs.
    # prefix_sums) instead of an UNPARTITIONED window — no task ever
    # sorts the whole distinct-value table (r12 optimization; identical
    # values, the ordering "v" is unique by construction). n1/n2 ride
    # along as exact grand-total literals from the same per-range job.
    cum = prefix_sums(
        counts,
        "v",
        ["c1", "c2"],
        out_cols=["f1", "f2"],
        total_cols={"c1": "n1", "c2": "n2"},
    )
    return (
        cum.groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
            ).alias("d_scaled")
        )
        .select(
            "n1",
            "n2",
            "d_scaled",
            # D is undefined when either sample is empty: NULL, not an
            # ANSI divide-by-zero crash (degenerate sweep, r11)
            F.when(
                F.col("n1") * F.col("n2") > 0,
                F.round(
                    F.col("d_scaled").cast("double")
                    / (F.col("n1") * F.col("n2")).cast("double"),
                    6,
                ),
            ).alias("d"),
        )
    )


def mann_whitney_u(
    df: DataFrame, value_col: str, is_g1: Column
) -> DataFrame:
    """Mann-Whitney U with midrank tie handling, exact integers.

    Output (single row): n1, n2, u1_scaled2 = 2*U1, u2_scaled2 = 2*U2
    (both BIGINT; u1+u2 = 2*n1*n2 by construction) and
    auc = round(2*U1 / (2*n1*n2), 6) — P(X1 > X2) + P(X1 = X2)/2.
    """
    counts = _group_counts(df, value_col, is_g1).withColumn(
        "cnt", F.col("c1") + F.col("c2")
    )
    # scale-safe exclusive prefix: inclusive range-partitioned prefix sum
    # minus the row's own count (codecs.prefix_sums — no unpartitioned
    # window; r12 optimization, identical integers). totals stay the
    # 1-row agg + broadcast cross join so the empty-input convention
    # (one all-NULL row) is unchanged.
    ranked = prefix_sums(
        counts, "v", ["cnt"], out_cols=["_cum_cnt"]
    ).withColumn(
        "start", F.col("_cum_cnt") - F.col("cnt") + 1
    ).withColumn("rank2", 2 * F.col("start") + F.col("cnt") - 1)
    totals = counts.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    r1_2 = ranked.agg(
        F.sum(F.col("c1") * F.col("rank2")).alias("r1_scaled2")
    )
    return (
        r1_2.crossJoin(F.broadcast(totals))
        .select(
            "n1",
            "n2",
            (
                F.col("r1_scaled2") - F.col("n1") * (F.col("n1") + 1)
            ).alias("u1_scaled2"),
        )
        .select(
            "n1",
            "n2",
            "u1_scaled2",
            (2 * F.col("n1") * F.col("n2") - F.col("u1_scaled2")).alias(
                "u2_scaled2"
            ),
            # AUC undefined when either group is empty (see ks note)
            F.when(
                F.col("n1") * F.col("n2") > 0,
                F.round(
                    F.col("u1_scaled2").cast("double")
                    / (2 * F.col("n1") * F.col("n2")).cast("double"),
                    6,
                ),
            ).alias("auc"),
        )
    )
