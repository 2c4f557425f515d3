"""Pareto frontier (skyline) as a reusable operator + its merge law.

The gate ``pareto_frontier_price_qty`` (plans/curation.py) pins the
cross-engine semantics on the driver tables; this module provides the
same sweep as a parameterized operator so the STREAMING maintainer
(streaming/skyline_stream.py) can re-merge stored frontiers with new
batches. The enabling algebra: the frontier operator is idempotent and
merge-associative —

    frontier(frontier(A) ∪ B) == frontier(A ∪ B)

because dominance is transitive: any point dominated in A ∪ B is
dominated by a frontier(A) point or a B point. So an incremental
maintainer never needs history, only the (tiny) current frontier.

Semantics: minimize ``cost_col``, maximize ``gain_col``, weak dominance
(a point survives unless some other point is <= cost AND >= gain with
one strict). Duplicate (cost, gain) points collapse to one row carrying
``n_dups`` and the minimum tiebreak id. Both columns must be exact
integers (the repo's hash-robustness discipline).

Scale: one sort per group key shared by the RANGE-frame window and the
per-cost max; output is the frontier — typically orders of magnitude
smaller than the input, which is what makes the streaming form cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    by: str,
    cost_col: str,
    gain_col: str,
    id_col: str | None = None,
    dups_col: str | None = None,
) -> DataFrame:
    """Weak Pareto frontier per ``by`` group: keep rows whose gain beats
    every strictly-cheaper row's max and equals the max at their own
    cost. Returns ``(by, cost_col, gain_col, n_dups[, keeper_id])``.

    ``dups_col``: when re-merging a stored frontier (whose rows already
    carry multiplicities), pass its ``n_dups`` column name so counts sum
    instead of recounting rows — the same ``weight_col`` convention as
    ``coalesce_intervals``."""
    w_cheaper = (
        Window.partitionBy(by)
        .orderBy(cost_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_here = Window.partitionBy(by, cost_col)
    swept = df.withColumn(
        "_best_cheaper", F.max(gain_col).over(w_cheaper)
    ).withColumn("_best_here", F.max(gain_col).over(w_here))
    frontier = swept.filter(
        (
            F.col("_best_cheaper").isNull()
            | (F.col(gain_col) > F.col("_best_cheaper"))
        )
        & (F.col(gain_col) == F.col("_best_here"))
    )
    n_dups = (
        F.sum(dups_col) if dups_col else F.count(F.lit(1))
    ).alias("n_dups")
    aggs = [n_dups]
    if id_col:
        aggs.append(F.min(id_col).alias(id_col))
    return frontier.groupBy(by, cost_col, gain_col).agg(*aggs)
