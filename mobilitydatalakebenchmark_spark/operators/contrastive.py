"""Deterministic contrastive negative mining without a cross join.

Contrastive / triplet training (SimCLR, CLIP, sentence-transformers) needs
k negatives per anchor drawn from a different class. The naive plan is an
anchor x candidate cross join filtered by label mismatch — O(n²) rows
before the limit, dead at corpus scale. This module uses the standard
blocked construction instead:

* every candidate lands in one of ``n_buckets`` pseudo-random buckets
  (first 8 md5 hex chars of its id, mod B — stable across runs/engines);
* every anchor probes exactly one pseudo-random bucket (same hash algebra
  on ``'probe:' + id`` so an anchor's own bucket choice is independent of
  its candidate bucket);
* within the probed bucket, candidates of a DIFFERENT label are ranked by
  ``md5(anchor_id || ':' || cand_id)`` — a per-anchor deterministic
  shuffle — and the top ``k`` survive.

Join size is ``n * (n / B)`` — linear in the corpus for ``B ∝ n`` — and
every step is engine-reproducible integer/string algebra (md5 is md5
everywhere), so a SQL oracle can replay the sample exactly. An anchor can
come up short only if its probed bucket holds fewer than k other-label
candidates; sizing ``B ≈ n / (50·k)`` makes that a tail event (and the
shortfall is visible, not silent: emitted rows just stop below k).

Scale: one shuffle to bucket candidates, one equi-join on the bucket id,
one per-anchor top-k window over ~n/B rows. No broadcast of the corpus,
no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(id_col: Column, n_buckets: int, salt: str) -> Column:
    """Stable bucket in [0, n_buckets): first 8 md5 hex chars as an int.

    ``conv(hex, 16, 10)`` of 8 hex chars fits a BIGINT exactly — the same
    expression DuckDB reproduces with ``from_hex``/cast algebra.
    """
    h = F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % n_buckets).cast("int")


def negative_samples(
    candidates: DataFrame,
    id_col: str,
    label_col: str,
    k: int = 4,
    n_buckets: int = 8,
    anchors: DataFrame | None = None,
) -> DataFrame:
    """Per-anchor deterministic k negatives from a different class.

    Returns ``(anchor_id, neg_rank, neg_id, neg_label)`` with
    ``neg_rank`` in 1..k. ``anchors`` defaults to all candidates.
    """
    cand = candidates.select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        _bucket(F.col(id_col), n_buckets, "cand:").alias("bucket"),
    )
    anc = (anchors or candidates).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        _bucket(F.col(id_col), n_buckets, "probe:").alias("bucket"),
    )
    draw = F.md5(
        F.concat(
            F.col("anchor_id").cast("string"), F.lit(":"), F.col("neg_id").cast("string")
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("draw", "neg_id")
    return (
        anc.join(cand, "bucket")
        .filter(F.col("neg_label") != F.col("anchor_label"))
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .withColumn("draw", draw)
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("anchor_id", "neg_rank", "neg_id", "neg_label")
    )
