"""Audience-segment set algebra on Theta sketches.

"How many distinct users are in segment A AND segment B?" does not
decompose into per-segment counts — the exact answer needs a distinct
count over every pair's intersection, O(|pairs|) shuffles over raw data.
Theta sketches (Datasketches, Spark 4 ``theta_*`` functions) carry a
SAMPLE of each segment's hashed id space, so intersection / union /
difference happen on KB-sized states: one pass over the fact table
builds |segments| sketches, and every pairwise overlap question after
that is driver-free sketch algebra on a tiny self-join.

This is the segmentation/audience-overlap primitive of a training-data
pipeline (which sources share documents? how much does corpus A overlap
corpus B?) and of product analytics (feature-A ∩ feature-B users). At
100 TB the fact scan happens once; the pairwise stage touches
|segments|² sketch pairs — rows, not data.

Error model (published): a union of sketches at lgk=12 carries ~1.6%
relative standard error; an intersection's error scales with the UNION
size, not the intersection (small overlaps of large sets are the hard
case), so the gate bounds |est - exact| by a multiple of rse * |A ∪ B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_sketches(
    df: DataFrame,
    segment_col: str,
    id_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One Theta sketch per segment value: (segment, theta_sketch,
    approx_distinct). One shuffle keyed by segment; map-side partial
    sketching bounds what moves to |segments| x sketch-size."""
    return (
        df.groupBy(F.col(segment_col).alias("segment"))
        .agg(F.theta_sketch_agg(F.col(id_col), lgk).alias("theta"))
        .withColumn("approx_distinct", F.theta_sketch_estimate("theta"))
    )


def segment_overlap(sketches: DataFrame) -> DataFrame:
    """Pairwise set algebra over the segment sketches (a < b ordering):
    estimated |A|, |B|, |A ∩ B|, |A ∪ B| and the derived Jaccard. The
    input is |segments| rows, so the self-join is trivially broadcast;
    nothing here touches raw data."""
    a = sketches.select(
        F.col("segment").alias("seg_a"),
        F.col("theta").alias("_ta"),
        F.col("approx_distinct").alias("est_a"),
    )
    b = sketches.select(
        F.col("segment").alias("seg_b"),
        F.col("theta").alias("_tb"),
        F.col("approx_distinct").alias("est_b"),
    )
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("_ta"), F.col("_tb"))
    )
    union = F.theta_sketch_estimate(F.theta_union(F.col("_ta"), F.col("_tb")))
    return (
        a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            "est_a",
            "est_b",
            inter.alias("est_intersection"),
            union.alias("est_union"),
        )
        .withColumn(
            "est_jaccard",
            F.when(F.col("est_union") > 0,
                   F.col("est_intersection") / F.col("est_union"))
            .otherwise(F.lit(0.0)),
        )
    )
