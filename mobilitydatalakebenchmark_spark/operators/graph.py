"""Iterative graph algorithms as DataFrame loops (PageRank in exact ints).

The reference has no graph operator; this extends the engine for the
training-data-pipeline north star (link-graph quality signals for corpus
curation — PageRank-style centrality is the classic web-crawl quality
prior). The companion ``operators/components.py`` covers connected
components with the same unrolled-DataFrame-iteration pattern.

All arithmetic is integer (ranks scaled by ``scale``): every iteration is
exactly reproducible on any engine — contributions use truncating integer
division, damping is ``(rank * 85) div 100`` — so the DuckDB oracle can
replay the identical recurrence with zero float drift.

Scale posture: one iteration = one equi-join (edges ⋈ ranks, both sides
hash-partitioned on the join key) + one groupBy(dst) sum with map-side
combine. Iterations reuse the same key partitioning, so AQE keeps the
exchange stable; for long chains, checkpoint every ~5 iterations to cut
lineage. Degrees are computed once. No driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct undirected edge set → both directed arcs."""
    pairs = edges.select(src, dst).distinct()
    return pairs.unionByName(
        pairs.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = DEFAULT_SCALE,
    persist: bool = True,
) -> DataFrame:
    """PageRank with damping 0.85 in exact scaled-integer arithmetic.

    ``edges`` is a directed arc list ``(src, dst)``; every node must have
    out-degree ≥ 1 (use :func:`symmetrize` for undirected graphs, which
    guarantees it). Returns ``(node, rank)`` with ``rank`` a bigint on the
    ``scale`` fixed-point grid.

    Recurrence (all integer ops, truncating division):
        contrib(u)  = rank(u) div deg(u)
        rank'(v)    = (15*scale) div 100  +  (85 * Σ contrib(u→v)) div 100
    """
    # edges and degrees are static across iterations — persist them so each
    # iteration's join reuses the materialized shuffle instead of re-deriving
    # the (distinct) edge list from the source scan every time
    if persist:
        edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    if persist:
        deg = deg.persist()
    nodes = deg.select(F.col("src").alias("node"))
    base = (15 * scale) // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contribs = (
            edges.join(deg, "src")
            .join(ranks, edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("contrib"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("s"))
        # every node has out-edges (deg table) but may lack in-edges: left
        # join back to the node universe so isolated-in nodes keep the base
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(85 * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
        )
    return ranks
