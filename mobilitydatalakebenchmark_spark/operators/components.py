"""Connected components over a pair-edge list — the missing piece between
"near-duplicate PAIRS" and "deduplicated CORPUS".

Near-dup detection (MinHash-LSH / SimHash / cosine) emits edges; dropping
duplicates needs the transitive closure: if A~B and B~C, one keeper serves
all three. Implemented as iterative min-label propagation in pure
DataFrame ops (no GraphX/GraphFrames dependency):

    label(v) <- min(label(v), min over neighbors(label(u)))   # hop step
    label(v) <- label(label(v))                               # pointer doubling

Each iteration is two joins + one aggregate. The hop step alone needs
diameter-many rounds (label 0 travels one edge per round); the pointer-
doubling step halves the remaining distance-to-root each round, so
convergence is O(log diameter) — a 1M-node path converges in ~20 rounds
instead of 1M. Near-dup clusters are tiny (3-5 rounds), but chain-shaped
components (versioned document series, trajectory stitching) are exactly
the deep-diameter case. The loop stops early when labels stop changing.
At 100 TB the edge list is the (small) LSH candidate output, not the
corpus — the corpus is only touched by the final keeper anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 10,
) -> DataFrame:
    """-> (node, component) where component = min node id reachable.
    Only nodes that appear in edges are returned (isolated nodes are their
    own component by definition and never need relabeling)."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    # materialize the edge list ONCE: every iteration joins against sym, so
    # leaving it lazy re-embeds its entire upstream pipeline (e.g. the LSH
    # candidate generation) in the plan of every round — at 2 joins/round
    # that alone took the drop-near-duplicates gate to 200+ static
    # exchanges. The edge list is the small candidate output by contract.
    sym = sym.localCheckpoint(eager=True)
    nodes = (
        sym.select(F.col("u").alias("node"))
        .unionByName(sym.select(F.col("v").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node"))

    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.u == labels.node)
            .groupBy("v")
            .agg(F.min("component").alias("nbr_component"))
        )
        hopped = (
            labels.join(neighbor_min, labels.node == neighbor_min.v, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer doubling: comp(v) <- comp(comp(v)). Every label IS a node
        # id from this edge set, so the self-join hits unless comp(v) == v
        # already (coalesce keeps it). Halves remaining diameter per round.
        parents = hopped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            hopped.join(parents, hopped.component == parents.p_node, "left")
            .select(
                "node",
                F.coalesce("p_comp", "component").alias("component"),
            )
        )
        # lazy checkpoint BEFORE the convergence probe: the probe is an
        # action, so without a cut new_labels' whole round plan executes
        # once for the probe and AGAIN when the next round (or the final
        # consumer) re-embeds it — ~2x work per round (r13 measurement;
        # the r12 every-other-round eager cut only bounded plan SIZE).
        # The probe materializes the blocks; any partitions its limit
        # short-circuits past are completed by the checkpoint's own
        # finisher job, so the next round reads blocks, never the plan.
        new_labels = new_labels.localCheckpoint(eager=False)
        # convergence check: any label still shrinking?
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def drop_near_duplicates(
    corpus: DataFrame,
    pair_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Remove every near-duplicate except the min-id representative of its
    component. corpus rows not mentioned in any edge pass through."""
    comp = connected_components(pair_edges, src, dst)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return corpus.join(losers, id_col, "left_anti")
