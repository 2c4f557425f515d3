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

from ..session import local_df

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
    for it in range(iterations):
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
        # cut lineage on long chains — each round otherwise nests the whole
        # prior plan inside the next join, and 10+ rounds overwhelm the
        # optimizer (see module docstring); every-4 keeps at most 4 joins
        # of un-truncated plan while costing one materialization job
        if (it + 1) % 4 == 0 and it + 1 < iterations:
            # LAZY: the LogicalRDD boundary still caps what the optimizer
            # sees at 4 rounds; execution fuses into the consumer job
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle + wedge count over a canonical undirected edge list
    (``a < b``, distinct).

    Degree-ordering algorithm (the MapReduce-era standard for distributed
    triangle counting): orient every edge from its lower-degree endpoint to
    the higher (ties by id), so each node's out-degree is O(sqrt(m)) and
    every triangle has exactly ONE pivot — the vertex whose two oriented
    out-edges span it. Wedges are generated per pivot from the collected
    out-neighbor list (bounded by the sqrt(m) cap, so the array stays
    small no matter how skewed the raw degree distribution is — this is
    the skew story: a celebrity node of degree 10^6 still emits only its
    low-degree-side wedges), then closed against the canonical edge set
    with one equi-join.

    Shuffle posture: degree agg + orientation joins (degree table is tiny
    — broadcast), one groupBy(pivot) collect, one closure equi-join on
    (v, w). No O(d^2) blowup on hub nodes, no driver collect.
    """
    raw = edges.select(F.col(a).alias("a"), F.col(b).alias("b")).distinct()
    deg = (
        raw.select(F.col("a").alias("node"))
        .unionAll(raw.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    low_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        raw.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    # per-pivot out-neighbor array (id-sorted) -> all id-ordered pairs.
    # The explicit repartition pins the EXPLODE's parallelism: the agg
    # output is tiny in bytes (one row per pivot carrying an array), so
    # AQE coalesces it to ~1 partition and the wedge Generate — the
    # stage that blows each pivot into C(|ns|, 2) rows, the gate's
    # entire wall — ran on one core (guide §2.5: partition for the work
    # a stage EMITS, not the bytes it reads; measured 38 s -> ~3 s at
    # sf0.1). Hash on the pivot id: bounded extra exchange of the
    # adjacency rows at any scale.
    n_explode = oriented.sparkSession.sparkContext.defaultParallelism
    wedges = (
        oriented.groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("ns"))
        .repartition(n_explode, "u")
        .select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ns, (x, i) -> "
                        "transform(slice(ns, i + 2, size(ns)), "
                        "y -> struct(x AS v, y AS w)))"
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    )
    closed = wedges.join(
        raw, (wedges.v == raw.a) & (wedges.w == raw.b), "left_semi"
    )
    # n_wedges is the TOTAL wedge count Σ_v C(deg(v), 2) — the global
    # clustering-coefficient denominator (3·triangles / wedges) — computed
    # from the degree table alone; the oriented pairs above are only the
    # triangle-candidate subset and are never materialized beyond the join.
    # coalesce: on an empty edge set sum() is NULL; the contract is 0 wedges
    total_wedges = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("n_wedges")
    )
    return closed.agg(F.count("*").alias("n_triangles")).crossJoin(
        total_wedges
    ).select("n_triangles", "n_wedges")


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int | None = None,
) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node keeps
    degree >= k (Seidman 1983) — the standard density screen for spam/
    bot subgraph triage in link-quality pipelines.

    Peeling loop on SYMMETRIZED arcs: each round recomputes degrees over
    the surviving arc set and drops every node below k; arcs lose both
    endpoints' rows via two semi-joins. Converged when no node fell.

    ``max_rounds=None`` runs to convergence (the true k-core).
    ``max_rounds=r`` truncates the peel — each round is a pure
    deterministic relational step, so a SQL oracle can unroll exactly r
    rounds and match BIGINT-for-BIGINT (the pagerank_part_supplier gate
    pattern for iterative algorithms).

    Scale posture: every round is one groupBy(node) count + two semi
    joins, all hash-partitioned on node ids; the arc set only shrinks.
    ``localCheckpoint`` every round truncates the growing lineage (the
    components.py discipline). Rounds needed = the graph's degeneracy
    ordering depth — O(log n) for real-world skewed graphs, never more
    than the node count.
    """
    # canonicalize to unordered pairs first: an input holding both (a,b)
    # and (b,a) must not double an arc (symmetrize alone dedups only
    # directed pairs), or degrees double-count those neighbors
    undirected = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("src"),
            F.greatest(F.col(src), F.col(dst)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # LAZY checkpoints throughout the peel: the convergence count that
    # follows each round materializes the blocks, so one job per round
    # does checkpoint + count where an eager checkpoint plus two
    # convergence counts cost three (r13; the per-round arc count is
    # remembered instead of re-counting the previous round's arcs)
    arcs = symmetrize(undirected).localCheckpoint(eager=False)
    if max_rounds is not None and max_rounds <= 0:
        # zero truncated rounds = the raw degrees of the canonical graph
        return (
            arcs.groupBy("src")
            .agg(F.count(F.lit(1)).alias("core_degree"))
            .withColumnRenamed("src", "node")
        )
    n_arcs = arcs.count()  # materializes the checkpoint
    rounds = 0
    while True:
        deg = arcs.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        nxt = (
            arcs.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        rounds += 1
        n_next = nxt.count()  # materializes + feeds the convergence check
        done = (
            max_rounds is not None and rounds >= max_rounds
        ) or n_next == n_arcs  # converged when no arc fell this round
        arcs, n_arcs = nxt, n_next
        if done:
            break
    return (
        arcs.groupBy("src")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .withColumnRenamed("src", "node")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007), ``rounds`` bounded.

    Every node starts as its own community; each round it adopts the most
    frequent label among its neighbors (ties → smallest label). The node
    universe is nodes with at least one NON-self-loop edge — self-loops
    are dropped during canonicalization, so a node whose only edges are
    self-loops (or that has no edges) is absent from the output; join
    the result back to your node table if full coverage matters.
    Bounded rounds are the HONEST semantics here:
    synchronous LPA can oscillate on bipartite structure, so a
    convergence loop may never finish — and a fixed unroll is what a SQL
    oracle can replay exactly (the k_core/pagerank gate pattern).

    Scale: per round one arcs⋈labels equi-join (hash-partitioned on the
    node id), one (node, label) count, one per-node argmax window over
    label candidates (bounded by each node's distinct neighbor labels).
    ``localCheckpoint`` per round caps lineage. Community detection at
    corpus scale = near-dup cluster triage beyond connected components:
    LPA splits dense-vs-sparse regions components lump together.
    """
    undirected = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("src"),
            F.greatest(F.col(src), F.col(dst)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    arcs = symmetrize(undirected).localCheckpoint(eager=True)
    labels = (
        arcs.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    for _ in range(rounds):
        neigh = arcs.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        counted = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            # LAZY: still cuts the per-round plan at a LogicalRDD
            # boundary (the optimizer never sees more than one round),
            # but defers execution so all rounds run in ONE consumer job
            # instead of one eager materialization job per round (r13)
            .localCheckpoint(eager=False)
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Frontier BFS: exact hop distance from ``source`` to every reachable
    node, as ``(node, hop)`` rows (unreachable nodes absent).

    The loop is level-synchronous: the hop-``h`` frontier joins the arc
    table, newly discovered nodes (left-anti against everything settled)
    become the hop-``h+1`` frontier. A node's FIRST discovery is its
    shortest distance — the anti-join makes later rediscoveries no-ops,
    which is exactly the ``min(hop)`` a bounded recursive-CTE oracle
    computes. Bounded by ``max_hops`` with early exit on an empty
    frontier, so the result equals the unbounded BFS whenever the true
    eccentricity fits the bound.

    Scale: per level one equi-join (frontier ⋈ arcs, hash-partitioned on
    the node id — frontiers are usually small enough that AQE broadcasts
    them) + one anti-join against the settled set; ``localCheckpoint``
    per level cuts lineage, so shuffle count grows with the graph's
    DIAMETER, not its size. No driver-side collect: the early-exit probe
    is an ``isEmpty`` on the already-checkpointed frontier.
    """
    undirected = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("src"),
            F.greatest(F.col(src), F.col(dst)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    arcs = symmetrize(undirected).localCheckpoint(eager=True)
    # local_df: legacy list local-relation is ~10-30x slower per action
    dist = local_df(
        arcs.sparkSession, [(int(source), 0)], "node long, hop int"
    ).localCheckpoint(eager=True)
    frontier = dist
    for h in range(max_hops):
        discovered = (
            frontier.join(arcs, frontier["node"] == arcs["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hop", F.lit(h + 1).cast("int"))
            .localCheckpoint(eager=True)
        )
        if discovered.isEmpty():
            break
        dist = dist.unionByName(discovered).localCheckpoint(eager=True)
        frontier = discovered
    return dist


def bellman_ford_bounded(
    edges_w: DataFrame,
    source: int,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Bounded Bellman-Ford: cheapest cost from ``source`` to every node
    reachable within ``rounds`` edges, as ``(node, cost)`` rows.

    ``edges_w`` is an undirected weighted edge list (positive integer
    weights; parallel edges collapse to their min weight so the relaxed
    graph is well-defined). Round ``k`` relaxes every arc once, so after
    ``rounds`` rounds the table holds the exact min cost over all walks
    of ≤ ``rounds`` edges — the same set a depth-bounded recursive-CTE
    oracle enumerates. With ``rounds ≥ V-1`` this is the full
    single-source shortest path.

    Scale: one arcs⋈dist equi-join + one min-groupBy per round (both
    hash-partitioned on the node id — the same key, so the exchange is
    reused); ``localCheckpoint`` per round cuts lineage. Shuffle count
    ∝ rounds, never data size. Integer costs keep every engine
    bit-agreeing.
    """
    canon = (
        edges_w.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
            F.col(weight).alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    arcs = (
        canon.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionByName(
            canon.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
        )
        .localCheckpoint(eager=True)
    )
    dist = local_df(
        arcs.sparkSession, [(int(source), 0)], "node long, cost long"
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            dist.join(arcs, dist["node"] == arcs["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            .unionByName(dist)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            # LAZY: plan still cut per round, rounds fuse into the one
            # consumer job instead of one eager job per round (r13)
            .localCheckpoint(eager=False)
        )
        dist = relaxed
    return dist
