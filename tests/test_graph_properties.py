"""Hypothesis property tests for the round-9 graph algorithms: frontier
BFS and bounded Bellman-Ford vs pure-Python brute-force references on
random small graphs. Few examples, one Spark pipeline per example — the
algorithms are iterative, so each example costs several jobs."""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st

from mobilitydatalakebenchmark_spark.operators.graph import (
    bellman_ford_bounded,
    bfs_hops,
)

# random undirected graph on up to 8 nodes as an edge set
edge = st.tuples(st.integers(0, 7), st.integers(0, 7))
graph = st.lists(edge, min_size=1, max_size=14)
wedge = st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(1, 9))
wgraph = st.lists(wedge, min_size=1, max_size=14)


def _adj(edges):
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return nbrs


def _ref_bfs(edges, src, max_hops):
    nbrs = _adj(edges)
    dist = {src: 0}
    frontier = [src]
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in nbrs.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return dist


def _ref_bf(edges, src, rounds):
    # min-weight collapse of parallel edges, then `rounds` relaxations
    w: dict[tuple[int, int], int] = {}
    for a, b, c in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        w[k] = min(w.get(k, 10**9), c)
    arcs = [(a, b, c) for (a, b), c in w.items()] + [
        (b, a, c) for (a, b), c in w.items()
    ]
    dist = {src: 0}
    for _ in range(rounds):
        new = dict(dist)
        for a, b, c in arcs:
            if a in dist and dist[a] + c < new.get(b, 10**9):
                new[b] = dist[a] + c
        dist = new
    return dist


@settings(max_examples=5, deadline=None)
@given(graph)
def test_bfs_matches_reference(spark, edges):
    edges = [e for e in edges if e[0] != e[1]]
    if not edges:
        return
    src = min(min(e) for e in edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["hop"] for r in bfs_hops(df, src, max_hops=8).collect()}
    assert got == _ref_bfs(edges, src, 8)


@settings(max_examples=5, deadline=None)
@given(wgraph)
def test_bellman_ford_matches_reference(spark, edges):
    edges = [e for e in edges if e[0] != e[1]]
    if not edges:
        return
    src = min(min(e[0], e[1]) for e in edges)
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["cost"]
        for r in bellman_ford_bounded(df, src, rounds=4).collect()
    }
    assert got == _ref_bf(edges, src, 4)


def test_bellman_ford_converged_equals_true_shortest_path(spark):
    """With rounds >= V-1 the bounded relaxation is the full SSSP: check
    against exhaustive simple-path enumeration on a fixed 6-node graph."""
    edges = [(0, 1, 4), (0, 2, 1), (2, 1, 1), (1, 3, 7), (2, 3, 9),
             (3, 4, 2), (1, 4, 3), (4, 5, 1), (0, 5, 20)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["cost"]
        for r in bellman_ford_bounded(df, 0, rounds=5).collect()
    }
    # exhaustive reference over all simple paths
    nodes = sorted({n for e in edges for n in e[:2]})
    wmap = {}
    for a, b, c in edges:
        k = (min(a, b), max(a, b))
        wmap[k] = min(wmap.get(k, 10**9), c)

    def best(dst):
        best_cost = None
        for r in range(1, len(nodes)):
            for mids in itertools.permutations([n for n in nodes if n not in (0, dst)], r - 1):
                path = (0, *mids, dst)
                cost = 0
                ok = True
                for u, v in zip(path, path[1:]):
                    k = (min(u, v), max(u, v))
                    if k not in wmap:
                        ok = False
                        break
                    cost += wmap[k]
                if ok and (best_cost is None or cost < best_cost):
                    best_cost = cost
        return best_cost

    for n in nodes:
        if n == 0:
            assert got[0] == 0
        else:
            assert got[n] == best(n), f"node {n}"
