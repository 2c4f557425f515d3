"""Unit tests for operators/cdc.py (latest-wins merge) and
operators/graph.py (integer PageRank)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.cdc import apply_changes
from mobilitydatalakebenchmark_spark.operators.graph import (
    pagerank_integer,
    symmetrize,
)

CDC_COLS = ["k", "seq", "val", "deleted"]


class TestApplyChanges:
    def test_insert_update_delete(self, spark):
        base = spark.createDataFrame(
            [(1, 1, "a", False), (2, 1, "b", False)], CDC_COLS
        )
        changes = spark.createDataFrame(
            [
                (1, 2, "a2", False),  # update key 1
                (2, 2, "b2", True),  # tombstone key 2
                (3, 2, "c", False),  # insert key 3
            ],
            CDC_COLS,
        )
        out = apply_changes(base, changes, ["k"], ["seq"], delete_col="deleted")
        got = {r.k: r.val for r in out.collect()}
        assert got == {1: "a2", 3: "c"}

    def test_reinsert_after_tombstone_resurrects(self, spark):
        base = spark.createDataFrame([(1, 1, "a", False)], CDC_COLS)
        changes = spark.createDataFrame(
            [(1, 2, "dead", True), (1, 3, "alive", False)], CDC_COLS
        )
        out = apply_changes(base, changes, ["k"], ["seq"], delete_col="deleted")
        assert [(r.k, r.val) for r in out.collect()] == [(1, "alive")]

    def test_stale_change_loses_to_base(self, spark):
        base = spark.createDataFrame([(1, 5, "new", False)], CDC_COLS)
        changes = spark.createDataFrame([(1, 2, "old", False)], CDC_COLS)
        out = apply_changes(base, changes, ["k"], ["seq"], delete_col="deleted")
        assert out.collect()[0].val == "new"

    def test_idempotent_replay(self, spark):
        """Applying the same changelog twice must be a no-op (exactly-once
        effect from at-least-once delivery)."""
        base = spark.createDataFrame([(1, 1, "a", False)], CDC_COLS)
        changes = spark.createDataFrame([(1, 2, "a2", False)], CDC_COLS)
        once = apply_changes(base, changes, ["k"], ["seq"], delete_col="deleted")
        twice = apply_changes(once, changes, ["k"], ["seq"], delete_col="deleted")
        assert once.collect() == twice.collect()


class TestPageRankInteger:
    def _ranks(self, df):
        return {r.node: r["rank"] for r in df.collect()}

    def test_symmetric_pair_equal_ranks(self, spark):
        edges = symmetrize(spark.createDataFrame([("a", "b")], ["src", "dst"]))
        r = self._ranks(pagerank_integer(edges, iterations=3))
        assert r["a"] == r["b"]
        # mass conservation up to truncation: each node keeps ~scale
        assert abs(r["a"] - 10**12) <= 1

    def test_star_center_dominates(self, spark):
        leaves = [("c", x) for x in ("l1", "l2", "l3", "l4")]
        edges = symmetrize(spark.createDataFrame(leaves, ["src", "dst"]))
        r = self._ranks(pagerank_integer(edges, iterations=3))
        assert r["c"] > r["l1"]
        assert len({r[f"l{i}"] for i in (1, 2, 3, 4)}) == 1  # symmetry

    def test_recurrence_exact_one_iteration(self, spark):
        """One iteration on a path graph a-b-c matches the hand-computed
        integer recurrence."""
        edges = symmetrize(
            spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
        )
        scale = 10**12
        r = self._ranks(pagerank_integer(edges, iterations=1, scale=scale))
        base = (15 * scale) // 100
        # a receives b's half; b receives a+c whole; c receives b's half
        assert r["a"] == base + (85 * (scale // 2)) // 100
        assert r["b"] == base + (85 * (scale + scale)) // 100
        assert r["c"] == r["a"]

    def test_determinism_across_partitionings(self, spark):
        rows = [(f"n{i}", f"n{(i * 7 + 1) % 20}") for i in range(40)]
        edges = symmetrize(spark.createDataFrame(rows, ["src", "dst"]))
        a = self._ranks(pagerank_integer(edges.repartition(1), iterations=2))
        b = self._ranks(pagerank_integer(edges.repartition(13), iterations=2))
        assert a == b


class TestTriangleCount:
    def _count(self, spark, pairs):
        from mobilitydatalakebenchmark_spark.operators.graph import triangle_count

        df = spark.createDataFrame(pairs, "a INT, b INT")
        return triangle_count(df).collect()[0]

    def test_two_triangles_with_bridge(self, spark):
        # {1,2,3}, {3,4,5}, and {2,3,4} (closed by the 2-4 bridge)
        r = self._count(
            spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5), (2, 4)]
        )
        assert r.n_triangles == 3

    def test_k4_clique(self, spark):
        # K4 has C(4,3)=4 triangles and every pair connected
        edges = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
        r = self._count(spark, edges)
        assert r.n_triangles == 4

    def test_triangle_free_star(self, spark):
        r = self._count(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
        assert r.n_triangles == 0
        assert r.n_wedges == 6  # C(4,2) pairs around the hub

    def test_duplicate_edges_do_not_double_count(self, spark):
        r = self._count(spark, [(1, 2), (1, 2), (1, 3), (2, 3), (2, 3)])
        assert r.n_triangles == 1


class TestPageRankLineage:
    def test_long_chain_bounded_plan_exact_values(self, spark):
        """9 iterations crosses two checkpoint boundaries (every 4). Values
        must equal the pure-python replay of the integer recurrence, and
        the final plan must be bounded (lineage truncated)."""
        arcs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 2)]
        edges = spark.createDataFrame(arcs, "src int, dst int")
        scale = 10**12
        ranks = pagerank_integer(edges, iterations=9, scale=scale)
        got = {r.node: r["rank"] for r in ranks.collect()}

        deg = {}
        for s, _ in arcs:
            deg[s] = deg.get(s, 0) + 1
        nodes = sorted(deg)
        r = {n: scale for n in nodes}
        base = (15 * scale) // 100
        for _ in range(9):
            s = {n: 0 for n in nodes}
            for u, v in arcs:
                if v in s:
                    s[v] += r[u] // deg[u]
            r = {n: base + (85 * s[n]) // 100 for n in nodes}
        assert got == r
        plan = ranks._jdf.queryExecution().optimizedPlan().toString()
        assert len(plan) < 50_000, f"lineage not truncated: {len(plan)} chars"
