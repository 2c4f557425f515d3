"""Unit tests for the round-9 session additions: frontier BFS, forward
fill, and sequence-regex path semantics (the streaming session gate is
oracle-verified end-to-end by check_oracle; here we pin the operator-level
edge cases a gate diff would blur)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.graph import bfs_hops


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestBfsHops:
    def test_path_graph_distances(self, spark):
        # 0-1-2-3 chain: hop == node id
        dist = bfs_hops(_edges(spark, [(0, 1), (1, 2), (2, 3)]), 0)
        got = {r["node"]: r["hop"] for r in dist.collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_shortest_wins_over_longer_walk(self, spark):
        # 0-1-2-3 chain plus shortcut 0-3: node 3 is hop 1, not 3
        dist = bfs_hops(_edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)]), 0)
        got = {r["node"]: r["hop"] for r in dist.collect()}
        assert got[3] == 1 and got[2] == 2

    def test_unreachable_component_absent(self, spark):
        dist = bfs_hops(_edges(spark, [(0, 1), (5, 6)]), 0)
        got = {r["node"]: r["hop"] for r in dist.collect()}
        assert got == {0: 0, 1: 1}

    def test_undirected_and_self_loops_ignored(self, spark):
        # edge direction must not matter; self-loops never create hops
        dist = bfs_hops(_edges(spark, [(1, 0), (1, 1), (2, 1)]), 0)
        got = {r["node"]: r["hop"] for r in dist.collect()}
        assert got == {0: 0, 1: 1, 2: 2}

    def test_max_hops_truncates_frontier(self, spark):
        dist = bfs_hops(_edges(spark, [(0, 1), (1, 2), (2, 3)]), 0, max_hops=2)
        got = {r["node"]: r["hop"] for r in dist.collect()}
        assert got == {0: 0, 1: 1, 2: 2}  # node 3 beyond the bound

    def test_cycle_terminates(self, spark):
        dist = bfs_hops(_edges(spark, [(0, 1), (1, 2), (2, 0)]), 0)
        got = {r["node"]: r["hop"] for r in dist.collect()}
        assert got == {0: 0, 1: 1, 2: 1}


class TestForwardFillSemantics:
    def _fill(self, spark, rows):
        from pyspark.sql import Window

        df = spark.createDataFrame(rows, "k long, seq long, v long")
        w = (
            Window.partitionBy("k")
            .orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return {
            (r["k"], r["seq"]): r["f"]
            for r in df.select(
                "k", "seq", F.last("v", ignorenulls=True).over(w).alias("f")
            ).collect()
        }

    def test_gap_takes_most_recent_value(self, spark):
        got = self._fill(
            spark, [(1, 1, 10), (1, 2, None), (1, 3, None), (1, 4, 40)]
        )
        assert got[(1, 2)] == 10 and got[(1, 3)] == 10 and got[(1, 4)] == 40

    def test_leading_gap_stays_null(self, spark):
        got = self._fill(spark, [(1, 1, None), (1, 2, 20)])
        assert got[(1, 1)] is None and got[(1, 2)] == 20

    def test_fill_never_crosses_entities(self, spark):
        got = self._fill(spark, [(1, 1, 10), (2, 2, None)])
        assert got[(2, 2)] is None


class TestSequenceRegexPaths:
    def test_path_order_and_counts(self, spark):
        df = spark.createDataFrame(
            [(1, i, c) for i, c in enumerate("vvcpsevvp")],
            "user_id long, seq long, i string",
        )
        ordered = F.array_sort(F.collect_list(F.struct("seq", "i")))
        path = F.concat_ws("", F.transform(ordered, lambda s: s["i"]))
        row = (
            df.groupBy("user_id")
            .agg(path.alias("path"))
            .select(
                "path",
                F.regexp_count("path", F.lit("v+c*p")).alias("n_funnel"),
            )
            .first()
        )
        assert row["path"] == "vvcpsevvp"
        # greedy non-overlapping: 'vvcp' then 'vvp'
        assert row["n_funnel"] == 2


class TestBellmanFordBounded:
    def _bf(self, spark, triples, source, rounds=4):
        from mobilitydatalakebenchmark_spark.operators.graph import (
            bellman_ford_bounded,
        )

        df = spark.createDataFrame(triples, "src long, dst long, w long")
        return {
            r["node"]: r["cost"]
            for r in bellman_ford_bounded(df, source, rounds=rounds).collect()
        }

    def test_cheaper_long_path_beats_direct_edge(self, spark):
        # direct 0-2 costs 10; via 1 costs 2
        got = self._bf(spark, [(0, 2, 10), (0, 1, 1), (1, 2, 1)], 0)
        assert got[2] == 2

    def test_parallel_edges_collapse_to_min(self, spark):
        got = self._bf(spark, [(0, 1, 5), (1, 0, 2)], 0)
        assert got[1] == 2

    def test_round_bound_limits_walk_length(self, spark):
        # chain of weight-1 edges; rounds=2 reaches only 2 edges out
        got = self._bf(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)], 0, rounds=2)
        assert got == {0: 0, 1: 1, 2: 2}

    def test_undirected_relaxation(self, spark):
        got = self._bf(spark, [(2, 0, 3)], 0)
        assert got[2] == 3
