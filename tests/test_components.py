"""Connected components + end-to-end near-dup removal on planted clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.components import (
    connected_components,
    drop_near_duplicates,
)


def test_components_chain_and_clusters(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_converges_early(spark):
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    comp = {r.node: r.component for r in connected_components(edges, max_iter=50).collect()}
    assert comp == {1: 1, 2: 1}


def test_drop_near_duplicates_end_to_end(spark):
    """Full pipeline: corpus with a planted 3-doc near-dup cluster ->
    MinHash-LSH pairs -> transitive closure -> one keeper survives."""
    from mobilitydatalakebenchmark_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),   # ~dup of 1
        (3, base.replace("quick", "speedy")),  # ~dup of 1 (and 2 transitively)
        (4, "completely different text about apache spark shuffle internals"),
        (5, "another unrelated document mentioning parquet row groups"),
    ]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = minhash_near_duplicates(corpus, min_jaccard=0.5)
    kept = drop_near_duplicates(corpus, pairs)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert 4 in ids and 5 in ids
    survivors_of_cluster = [i for i in ids if i in (1, 2, 3)]
    assert survivors_of_cluster == [1]  # min-id keeper, transitive closure


def test_components_lineage_bounded_deep_diameter(spark):
    """A 30-node path needs ~15 label-propagation rounds; without periodic
    localCheckpoint the physical plan doubles per round. Assert both the
    answer (one component, min label 0) and that the final plan string is
    bounded — i.e. lineage was actually truncated, not just survived."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(29)], "doc_a int, doc_b int"
    )
    labels = connected_components(edges, max_iter=20)
    rows = labels.collect()
    assert len(rows) == 30
    assert {r.component for r in rows} == {0}
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    # an un-checkpointed 15-round plan is hundreds of KB; checkpointed it
    # bottoms out at the last <=3 rounds over a scan of the checkpoint RDD
    assert len(plan) < 50_000, f"lineage not truncated: plan is {len(plan)} chars"


def test_empty_edges_triangle_contract(spark):
    """Degenerate-input contract: empty edge set -> 0 triangles, 0 wedges
    (not NULL)."""
    from mobilitydatalakebenchmark_spark.operators.graph import triangle_count

    empty = spark.createDataFrame([], "a int, b int")
    row = triangle_count(empty).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 0


class TestKCore:
    """k_core convergence mode vs a literal Python peel."""

    @staticmethod
    def _py_kcore(edges, k):
        import collections

        adj = collections.defaultdict(set)
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        nodes = set(adj)
        while True:
            drop = {n for n in nodes if sum(1 for m in adj[n] if m in nodes) < k}
            if not drop:
                break
            nodes -= drop
        return {
            n: sum(1 for m in adj[n] if m in nodes) for n in nodes
        }

    def _check(self, spark, edges, k):
        from mobilitydatalakebenchmark_spark.operators.graph import k_core

        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: r["core_degree"] for r in k_core(df, k).collect()
        }
        assert got == self._py_kcore(edges, k)

    def test_clique_plus_tail_peels_tail(self, spark):
        # K5 survives k=4; a pendant chain hanging off it is peeled away
        clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
        tail = [("c0", "t1"), ("t1", "t2"), ("t2", "t3")]
        self._check(spark, clique + tail, 4)

    def test_cascading_peel(self, spark):
        # two triangles joined by a bridge: k=2 keeps both triangles,
        # bridge endpoints keep degree >= 2 via their triangles
        tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
        tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
        bridge = [("a", "x")]
        self._check(spark, tri1 + tri2 + bridge, 2)
        # k=3: everything dies (no node has 3 neighbors after the peel)
        self._check(spark, tri1 + tri2 + bridge, 3)

    def test_random_graph_matches_python(self, spark):
        import random

        rng = random.Random(5)
        edges = list(
            {
                (f"n{rng.randint(0, 60)}", f"n{rng.randint(0, 60)}")
                for _ in range(260)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        for k in (2, 3, 4):
            self._check(spark, edges, k)

    def test_truncated_rounds_monotone(self, spark):
        """More peel rounds never grow the arc set; truncation at the
        convergence round equals convergence."""
        from mobilitydatalakebenchmark_spark.operators.graph import k_core

        import random

        rng = random.Random(9)
        edges = list(
            {
                (f"n{rng.randint(0, 40)}", f"n{rng.randint(0, 40)}")
                for _ in range(140)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src string, dst string")
        sizes = [
            k_core(df, 3, max_rounds=r).count() for r in (1, 2, 4, 8)
        ]
        assert sizes == sorted(sizes, reverse=True)
        conv = sorted(map(tuple, k_core(df, 3).collect()))
        assert sorted(map(tuple, k_core(df, 3, max_rounds=8).collect())) == conv


class TestLabelPropagation:
    """label_propagation vs a literal synchronous Python LPA."""

    @staticmethod
    def _py_lpa(edges, rounds):
        import collections

        adj = collections.defaultdict(set)
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        labels = {n: n for n in adj}
        for _ in range(rounds):
            nxt = {}
            for n in adj:
                counts = collections.Counter(labels[m] for m in adj[n])
                nxt[n] = min(counts, key=lambda l: (-counts[l], l))
            labels = nxt
        return labels

    def _check(self, spark, edges, rounds):
        from mobilitydatalakebenchmark_spark.operators.graph import label_propagation

        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == self._py_lpa(edges, rounds)

    def test_two_cliques_with_bridge(self, spark):
        c1 = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
        c2 = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
        for rounds in (1, 2, 3):
            self._check(spark, c1 + c2 + [("a0", "b0")], rounds)
        # after 3 rounds the two cliques carry distinct labels
        from mobilitydatalakebenchmark_spark.operators.graph import label_propagation

        df = spark.createDataFrame(
            c1 + c2 + [("a0", "b0")], "src string, dst string"
        )
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, rounds=3).collect()
        }
        assert len({got[f"a{i}"] for i in range(4)}) == 1
        assert len({got[f"b{i}"] for i in range(4)}) == 1
        assert got["a1"] != got["b1"]

    def test_random_graph_matches_python(self, spark):
        import random

        rng = random.Random(17)
        edges = list(
            {
                (f"n{rng.randint(0, 50)}", f"n{rng.randint(0, 50)}")
                for _ in range(180)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        for rounds in (1, 3):
            self._check(spark, edges, rounds)


def test_kcore_idempotent(spark):
    """k_core(k_core(G)) == k_core(G): the peel is a closure operator."""
    import random

    from mobilitydatalakebenchmark_spark.operators.graph import k_core

    rng = random.Random(83)
    edges = list(
        {
            (f"n{rng.randint(0, 40)}", f"n{rng.randint(0, 40)}")
            for _ in range(150)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    once = k_core(df, 3)
    core_nodes = {r["node"] for r in once.collect()}
    surviving = [
        (a, b) for a, b in edges if a in core_nodes and b in core_nodes
    ]
    if not surviving:
        return
    twice = k_core(
        spark.createDataFrame(surviving, "src string, dst string"), 3
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_kcore_gate_truncation_is_not_vacuous(spark):
    """The gate's 4-round truncated peel must genuinely differ from
    convergence on the gate's own graph at sf0.001 (peel depth there is
    5 rounds at k=6) — proving the bounded-round semantics is a real
    pin, not an accidentally-converged one."""
    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.operators.graph import k_core

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    edges = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    truncated = k_core(edges, k=6, max_rounds=4).count()
    converged = k_core(edges, k=6).count()
    assert truncated > converged > 0
