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
