"""Degenerate-input (empty-table) contracts, pinned at unit level.

The full sweep lives in tools/degenerate_sweep.py (zero-row twin of
every test table + the complete oracle harness; artifact
DEGENERATE_r11.json). These tests pin the REPRESENTATIVE fixes fast
enough for the regular suite: the self-describing stores must read back
empty writes, the ANN seed path must return schema-correct empties, the
graph seeds must not int(None), and a sample of each fixed gate class
must run against an empty twin and produce the convention the oracle
pins (NULL ratios, 0-row rollups, TRUE/0 fixed frames).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.plans import load_registry


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.degenerate_sweep import build_empty_dir

    out = str(tmp_path_factory.mktemp("degenerate") / "sf")
    build_empty_dir("/root/testdata/sf0.001", out)
    return out


def _gate(name):
    return load_registry()[name].spark


class TestEmptyStores:
    def test_versioned_store_empty_commit_reads_back(self, spark, tmp_path):
        from mobilitydatalakebenchmark_spark.operators.versioned_store import (
            VersionedParquetStore,
        )

        store = VersionedParquetStore(str(tmp_path / "vs"))
        df = spark.createDataFrame([], "k long, v string, day long")
        v0 = store.commit(df, partition_by=("day",))
        snap = store.snapshot(spark, v0)
        assert snap.count() == 0
        assert set(snap.columns) == {"k", "v", "day"}
        # a later non-empty commit unions with the empty dir fine
        v1 = store.commit(
            spark.createDataFrame([(1, "a", 5)], "k long, v string, day long"),
            partition_by=("day",),
        )
        assert store.snapshot(spark, v1).count() == 1

    def test_ivf_index_store_empty_build(self, spark, tmp_path):
        from mobilitydatalakebenchmark_spark.operators.ann_index import (
            IVFIndexStore,
        )

        store = IVFIndexStore(str(tmp_path / "ivf"), n_centroids=4)
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        store.build(empty, lloyd_iters=1)
        assert store.meta(spark)["n_vectors"] == 0
        probes = spark.createDataFrame(
            [(0, [1.0, 0.0])], "probe_id long, probe_vec array<double>"
        )
        assert store.topk(probes, k=3).count() == 0
        assert store.indexed_ids(spark).count() == 0

    def test_materialized_join_empty_build(self, spark, tmp_path):
        from mobilitydatalakebenchmark_spark.operators.ivm import (
            MaterializedJoin,
        )

        mj = MaterializedJoin(str(tmp_path / "mj"), on="k")
        left = spark.createDataFrame([], "k long, a string")
        right = spark.createDataFrame([], "k long, b string")
        mj.build(left, right)
        assert mj.view(spark).count() == 0
        assert set(mj.view(spark).columns) == {"k", "a", "b"}


class TestEmptyOperators:
    def test_ivf_index_empty_corpus(self, spark):
        from mobilitydatalakebenchmark_spark.operators.similarity import (
            ivf_index,
        )

        corpus = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        indexed, cents = ivf_index(corpus, n_centroids=4)
        assert indexed.count() == 0 and len(cents) == 0

    def test_assign_nearest_centroid_numpy_no_centroids(self, spark):
        from mobilitydatalakebenchmark_spark.operators.similarity import (
            assign_nearest_centroid_numpy,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        cents = spark.createDataFrame(
            [], "c_label long, centroid array<double>"
        )
        out = assign_nearest_centroid_numpy(df, cents)
        assert out.count() == 0
        assert out.columns == ["vec_id", "sim", "assigned_label"]


class TestEmptyGateConventions:
    """One gate per fixed class against a real empty twin."""

    def test_divide_by_zero_pins_null(self, spark, empty_sf):
        row = _gate("bloom_filter_fpr")(spark, empty_sf).first()
        assert row.n_probes == 0 and row.observed_fpr is None

    def test_rollup_emits_no_grand_total(self, spark, empty_sf):
        assert _gate("agg_rollup_status")(spark, empty_sf).count() == 0
        assert _gate("grouping_sets_cube")(spark, empty_sf).count() == 0

    def test_dq_suite_zero_checked_passes(self, spark, empty_sf):
        rows = _gate("dq_check_suite")(spark, empty_sf).collect()
        assert len(rows) == 6
        assert all(r.n_violations == 0 and bool(r.passed) for r in rows)

    def test_graph_seeds_guarded(self, spark, empty_sf):
        assert _gate("graph_bfs_hops")(spark, empty_sf).count() == 0
        assert _gate("graph_bellman_ford")(spark, empty_sf).count() == 0

    def test_partitioned_write_prune_empty_roundtrip(self, spark, empty_sf):
        assert _gate("partitioned_write_prune")(spark, empty_sf).count() == 0


@pytest.fixture(scope="module")
def single_sf(tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.degenerate_sweep import build_empty_dir

    out = str(tmp_path_factory.mktemp("singleton") / "sf")
    build_empty_dir("/root/testdata/sf0.001", out, rows=1)
    return out


class TestSingletonConventions:
    """One gate per SINGLE-SAMPLE fix class (the 1-row twin sweep,
    DEGENERATE_1ROW_r11.json): statistics undefined for n=1 pin NULL on
    both engines; measured-floor probe frames vanish when no non-self
    neighbor can exist; data-derived claims replace literals."""

    def test_spearman_single_point_is_null(self, spark, single_sf):
        row = _gate("spearman_revenue_quantity")(spark, single_sf).first()
        assert row.n == 1 and row.spearman_rho is None

    def test_hist_single_value_all_in_bin0(self, spark, single_sf):
        rows = _gate("hist_equiwidth_price")(spark, single_sf).collect()
        assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n == 1

    def test_ks_one_sided_is_null(self, spark, single_sf):
        row = _gate("drift_ks_value_shift")(spark, single_sf).first()
        assert row.n1 * row.n2 == 0 and row.d is None

    def test_knn_probe_frame_empty_without_neighbors(self, spark, single_sf):
        assert _gate("knn_recall_floor")(spark, single_sf).count() == 0

    def test_chi2_zero_expected_cell_contributes_zero(self, spark, single_sf):
        rows = _gate("drift_chi2_event_mix")(spark, single_sf).collect()
        assert len(rows) == 1
        assert float(rows[0].cell_chi2) == 0.0
