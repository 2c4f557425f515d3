"""Mobility-metric operator tests: entropy on known distributions, radius
of gyration on planted geometry, frequent-location ranking."""

from __future__ import annotations

import math

import pytest

from mobilitydatalakebenchmark_spark.operators import mobility_metrics as mm


def _fixes(spark, rows):
    return spark.createDataFrame(rows, "uuid long, lat double, lon double")


class TestEntropy:
    def test_single_cell_is_zero(self, spark):
        df = _fixes(spark, [(1, 0.1, 0.1), (1, 0.2, 0.2), (1, 0.3, 0.3)])
        v = mm.cell_visits(df, 1.0, 1.0)
        out = mm.location_entropy(v).collect()[0]
        assert out["entropy_nats"] == 0.0 and out["n_obs"] == 3

    def test_uniform_over_k_cells_is_ln_k(self, spark):
        rows = [(1, c + 0.5, 0.5) for c in range(4) for _ in range(5)]
        df = _fixes(spark, rows)
        out = mm.location_entropy(mm.cell_visits(df, 1.0, 1.0)).collect()[0]
        assert out["entropy_nats"] == pytest.approx(round(math.log(4), 4))

    def test_skewed_distribution_matches_definition(self, spark):
        # 3 visits in one cell, 1 in another: H = -(3/4 ln 3/4 + 1/4 ln 1/4)
        rows = [(1, 0.5, 0.5)] * 3 + [(1, 1.5, 0.5)]
        df = _fixes(spark, rows)
        out = mm.location_entropy(mm.cell_visits(df, 1.0, 1.0)).collect()[0]
        want = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert out["entropy_nats"] == pytest.approx(round(want, 4))


class TestRadiusOfGyration:
    def test_stationary_entity_is_zero(self, spark):
        df = _fixes(spark, [(1, 10.0, 20.0)] * 4)
        out = mm.radius_of_gyration(df).collect()[0]
        assert out["rg_m"] == 0.0

    def test_symmetric_two_point_commuter(self, spark):
        # equator, +/- 0.5 deg lon around centroid: every fix is ~55597 m out
        df = _fixes(spark, [(1, 0.0, 0.0), (1, 0.0, 1.0)] * 3)
        out = mm.radius_of_gyration(df).collect()[0]
        assert out["rg_m"] == pytest.approx(111195 / 2, rel=1e-3)

    def test_entities_independent(self, spark):
        df = _fixes(spark, [(1, 0.0, 0.0), (1, 0.0, 1.0), (2, 5.0, 5.0)])
        out = {r["uuid"]: r["rg_m"] for r in mm.radius_of_gyration(df).collect()}
        assert out[2] == 0.0 and out[1] > 50000


class TestFrequentLocations:
    def test_rank_by_visits_then_cell(self, spark):
        rows = (
            [(1, 0.5, 0.5)] * 3      # home cell (0,0)
            + [(1, 1.5, 1.5)] * 2    # work cell (1,1)
            + [(1, 2.5, 2.5)]        # rare cell
        )
        v = mm.cell_visits(_fixes(spark, rows), 1.0, 1.0)
        out = {r["rk"]: (r["cx"], r["cy"], r["n_visits"])
               for r in mm.frequent_locations(v, k=2).collect()}
        assert out == {1: (0, 0, 3), 2: (1, 1, 2)}

    def test_tie_breaks_deterministically(self, spark):
        rows = [(1, 0.5, 0.5), (1, 1.5, 1.5)]
        v = mm.cell_visits(_fixes(spark, rows), 1.0, 1.0)
        out = mm.frequent_locations(v, k=1).collect()
        assert len(out) == 1 and (out[0]["cx"], out[0]["cy"]) == (0, 0)


class TestKAnonymity:
    def test_sparse_cell_is_suppressed(self, spark):
        rows = (
            [(u, 0.5, 0.5) for u in range(5)]   # cell (0,0): 5 users -> kept
            + [(1, 1.5, 1.5), (1, 1.5, 1.6)]    # cell (1,1): 1 user -> suppressed
        )
        out = {
            (r["cx"], r["cy"]): (r["n_entities"], r["n_obs"], r["suppressed"])
            for r in mm.k_anonymous_cells(_fixes(spark, rows), k=5).collect()
        }
        assert out == {(0, 0): (5, 5, False), (1, 1): (1, 2, True)}

    def test_repeat_visits_do_not_fake_anonymity(self, spark):
        # one user visiting 10 times is still 1 distinct entity
        rows = [(7, 0.5, 0.5)] * 10
        out = mm.k_anonymous_cells(_fixes(spark, rows), k=2).collect()[0]
        assert out["n_entities"] == 1 and out["n_obs"] == 10 and out["suppressed"]


class TestCellPyramid:
    def test_levels_match_direct_bucketing_and_conserve_mass(self, spark):
        import random

        rng = random.Random(31)
        rows = [(0, rng.uniform(0, 40), rng.uniform(0, 40)) for _ in range(200)]
        df = _fixes(spark, rows)
        visits = mm.cell_visits(df, 2.5, 2.5).drop("uuid")
        pyr = mm.cell_pyramid(visits, n_levels=3).collect()
        by_level = {}
        for r in pyr:
            by_level.setdefault(r["level"], {})[(r["cx"], r["cy"])] = r["n_obs"]
        # mass conservation at every level
        assert all(sum(d.values()) == 200 for d in by_level.values())
        # level 2 (cell size 10) equals direct bucketing of the raw points
        import math

        direct = {}
        for _, lat, lon in rows:
            key = (math.floor(lat / 10.0), math.floor(lon / 10.0))
            direct[key] = direct.get(key, 0) + 1
        assert by_level[2] == direct


class TestHotspotClusters:
    """Grid-density hotspots: planted dense regions must merge across
    the 8-neighborhood and stay separated across gaps."""

    def test_planted_clusters_merge_and_separate(self, spark):
        from mobilitydatalakebenchmark_spark.operators.mobility_metrics import (
            hotspot_clusters,
        )

        rows = []
        # cluster 1: two diagonal-adjacent dense cells (0,0) and (1,1)
        rows += [(0.5, 0.5)] * 10 + [(1.5, 1.5)] * 10
        # cluster 2: isolated dense cell far away
        rows += [(10.5, 10.5)] * 10
        # sparse noise below the threshold
        rows += [(5.5, 5.5)] * 2
        df = spark.createDataFrame(rows, "lat double, lon double")
        out = hotspot_clusters(
            df, cell_lat_deg=1.0, cell_lon_deg=1.0, min_pts=5
        ).collect()
        cells = {(r.cx, r.cy): r for r in out}
        assert set(cells) == {(0, 0), (1, 1), (10, 10)}
        assert cells[(0, 0)].cluster == cells[(1, 1)].cluster
        assert cells[(10, 10)].cluster != cells[(0, 0)].cluster
        assert cells[(10, 10)].n_points == 10

    def test_chain_of_cells_is_one_cluster(self, spark):
        from mobilitydatalakebenchmark_spark.operators.mobility_metrics import (
            hotspot_clusters,
        )

        rows = [
            (x + 0.5, 0.5) for x in range(8) for _ in range(6)
        ]  # 8-cell horizontal chain
        df = spark.createDataFrame(rows, "lat double, lon double")
        out = hotspot_clusters(
            df, cell_lat_deg=1.0, cell_lon_deg=1.0, min_pts=5
        ).collect()
        assert len(out) == 8
        assert len({r.cluster for r in out}) == 1
