"""Trajectory operator tests: haversine correctness against known
distances, trip segmentation at gaps, stop detection on planted dwell."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators import trajectory


def _track(spark, rows):
    return spark.createDataFrame(
        rows, "uuid string, ts timestamp, coordinates_0 double, coordinates_1 double"
    )


T0 = dt.datetime(2024, 3, 21, 13, 0, 0)


def at(s):
    return T0 + dt.timedelta(seconds=s)


class TestHaversine:
    def test_known_distance_one_degree_longitude_at_equator(self, spark):
        # 1 degree of longitude at the equator ~ 111.19 km
        df = _track(spark, [("v", at(0), 0.0, 0.0), ("v", at(60), 1.0, 0.0)])
        out = trajectory.step_metrics(df).filter(F.col("step_m").isNotNull()).first()
        assert out["step_m"] == pytest.approx(111195, rel=1e-3)
        assert out["dt_s"] == 60
        assert out["speed_mps"] == pytest.approx(111195 / 60, rel=1e-3)

    def test_zero_distance_and_first_fix_null(self, spark):
        df = _track(spark, [("v", at(0), 4.35, 50.85), ("v", at(20), 4.35, 50.85)])
        rows = trajectory.step_metrics(df).orderBy("ts").collect()
        assert rows[0]["step_m"] is None and rows[0]["dt_s"] is None
        assert rows[1]["step_m"] == 0.0 and rows[1]["speed_mps"] == 0.0

    def test_vehicles_do_not_interleave(self, spark):
        df = _track(
            spark,
            [("a", at(0), 0.0, 0.0), ("b", at(10), 50.0, 50.0), ("a", at(20), 0.001, 0.0)],
        )
        rows = {
            (r["uuid"], r["ts"]): r["step_m"]
            for r in trajectory.step_metrics(df).collect()
        }
        # b's only fix has no predecessor; a's second step is tiny, not 50 deg
        assert rows[("b", at(10))] is None
        assert rows[("a", at(20))] < 200


class TestTrips:
    def test_gap_splits_trips_and_distance_excludes_gap(self, spark):
        rows = [
            ("v", at(0), 4.0, 50.0),
            ("v", at(20), 4.001, 50.0),
            ("v", at(40), 4.002, 50.0),
            # 1h gap -> new trip
            ("v", at(4000), 9.0, 45.0),
            ("v", at(4020), 9.001, 45.0),
        ]
        trips = trajectory.trip_segments(_track(spark, rows), gap_s=300).orderBy(
            "trip_id"
        ).collect()
        assert len(trips) == 2
        assert trips[0]["n_fixes"] == 3 and trips[1]["n_fixes"] == 2
        # neither trip's distance includes the ~600 km inter-trip jump
        assert trips[0]["total_m"] < 1000 and trips[1]["total_m"] < 1000
        assert trips[0]["trip_start"] == at(0) and trips[0]["trip_end"] == at(40)

    def test_single_fix_vehicle_is_one_empty_trip(self, spark):
        trips = trajectory.trip_segments(
            _track(spark, [("v", at(0), 4.0, 50.0)])
        ).collect()
        assert len(trips) == 1
        assert trips[0]["n_fixes"] == 1 and trips[0]["total_m"] == 0.0


class TestStops:
    def test_planted_dwell_is_detected(self, spark):
        rows = [("v", at(0), 4.0, 50.0)]
        # moving fast: 0.01 deg (~1.1km) per 20s
        for i in range(1, 4):
            rows.append(("v", at(i * 20), 4.0 + 0.01 * i, 50.0))
        # dwell: stationary 13:01:00..13:03:00
        for i in range(4, 11):
            rows.append(("v", at(i * 20), 4.03, 50.0))
        # moving again
        for i in range(11, 14):
            rows.append(("v", at(i * 20), 4.03 + 0.01 * (i - 10), 50.0))
        stops = trajectory.detect_stops(
            _track(spark, rows), speed_thresh_mps=0.5, min_duration_s=60
        ).collect()
        assert len(stops) == 1
        s = stops[0]
        # arrival fix at t=60 is the last moving one; slow fixes run 80..200
        assert s["stop_start"] == at(80) and s["stop_end"] == at(200)
        assert s["stop_lon"] == pytest.approx(4.03)
        assert s["n_fixes"] == 7

    def test_brief_pause_below_min_duration_is_ignored(self, spark):
        rows = [
            ("v", at(0), 4.0, 50.0),
            ("v", at(20), 4.01, 50.0),
            ("v", at(40), 4.01, 50.0),  # one slow fix (20s pause)
            ("v", at(60), 4.02, 50.0),
        ]
        stops = trajectory.detect_stops(
            _track(spark, rows), speed_thresh_mps=0.5, min_duration_s=60
        ).collect()
        assert stops == []


class TestResample:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "uuid string, ts timestamp, value double")

    def test_linear_ramp_is_exact(self, spark):
        from mobilitydatalakebenchmark_spark.operators.resample import resample_linear

        df = self._df(
            spark,
            [("v", at(0), 0.0), ("v", at(100), 100.0), ("v", at(130), 40.0)],
        )
        out = [
            (r["grid_ts"], round(r["value_interp"], 6))
            for r in resample_linear(df, step_s=30).orderBy("grid_ts").collect()
        ]
        assert out == [
            (at(0), 0.0),       # coincides with an observation
            (at(30), 30.0),     # on the 0->100 ramp
            (at(60), 60.0),
            (at(90), 90.0),
            (at(120), 60.0),    # 2/3 along the 100->40 segment
        ]

    def test_grid_is_phase_aligned_not_anchored_to_first_obs(self, spark):
        from mobilitydatalakebenchmark_spark.operators.resample import resample_linear

        # first observation at t=13s -> first grid point is t=30, not t=13
        df = self._df(spark, [("v", at(13), 1.0), ("v", at(73), 7.0)])
        out = resample_linear(df, step_s=30).orderBy("grid_ts").collect()
        assert [r["grid_ts"] for r in out] == [at(30), at(60)]

    def test_entities_resample_independently(self, spark):
        from mobilitydatalakebenchmark_spark.operators.resample import resample_linear

        df = self._df(
            spark,
            [("a", at(0), 0.0), ("a", at(60), 60.0), ("b", at(0), 5.0), ("b", at(30), 5.0)],
        )
        out = resample_linear(df, step_s=30).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r["uuid"], []).append(r["value_interp"])
        assert sorted(by_id["a"]) == [0.0, 30.0, 60.0]
        assert by_id["b"] == [5.0, 5.0]

    def test_single_observation_clamps(self, spark):
        from mobilitydatalakebenchmark_spark.operators.resample import resample_linear

        df = self._df(spark, [("v", at(30), 9.0)])
        out = resample_linear(df, step_s=30).collect()
        assert len(out) == 1 and out[0]["value_interp"] == 9.0


class TestSimplify:
    def test_collinear_points_are_dropped_endpoints_kept(self, spark):
        rows = [("v", at(i * 20), 4.0 + 0.001 * i, 50.0) for i in range(10)]
        out = trajectory.simplify_tracks(_track(spark, rows), tolerance_deg=1e-5)
        kept = sorted(r["ts"] for r in out.collect())
        assert kept == [at(0), at(180)]  # straight line -> 2 endpoints

    def test_corner_survives(self, spark):
        # L-shaped track: the corner point deviates far beyond tolerance
        rows = (
            [("v", at(i * 20), 4.0 + 0.01 * i, 50.0) for i in range(5)]
            + [("v", at((5 + i) * 20), 4.04, 50.0 + 0.01 * (i + 1)) for i in range(5)]
        )
        out = trajectory.simplify_tracks(_track(spark, rows), tolerance_deg=1e-4)
        kept = sorted(r["ts"] for r in out.collect())
        assert at(0) in kept and at(9 * 20) in kept
        assert at(4 * 20) in kept  # the corner
        assert len(kept) == 3

    def test_zigzag_above_tolerance_keeps_everything(self, spark):
        rows = [
            ("v", at(i * 20), 4.0 + 0.01 * i, 50.0 + (0.02 if i % 2 else 0.0))
            for i in range(6)
        ]
        out = trajectory.simplify_tracks(_track(spark, rows), tolerance_deg=1e-4)
        assert out.count() == 6

    def test_tracks_are_independent_and_short_tracks_pass_through(self, spark):
        rows = [("a", at(0), 4.0, 50.0), ("a", at(20), 5.0, 50.0), ("b", at(0), 9.0, 9.0)]
        out = trajectory.simplify_tracks(_track(spark, rows))
        assert out.count() == 3


class TestProximityPairs:
    def test_matches_brute_force(self, spark):
        import itertools
        import math
        import random

        rng = random.Random(11)
        pts = [
            (i, rng.uniform(0.0, 2.0), rng.uniform(0.0, 4.0)) for i in range(80)
        ]
        df = spark.createDataFrame(pts, "uuid long, lat double, lon double")
        radius = 30000.0
        got = {
            (r["id_a"], r["id_b"])
            for r in trajectory.proximity_pairs(df, radius).collect()
        }

        def hav(a, b):
            dlat = math.radians(b[1] - a[1])
            dlon = math.radians(b[2] - a[2])
            x = (
                math.sin(dlat / 2) ** 2
                + math.cos(math.radians(a[1]))
                * math.cos(math.radians(b[1]))
                * math.sin(dlon / 2) ** 2
            )
            return 2 * 6371008.8 * math.asin(math.sqrt(x))

        want = {
            (a[0], b[0])
            for a, b in itertools.combinations(pts, 2)
            if round(hav(a, b), 2) <= radius
        }
        assert got == want and len(want) > 0

    def test_each_pair_emitted_once(self, spark):
        # two points in the same cell and two straddling a cell boundary
        df = spark.createDataFrame(
            [(1, 0.01, 0.01), (2, 0.02, 0.02), (3, 0.497, 0.01), (4, 0.498, 0.01)],
            "uuid long, lat double, lon double",
        )
        out = trajectory.proximity_pairs(df, 50000.0).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in out]
        assert len(pairs) == len(set(pairs))
        # 1-2 share a cell; 3-4 straddle the lat-cell boundary (found via
        # neighbor expansion); 1/2 vs 3/4 are ~54 km apart — outside radius
        assert set(pairs) == {(1, 2), (3, 4)}


class TestCoLocation:
    def test_matches_brute_force(self, spark):
        import itertools
        import math
        import random

        rng = random.Random(23)
        base = dt.datetime(2024, 5, 1, 12, 0, 0)
        rows = [
            (
                i % 12,
                base + dt.timedelta(seconds=rng.randint(0, 7200)),
                rng.uniform(0.0, 1.2),
                rng.uniform(0.0, 2.5),
            )
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "uuid long, ts timestamp, lat double, lon double")
        radius, window = 40000.0, 1800
        got = {
            (r["id_a"], r["id_b"]): (r["n_contacts"], r["min_dist_m"])
            for r in trajectory.co_location_pairs(df, radius, window).collect()
        }

        def hav(a, b):
            dlat = math.radians(b[2] - a[2])
            dlon = math.radians(b[3] - a[3])
            x = (
                math.sin(dlat / 2) ** 2
                + math.cos(math.radians(a[2]))
                * math.cos(math.radians(b[2]))
                * math.sin(dlon / 2) ** 2
            )
            return round(2 * 6371008.8 * math.asin(math.sqrt(x)), 2)

        want: dict = {}
        for a, b in itertools.combinations(rows, 2):
            if a[0] == b[0]:
                continue
            lo, hi = (a, b) if a[0] < b[0] else (b, a)
            d = hav(lo, hi)
            if d <= radius and abs((lo[1] - hi[1]).total_seconds()) <= window:
                n, m = want.get((lo[0], hi[0]), (0, float("inf")))
                want[(lo[0], hi[0])] = (n + 1, min(m, d))
        assert got == want and len(want) > 0


class TestODMatrix:
    def test_trip_endpoints_and_counts(self, spark):
        rows = [
            # user 1, trip 1: cell (0,0) -> (1,1)
            (1, at(0), 0.5, 0.5),
            (1, at(60), 0.7, 0.9),
            (1, at(120), 1.5, 1.5),
            # gap > 300 s -> trip 2: (1,1) -> (0,0)
            (1, at(1000), 1.2, 1.8),
            (1, at(1060), 0.1, 0.4),
            # user 2, single-fix trip: (0,0) -> (0,0)
            (2, at(0), 0.2, 0.2),
        ]
        df = spark.createDataFrame(rows, "uuid long, ts timestamp, lat double, lon double")
        out = {
            (r["o_cx"], r["o_cy"], r["d_cx"], r["d_cy"]): r["n_trips"]
            for r in trajectory.od_matrix(
                df, gap_s=300, cell_lat_deg=1.0, cell_lon_deg=1.0
            ).collect()
        }
        assert out == {(0, 0, 1, 1): 1, (1, 1, 0, 0): 1, (0, 0, 0, 0): 1}

    def test_equal_timestamps_break_by_tiebreak_col(self, spark):
        rows = [
            (1, at(0), 7, 0.5, 0.5),
            (1, at(0), 3, 2.5, 2.5),  # same ts, lower event_id -> origin
            (1, at(60), 9, 1.5, 1.5),
        ]
        df = spark.createDataFrame(
            rows, "uuid long, ts timestamp, event_id long, lat double, lon double"
        )
        out = trajectory.od_matrix(
            df, gap_s=300, cell_lat_deg=1.0, cell_lon_deg=1.0,
            tiebreak_cols=("event_id",),
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["o_cx"], r["o_cy"], r["d_cx"], r["d_cy"]) == (2, 2, 1, 1)
