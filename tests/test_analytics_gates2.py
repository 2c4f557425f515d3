"""Round-9 session depth gates, batch 2: Theil-Sen slope, sign-bit
Hamming top-k, resource-allocation link prediction, leave-one-out target
encoding — each pinned against a brute-force pure-Python reference on
constructed tables."""

from __future__ import annotations

import datetime
import statistics

from mobilitydatalakebenchmark_spark.plans import load_registry


class TestTheilSen:
    def _run(self, spark, tmp_path, series):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i + 1, base + datetime.timedelta(hours=h), 1, float(v))
            for i, (h, v) in enumerate(series)
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
        q = load_registry()["theil_sen_slope"].spark
        return q(spark, str(tmp_path / "sf")).collect()[0]

    @staticmethod
    def _brute(series):
        slopes = [
            (y2 - y1) / (h2 - h1)
            for i, (h1, y1) in enumerate(series)
            for (h2, y2) in series[i + 1 :]
            if h2 != h1
        ]
        return statistics.median(slopes), len(slopes)

    def test_matches_bruteforce(self, spark, tmp_path):
        series = [(0, 1.0), (1, 3.0), (2, 5.5), (3, 6.5), (4, 9.0)]
        got = self._run(spark, tmp_path, series)
        want, n = self._brute(series)
        assert got.n_pairs == n
        assert abs(float(got.slope_per_hour) - want) < 1e-6

    def test_robust_to_outlier(self, spark, tmp_path):
        # perfect slope 2/hour with one wild spike: Theil-Sen stays 2
        series = [(h, 2.0 * h) for h in range(9)]
        series[4] = (4, 500.0)
        got = self._run(spark, tmp_path, series)
        want, _ = self._brute(series)
        assert abs(float(got.slope_per_hour) - want) < 1e-6
        assert abs(want - 2.0) < 0.01  # the estimator really is robust

    def test_equal_timestamps_excluded(self, spark, tmp_path):
        # two points share hour 1: only pairs with distinct x count
        series = [(0, 0.0), (1, 1.0), (1, 9.0), (2, 2.0)]
        got = self._run(spark, tmp_path, series)
        # pairs: (0,1) (0,1') (0,2) (1,2) (1',2) = 5
        assert got.n_pairs == 5


class TestVecHammingTopk:
    def test_packing_and_distance_by_hand(self, spark, tmp_path):
        # 64-dim sign patterns built from a known bitmask
        import random

        rng = random.Random(7)
        vecs = []
        for vid in range(20):
            bits = [rng.random() < 0.5 for _ in range(64)]
            vec = [1.0 if b else -1.0 for b in bits]
            vecs.append((vid, vec, bits))
        spark.createDataFrame(
            [(v[0], v[1], 0) for v in vecs],
            "vec_id long, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/embeddings.parquet")
        q = load_registry()["vec_hamming_topk"].spark
        got = q(spark, str(tmp_path / "sf")).collect()
        by_query = {}
        for r in got:
            by_query.setdefault(r.query_id, []).append(r)
        assert set(by_query) == {0, 1, 2, 3, 4}
        for qid, rows in by_query.items():
            qbits = vecs[qid][2]
            want = sorted(
                (
                    (sum(a != b for a, b in zip(qbits, v[2])), v[0])
                    for v in vecs
                    if v[0] != qid
                ),
            )[:10]
            assert [(r.hamming, r.vec_id) for r in rows] == want
            assert [r.rnk for r in rows] == list(range(1, 11))

    def test_zero_vector_dims_count_as_negative(self, spark, tmp_path):
        # the sign test is strictly > 0: a zero dim packs as bit 0
        rows = [
            (0, [0.0] * 64, 0),
            (1, [1.0] * 64, 0),
            (2, [-1.0] * 64, 0),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/embeddings.parquet")
        q = load_registry()["vec_hamming_topk"].spark
        got = {
            (r.query_id, r.vec_id): r.hamming
            for r in q(spark, str(tmp_path / "sf")).collect()
        }
        assert got[(0, 1)] == 64  # all-zero vs all-positive differs everywhere
        assert got[(0, 2)] == 0  # all-zero packs like all-negative


class TestLinkPredictionRA:
    def test_textbook_scores(self, spark, tmp_path):
        # baskets: o1={1,2}, o2={1,2,3}, o3={1,2}, o4={3,4}
        baskets = {1: [1, 2], 2: [1, 2, 3], 3: [1, 2], 4: [3, 4]}
        rows = []
        k = 0
        for oid, items in baskets.items():
            for it in items:
                k += 1
                rows.append((oid, it, 1.0, 10.0, 0.0))
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_quantity double,"
            " l_extendedprice double, l_discount double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        q = load_registry()["graph_link_prediction_ra"].spark
        got = {
            (r.item_a, r.item_b): r
            for r in q(spark, str(tmp_path / "sf")).collect()
        }
        # only (1,2) co-occurs >= 2 times: in o1 (size 2), o2 (size 3),
        # o3 (size 2) -> ra = 1/2 + 1/3 + 1/2 scaled by 720720
        assert set(got) == {(1, 2)}
        r = got[(1, 2)]
        assert r.n_common == 3
        assert r.ra_scaled == 720720 // 2 + 720720 // 3 + 720720 // 2
        assert abs(float(r.ra_score) - (0.5 + 1 / 3 + 0.5)) < 1e-5

    def test_duplicate_lineitems_collapse(self, spark, tmp_path):
        # the same part twice in one order is ONE basket membership
        rows = [
            (1, 1, 1.0, 10.0, 0.0),
            (1, 1, 2.0, 20.0, 0.0),
            (1, 2, 1.0, 10.0, 0.0),
            (2, 1, 1.0, 10.0, 0.0),
            (2, 2, 1.0, 10.0, 0.0),
        ]
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_quantity double,"
            " l_extendedprice double, l_discount double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        q = load_registry()["graph_link_prediction_ra"].spark
        got = q(spark, str(tmp_path / "sf")).collect()
        assert len(got) == 1
        assert got[0].n_common == 2
        assert got[0].ra_scaled == 2 * (720720 // 2)


class TestTargetEncodingLoo:
    def test_loo_by_hand(self, spark, tmp_path):
        # brand X: quantities 1, 2, 3; brand Y: single row (excluded)
        li = [
            (1, 10, 1.0, 10.0, 0.0),
            (2, 11, 2.0, 10.0, 0.0),
            (3, 12, 3.0, 10.0, 0.0),
            (4, 20, 9.0, 10.0, 0.0),
        ]
        part = [(10, "X"), (11, "X"), (12, "X"), (20, "Y")]
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_quantity double,"
            " l_extendedprice double, l_discount double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        spark.createDataFrame(
            part, "p_partkey long, p_brand string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/part.parquet")
        q = load_registry()["target_encoding_loo"].spark
        got = {r.brand: r for r in q(spark, str(tmp_path / "sf")).collect()}
        # brand Y has n=1: the encoder is undefined, brand excluded
        assert set(got) == {"X"}
        r = got["X"]
        # cents targets 100/200/300: loo encodings (500/2, 400/2, 300/2)
        assert r.n_rows == 3
        assert float(r.min_enc) == 150.0
        assert float(r.max_enc) == 250.0
        assert r.min_target_cents == 100 and r.max_target_cents == 300
