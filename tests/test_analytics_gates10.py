"""Round-9 session depth gates, batch 10: brand modularity, MinHash
error audit, Spearman rho, Fano burstiness — hand-computed references
on constructed tables."""

from __future__ import annotations

import datetime
import hashlib

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_li_part(spark, tmp_path, baskets, brands):
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
    spark.createDataFrame(
        [(pk, b) for pk, b in brands.items()],
        "p_partkey long, p_brand string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/part.parquet")
    return str(tmp_path / "sf")


class TestBrandModularity:
    def test_cross_form_by_hand(self, spark, tmp_path):
        # edges: (1,2) within brand X; (1,3) across X/Y => m=2
        # deg: X: 1 appears in 2 edges + 2 once = 3; Y: 3 once = 1
        sf = _write_li_part(
            spark,
            tmp_path,
            {10: [1, 2], 11: [1, 3]},
            {1: "X", 2: "X", 3: "Y"},
        )
        got = {
            r.brand: r
            for r in load_registry()["graph_brand_modularity"]
            .spark(spark, sf)
            .collect()
        }
        m = 2
        assert got["X"].in_c == 1 and got["X"].deg_c == 3
        assert got["Y"].in_c == 0 and got["Y"].deg_c == 1
        assert got["X"].q_scaled == 4 * m * 1 - 9
        assert got["Y"].q_scaled == 0 - 1
        # contributions sum to Newman Q of the partition
        q = sum(float(r.q_contrib) for r in got.values())
        want = (1 / m - (3 / (2 * m)) ** 2) + (0 - (1 / (2 * m)) ** 2)
        assert abs(q - want) < 1e-6

    def test_all_one_brand_q_zero(self, spark, tmp_path):
        sf = _write_li_part(
            spark, tmp_path, {10: [1, 2], 11: [2, 3]}, {1: "X", 2: "X", 3: "X"}
        )
        got = load_registry()["graph_brand_modularity"].spark(
            spark, sf
        ).collect()
        # single community holding every edge: Q = 1 - 1 = 0
        assert sum(float(r.q_contrib) for r in got) == 0.0


class TestMinhashErrorAudit:
    def test_estimate_matches_hashlib_replay(self, spark, tmp_path):
        docs = [
            (0, "a b c d", "A", 7),
            (1, "a b c x", "A", 7),
            (2, "p q", "A", 3),
        ]
        spark.createDataFrame(
            docs, "doc_id long, text string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
        got = {
            r.doc_a: r
            for r in load_registry()["minhash_error_audit"]
            .spark(spark, str(tmp_path / "sf"))
            .collect()
        }

        def sig(tokens):
            return [
                min(
                    hashlib.md5(f"s{i}:{t}".encode()).hexdigest()
                    for t in tokens
                )
                for i in range(16)
            ]

        s0, s1 = sig({"a", "b", "c", "d"}), sig({"a", "b", "c", "x"})
        want_match = sum(x == y for x, y in zip(s0, s1))
        r = got[0]
        assert r.n_match == want_match
        assert r.n_common == 3 and r.n_union == 5
        assert abs(float(r.est_jaccard) - want_match / 16) < 1e-6
        assert abs(float(r.exact_jaccard) - 0.6) < 1e-6
        # disjoint pair: exact 0, estimate whatever the hashes say
        assert got[1].n_common == 0

    def test_identical_docs_zero_error(self, spark, tmp_path):
        docs = [(0, "x y z", "A", 5), (1, "x y z", "A", 5)]
        spark.createDataFrame(
            docs, "doc_id long, text string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
        r = load_registry()["minhash_error_audit"].spark(
            spark, str(tmp_path / "sf")
        ).collect()[0]
        assert r.n_match == 16
        assert float(r.est_jaccard) == 1.0 and float(r.exact_jaccard) == 1.0
        assert float(r.abs_err) == 0.0


class TestSpearman:
    def _run(self, spark, tmp_path, parts):
        # parts: (pk, price_dollars, qty)
        rows = [
            (i + 1, pk, float(q), float(p), 0.0)
            for i, (pk, p, q) in enumerate(parts)
        ]
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_quantity double,"
            " l_extendedprice double, l_discount double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        return load_registry()["spearman_revenue_quantity"].spark(
            spark, str(tmp_path / "sf")
        ).collect()[0]

    def test_perfect_agreement(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [(1, 10, 1), (2, 20, 2), (3, 30, 3)])
        assert got.sd2 == 0 and float(got.spearman_rho) == 1.0

    def test_perfect_inversion(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [(1, 10, 3), (2, 20, 2), (3, 30, 1)])
        assert float(got.spearman_rho) == -1.0

    def test_formula_by_hand(self, spark, tmp_path):
        got = self._run(
            spark, tmp_path, [(1, 10, 2), (2, 20, 1), (3, 30, 3)]
        )
        # rev ranks 1,2,3; qty ranks 2,1,3 -> sd2 = 1+1+0 = 2
        assert got.sd2 == 2
        assert abs(float(got.spearman_rho) - (1 - 12 / 24)) < 1e-6


class TestFanoBurstiness:
    def _run(self, spark, tmp_path, hour_counts):
        base = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h, c in hour_counts.items():
            for i in range(c):
                eid += 1
                rows.append(
                    (eid, base + datetime.timedelta(hours=h, minutes=i), 1,
                     "v", 0.0)
                )
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
            " event_type string, value double"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
        return load_registry()["event_burstiness_fano"].spark(
            spark, str(tmp_path / "sf")
        ).collect()[0]

    def test_uniform_counts_fano_zero(self, spark, tmp_path):
        got = self._run(spark, tmp_path, {0: 2, 1: 2, 2: 2})
        assert got.n_hours == 3 and got.n_events == 6
        assert got.var_scaled == 0 and float(got.fano) == 0.0

    def test_bursty_by_hand(self, spark, tmp_path):
        # counts over span 0..2 (hour 1 empty): [4, 0, 2]
        got = self._run(spark, tmp_path, {0: 4, 2: 2})
        n, sc, sc2 = 3, 6, 20
        assert got.n_hours == 3 and got.n_events == 6
        assert got.var_scaled == n * sc2 - sc * sc
        assert abs(float(got.fano) - (n * sc2 - sc * sc) / (n * sc)) < 1e-6
