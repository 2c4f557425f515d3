"""Round-9 session depth gates, batch 3: quantile normalization,
feature-hash collision audit, funnel time-to-convert, diff-in-diff —
pinned against hand-computed references on constructed tables."""

from __future__ import annotations

import datetime

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
    return str(tmp_path / "sf")


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
    return str(tmp_path / "sf")


class TestQuantileNormalization:
    def test_single_source_is_identity(self, spark, tmp_path):
        rows = [(i, "x", "A", 100 + 10 * i) for i in range(8)]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["quantile_normalization"].spark
        got = q(spark, sf).collect()[0]
        # one source: within-source ranks == global ranks, so the
        # mapping is the identity and the sum is the raw sum
        assert got.n_docs == 8
        assert got.sum_norm == sum(100 + 10 * i for i in range(8))
        assert got.min_norm == 100 and got.max_norm == 170

    def test_rank_formula_by_hand(self, spark, tmp_path):
        # source A has 2 docs, B has 4; global sorted values:
        # 10,20,30,40,50,60 (N=6)
        rows = [
            (1, "x", "A", 10),
            (2, "x", "A", 40),
            (3, "x", "B", 20),
            (4, "x", "B", 30),
            (5, "x", "B", 50),
            (6, "x", "B", 60),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["quantile_normalization"].spark
        got = {r.source: r for r in q(spark, sf).collect()}
        # A: s_rank 1 -> g_rank (0*6)//2+1 = 1 -> 10;
        #    s_rank 2 -> (1*6)//2+1 = 4 -> 40
        assert got["A"].sum_norm == 10 + 40
        # B: ranks 1..4 -> (0..3)*6//4+1 = 1,2,4,5 -> 10,20,40,50
        assert got["B"].sum_norm == 10 + 20 + 40 + 50
        assert got["B"].min_norm == 10 and got["B"].max_norm == 50


class TestFeatureHashCollisions:
    def test_vocabulary_mass_conserved(self, spark, tmp_path):
        words = [f"tok{i}" for i in range(200)]
        rows = [
            (i, " ".join(words[i : i + 50]), "A", 1) for i in range(0, 150, 50)
        ]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["feature_hash_collisions"].spark
        got = q(spark, sf).collect()
        # every distinct token lands in exactly one bucket
        assert sum(r.n_tokens for r in got) == 150
        assert sum(r.load * r.n_buckets for r in got) == 150
        assert all(r.n_tokens == r.load * r.n_buckets for r in got)

    def test_duplicates_across_docs_count_once(self, spark, tmp_path):
        rows = [(1, "a b c", "A", 1), (2, "c b a", "B", 1)]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["feature_hash_collisions"].spark
        got = q(spark, sf).collect()
        assert sum(r.n_tokens for r in got) == 3


class TestFunnelTimeToConvert:
    def test_quantile_ranks_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # users 1..5 sign up at t0 and purchase after 10,20,30,40,50 s
        for uid, delay in zip(range(1, 6), [10, 20, 30, 40, 50]):
            eid += 1
            rows.append((eid, base, uid, "signup", 0.0))
            eid += 1
            rows.append(
                (eid, base + datetime.timedelta(seconds=delay), uid,
                 "purchase", 1.0)
            )
        # user 6 purchases BEFORE signing up: not a conversion
        rows.append((98, base, 6, "purchase", 1.0))
        rows.append((99, base + datetime.timedelta(seconds=5), 6, "signup", 0.0))
        # user 7 signs up but never buys
        rows.append((100, base, 7, "signup", 0.0))
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["funnel_time_to_convert"].spark
        got = q(spark, sf).collect()[0]
        assert got.n_converted == 5
        assert got.min_s == 10 and got.max_s == 50
        # discrete lower quantiles over [10,20,30,40,50]:
        # r25 = (4*25)//100+1 = 2 -> 20; r50 = 3 -> 30; r75 = 4 -> 40
        assert got.p25_s == 20 and got.p50_s == 30 and got.p75_s == 40

    def test_purchase_at_signup_instant_counts(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (1, base, 1, "signup", 0.0),
            (2, base, 1, "purchase", 1.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["funnel_time_to_convert"].spark
        got = q(spark, sf).collect()[0]
        assert got.n_converted == 1 and got.min_s == 0 and got.max_s == 0


class TestDiffInDiff:
    def test_four_cell_means_by_hand(self, spark, tmp_path):
        before = datetime.datetime(2024, 1, 10)
        after = datetime.datetime(2024, 1, 20)
        # treated users are odd: user 1 (treated), user 2 (control)
        rows = [
            (1, before, 1, "purchase", 10.0),
            (2, before, 1, "purchase", 20.0),  # m_tb = 1500 cents
            (3, after, 1, "purchase", 50.0),   # m_ta = 5000
            (4, before, 2, "purchase", 10.0),  # m_cb = 1000
            (5, after, 2, "purchase", 20.0),   # m_ca = 2000
            (6, after, 2, "view", 99.0),       # non-purchase ignored
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["experiment_diff_in_diff"].spark
        got = q(spark, sf).collect()[0]
        assert float(got.mean_treated_before) == 1500.0
        assert float(got.mean_treated_after) == 5000.0
        assert float(got.mean_control_before) == 1000.0
        assert float(got.mean_control_after) == 2000.0
        # DiD = (5000 - 1500) - (2000 - 1000) = 2500
        assert float(got.did_cents) == 2500.0
        assert got.n_purchases == 5

    def test_empty_cell_yields_null(self, spark, tmp_path):
        # no treated-after purchases: that mean and the DiD are NULL
        before = datetime.datetime(2024, 1, 10)
        rows = [
            (1, before, 1, "purchase", 10.0),
            (2, before, 2, "purchase", 10.0),
            (3, datetime.datetime(2024, 1, 20), 2, "purchase", 30.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        q = load_registry()["experiment_diff_in_diff"].spark
        got = q(spark, sf).collect()[0]
        assert got.mean_treated_after is None
        assert got.did_cents is None
        assert float(got.mean_control_after) == 3000.0
