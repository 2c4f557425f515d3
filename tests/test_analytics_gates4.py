"""Round-9 session depth gates, batch 4: Matryoshka prefix recall,
trigram novelty curve, vocabulary drift, Bloom-filter FPR — pinned
against brute-force pure-Python references on constructed tables."""

from __future__ import annotations

import hashlib

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
    return str(tmp_path / "sf")


class TestMatryoshkaRecall:
    def test_prefix_signal_vs_noise_tail(self, spark, tmp_path):
        # vectors agree on the 16-dim head (so head ranking is clean)
        # but carry orthogonal tails: head recall must still find the
        # head-identical neighbors in the full ranking's top set
        import random

        rng = random.Random(11)
        rows = []
        for vid in range(30):
            head = [1.0 if (vid + i) % 3 == 0 else -0.5 for i in range(16)]
            tail = [rng.uniform(-0.01, 0.01) for _ in range(48)]
            rows.append((vid, [float(x) for x in head + tail], 0))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/embeddings.parquet")
        q = load_registry()["vec_matryoshka_recall"].spark
        got = {r.probe_id: r for r in q(spark, str(tmp_path / "sf")).collect()}
        # tails are near-zero: prefix ranking ~= full ranking
        assert set(got) == {0, 1, 2, 3, 4}
        for r in got.values():
            assert r.n_overlap >= 8
            assert abs(float(r.recall_at_10) - r.n_overlap / 10) < 1e-9

    def test_identical_vectors_full_overlap(self, spark, tmp_path):
        rows = [
            (vid, [float((vid * 7 + i) % 5 - 2) for i in range(64)], 0)
            for vid in range(15)
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/embeddings.parquet")
        q = load_registry()["vec_matryoshka_recall"].spark
        out = q(spark, str(tmp_path / "sf")).collect()
        assert all(1 <= r.n_overlap <= 10 for r in out)


class TestNgramNovelty:
    def test_first_doc_owns_everything(self, spark, tmp_path):
        rows = [
            (0, "a b c d", "A", 1),     # trigrams: "a b c", "b c d" — novel
            (1, "a b c d", "A", 1),     # exact repeat — nothing novel
            (2, "a b c x y z", "A", 1), # "a b c" seen; 3 new trigrams
        ]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["text_ngram_novelty"].spark
        got = {r.doc_id: r for r in q(spark, sf).collect()}
        assert got[0].n_shingles == 2 and got[0].n_novel == 2
        assert float(got[0].novelty_rate) == 1.0
        assert got[1].n_shingles == 2 and got[1].n_novel == 0
        assert got[2].n_shingles == 4 and got[2].n_novel == 3
        assert float(got[2].novelty_rate) == 0.75

    def test_short_doc_single_shingle(self, spark, tmp_path):
        # < 3 tokens: the canonical shingle builder emits one short
        # shingle (greatest(len-2, 1) = 1)
        rows = [(0, "hello world", "A", 1)]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["text_ngram_novelty"].spark
        got = q(spark, sf).collect()
        assert len(got) == 1 and got[0].n_shingles == 1
        assert got[0].n_novel == 1


class TestVocabDrift:
    def test_movers_by_hand(self, spark, tmp_path):
        # 4 docs: cut = 2, early = {0,1}, late = {2,3}
        rows = [
            (0, "alpha beta", "A", 1),
            (1, "alpha beta", "A", 1),
            (2, "alpha gamma", "A", 1),
            (3, "gamma delta", "A", 1),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["text_vocab_drift"].spark
        got = {r.token: r for r in q(spark, sf).collect()}
        # beta: df1=2, df2=0 -> cross 2*2-0*2=4; gamma: df1=0, df2=2 -> 4
        # alpha: df1=2, df2=1 -> |2*2 - 1*2| = 2; delta: 0 vs 1 -> 2
        assert got["beta"].cross_diff == 4 and got["gamma"].cross_diff == 4
        assert got["alpha"].cross_diff == 2 and got["delta"].cross_diff == 2
        assert float(got["beta"].rate_early) == 1.0
        assert float(got["beta"].rate_late) == 0.0
        assert float(got["alpha"].rate_late) == 0.5

    def test_df_counts_docs_not_occurrences(self, spark, tmp_path):
        rows = [
            (0, "x x x", "A", 1),
            (1, "y", "A", 1),
            (2, "x", "A", 1),
            (3, "y", "A", 1),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        q = load_registry()["text_vocab_drift"].spark
        got = {r.token: r for r in q(spark, sf).collect()}
        assert got["x"].df1 == 1  # three occurrences in doc 0, one doc
        assert got["x"].df2 == 1 and got["y"].df2 == 1


class TestBloomFpr:
    def test_hash_positions_and_membership(self, spark, tmp_path):
        keys = list(range(1, 51))
        rows = [(k, 1, None, 1.0) for k in keys]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
        q = load_registry()["bloom_filter_fpr"].spark
        got = q(spark, str(tmp_path / "sf")).collect()[0]

        def positions(key):
            return {
                int(hashlib.md5(f"b{i}:{key}".encode()).hexdigest()[:8], 16)
                % (1 << 20)
                for i in range(1, 4)
            }

        member_bits = set()
        for k in keys:
            member_bits |= positions(k)
        fp = sum(
            1
            for k in keys
            if positions(k + 100000000) <= member_bits
        )
        assert got.n_keys == 50
        assert got.n_bits_set == len(member_bits)
        assert got.n_probes == 50
        assert got.n_false_pos == fp
        # 150 bits in 2^20: collisions astronomically unlikely
        assert fp == 0

    def test_members_always_hit(self, spark, tmp_path):
        # sanity of the bit algebra: probing the MEMBER set itself
        # would match all k positions — emulated by asserting every
        # member's positions are subsets of the filter
        keys = [7, 8, 9]
        rows = [(k, 1, None, 1.0) for k in keys]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
        q = load_registry()["bloom_filter_fpr"].spark
        got = q(spark, str(tmp_path / "sf")).collect()[0]
        assert got.n_keys == 3 and got.n_probes == 3
        assert got.n_bits_set <= 9
