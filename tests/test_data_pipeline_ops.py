"""Unit tests for dedup / similarity / text / multimodal operators using
planted ground truth (exact copies, near-copies, distinct docs)."""

from __future__ import annotations

import random

import pytest
pytestmark = pytest.mark.slow  # r13: heavy suite, excluded from the default fast tier (run with -m "" or -m slow)

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text_analysis,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(5)
    docs = []
    for i in range(40):
        docs.append((i, _doc(rng)))
    # planted exact duplicates: 100=copy of 0, 101=copy of 1
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1]))
    # planted near-duplicate of doc 2: one word changed
    toks = docs[2][1].split()
    toks[5] = "omega"
    docs.append((102, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.cache().count()
    return df


class TestExactDedup:
    def test_duplicate_groups(self, corpus):
        groups = dedup.exact_duplicates(corpus).collect()
        keepers = {r.keeper_doc_id: r.n_copies for r in groups}
        assert keepers == {0: 2, 1: 2}

    def test_drop_keeps_first(self, corpus):
        kept = dedup.drop_exact_duplicates(corpus)
        ids = {r.doc_id for r in kept.select("doc_id").collect()}
        assert 0 in ids and 100 not in ids
        assert 1 in ids and 101 not in ids
        assert 102 in ids  # near-dup is NOT exact -> kept
        assert kept.count() == corpus.count() - 2


class TestMinHashLSH:
    def test_exact_copies_always_collide(self, corpus):
        pairs = dedup.minhash_near_duplicates(corpus, min_jaccard=0.99).collect()
        found = {(r.doc_a, r.doc_b) for r in pairs}
        assert (0, 100) in found and (1, 101) in found

    def test_near_dup_found_with_threshold(self, corpus):
        pairs = dedup.minhash_near_duplicates(corpus, min_jaccard=0.5).collect()
        by_pair = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
        assert (2, 102) in by_pair
        assert by_pair[(2, 102)] >= 0.5

    def test_jaccard_exact_on_candidates(self, corpus):
        pairs = dedup.minhash_near_duplicates(corpus, min_jaccard=0.99)
        for r in pairs.collect():
            if r.doc_a in (0, 1):
                assert r.jaccard == 1.0

    def test_shingle_variant_runs(self, corpus):
        out = dedup.minhash_near_duplicates(corpus, shingle_n=3, min_jaccard=0.9)
        found = {(r.doc_a, r.doc_b) for r in out.collect()}
        assert (0, 100) in found


class TestSimHash:
    def test_exact_copies_same_fingerprint(self, corpus):
        fp = dedup.simhash_fingerprints(corpus)
        vals = {r.doc_id: r.simhash for r in fp.collect()}
        assert vals[0] == vals[100]
        assert vals[1] == vals[101]

    def test_near_dup_small_hamming(self, corpus):
        # pigeonhole: hamming < n_blocks guarantees a shared block, so a
        # radius-15 search needs 16 blocks (the production default pairs
        # radius 3 with 4 blocks)
        pairs = dedup.simhash_near_duplicates(corpus, max_hamming=15, n_blocks=16)
        by_pair = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
        assert by_pair[(0, 100)] == 0
        assert (2, 102) in by_pair  # one-word change stays within radius


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def _probes(self, emb):
        return emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
        )

    def test_brute_force_topk(self, emb):
        out = similarity.brute_force_topk(emb, self._probes(emb), k=5).collect()
        assert len(out) == 15
        for r in out:
            assert -1.0001 <= r.cos_sim <= 1.0001

    def test_lsh_recall_vs_bruteforce(self, emb):
        probes = self._probes(emb)
        exact = similarity.brute_force_topk(emb, probes, k=5).collect()
        approx = similarity.lsh_topk(emb, probes, dim=64, n_planes=4, k=5).collect()
        exact_set = {(r.probe_id, r.vec_id) for r in exact}
        approx_set = {(r.probe_id, r.vec_id) for r in approx}
        # 4 planes -> 16 buckets over 500 vectors; the probe's own bucket
        # must yield results and recall should be well above random
        assert len(approx_set) > 0
        recall = len(exact_set & approx_set) / len(exact_set)
        assert recall >= 0.2, f"suspiciously low LSH recall {recall}"

    def test_multitable_lsh_beats_single_table(self, emb):
        probes = self._probes(emb)
        exact = similarity.brute_force_topk(emb, probes, k=5).collect()
        exact_set = {(r.probe_id, r.vec_id) for r in exact}
        single = similarity.lsh_topk(emb, probes, dim=64, n_planes=8, k=5)
        multi = similarity.lsh_topk_multitable(
            emb, probes, dim=64, n_tables=8, n_planes=8, k=5, kernel=True
        )
        r_single = len({(r.probe_id, r.vec_id) for r in single.collect()} & exact_set)
        r_multi = len({(r.probe_id, r.vec_id) for r in multi.collect()} & exact_set)
        # OR-amplification: 8 independent tables must not lose recall, and
        # on this corpus measurably gain it (audited 0.13 -> 0.66 at sf0.1)
        assert r_multi >= r_single
        assert r_multi / len(exact_set) >= 0.4, f"multitable recall {r_multi}/15"

    def test_multitable_kernel_matches_expressions(self, emb):
        # the numpy bucket kernel must reproduce the expression path
        # bit-for-bit (same planes, same candidates, same ranks)
        probes = self._probes(emb)
        expr = similarity.lsh_topk_multitable(
            emb, probes, dim=64, n_tables=4, n_planes=8, k=5
        ).collect()
        kern = similarity.lsh_topk_multitable(
            emb, probes, dim=64, n_tables=4, n_planes=8, k=5, kernel=True
        ).collect()
        assert {(r.probe_id, r.vec_id, r.rk) for r in expr} == {
            (r.probe_id, r.vec_id, r.rk) for r in kern
        }

    def test_ivf_recall_vs_bruteforce(self, emb):
        probes = self._probes(emb)
        exact = similarity.brute_force_topk(emb, probes, k=5).collect()
        indexed, cents = similarity.ivf_index(emb, n_centroids=8, lloyd_iters=1)
        approx = similarity.ivf_topk(indexed, cents, probes, k=5, nprobe=3).collect()
        exact_set = {(r.probe_id, r.vec_id) for r in exact}
        approx_set = {(r.probe_id, r.vec_id) for r in approx}
        assert len(approx) == 15  # k results per probe
        recall = len(exact_set & approx_set) / len(exact_set)
        assert recall >= 0.4, f"IVF recall too low: {recall}"

    def test_ivf_full_probe_equals_bruteforce(self, emb):
        probes = self._probes(emb)
        exact = similarity.brute_force_topk(emb, probes, k=5).collect()
        indexed, cents = similarity.ivf_index(emb, n_centroids=4, lloyd_iters=0)
        full = similarity.ivf_topk(indexed, cents, probes, k=5, nprobe=4).collect()
        assert {(r.probe_id, r.rk, r.vec_id) for r in exact} == {
            (r.probe_id, r.rk, r.vec_id) for r in full
        }

    def test_numpy_variant_matches_expressions(self, emb):
        probes = self._probes(emb)
        exact = similarity.brute_force_topk(emb, probes, k=5)
        fast = similarity.brute_force_topk_numpy(emb, probes.toPandas(), k=5)
        e = {(r.probe_id, r.rk): (r.vec_id, round(r.cos_sim, 6)) for r in exact.collect()}
        f = {(r.probe_id, r.rk): (r.vec_id, round(r.cos_sim, 6)) for r in fast.collect()}
        assert e == f


class TestTextAnalysis:
    def test_quality_features(self, corpus):
        out = text_analysis.quality_features(corpus)
        row = out.filter(F.col("doc_id") == 0).collect()[0]
        assert row.n_tokens == 60
        assert 0 < row.lexical_diversity <= 1
        assert row.quality > 0

    def test_language_detection(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat sat on the mat and it is warm"),
                (2, "le chat est sur la table et il est content"),
                (3, "der hund ist nicht mit der katze"),
                (4, "el perro y el gato es una historia"),
                (5, "zzz qqq xxx"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r.lang
            for r in df.select(
                "doc_id", text_analysis.detect_language(F.col("text")).alias("lang")
            ).collect()
        }
        assert out == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und"}

    def test_fingerprint_order_insensitive(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "c b a"), (3, "a b d")], "doc_id long, text string"
        )
        fps = {
            r.doc_id: r.fp
            for r in df.select(
                "doc_id", text_analysis.fingerprint(F.col("text")).alias("fp")
            ).collect()
        }
        assert fps[1] == fps[2]
        assert fps[1] != fps[3]

    def test_token_counts(self, spark):
        df = spark.createDataFrame([(1, "one two three")], "doc_id long, text string")
        r = df.select(
            text_analysis.token_count(F.col("text")).alias("n"),
            text_analysis.bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()[0]
        assert r.n == 3
        assert r.bpe >= 3


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        df = multimodal.synthesize_media(spark, n=48)
        df.cache().count()
        return df

    def test_decode_features_shape(self, media):
        out = multimodal.decode_features(media)
        rows = out.collect()
        assert len(rows) == 48
        assert all(r.decode_ok for r in rows)
        assert all(r.feat_dim == 16 for r in rows)

    def test_decode_is_content_addressed(self, media):
        out1 = multimodal.decode_features(media).orderBy("media_id").collect()
        out2 = multimodal.decode_features(media).orderBy("media_id").collect()
        assert [r.features for r in out1] == [r.features for r in out2]

    def test_metadata_query_prunes_payload(self, media, tmp_path):
        path = str(tmp_path / "media")
        media.write.parquet(path)
        spark = media.sparkSession
        q = spark.read.parquet(path).filter(F.col("meta.width") > 600).select(
            "media_id", "meta.width"
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "payload" not in plan  # columnar projection skips the blob
        assert q.count() > 0

    def test_frame_sample_plan(self, media):
        frames = multimodal.frame_sample_plan(media, every_n=10)
        rows = frames.collect()
        assert len(rows) > 0
        assert all(r.frame_idx % 10 == 0 for r in rows)

    def test_resize_spec_aspect(self, media):
        out = multimodal.resize_spec(media, max_side=256).collect()
        for r in out:
            assert max(r.dst_w, r.dst_h) <= 256
            # aspect preserved within rounding
            assert abs(r.dst_w / r.dst_h - r.src_w / r.src_h) < 0.05

    def test_stub_decoder_failure_path(self, spark, media):
        def failing(payload, modality):
            raise NotImplementedError("real codec not installed")

        out = multimodal.decode_features(media, decoder=failing).collect()
        assert all(not r.decode_ok for r in out)
        assert all(r.feat_dim == 0 for r in out)


class TestRealCodecs:
    """decode_features driven by GENUINE codecs (stdlib wave / hand-parsed
    PPM) — asserts real signal values, not content-addressed fakes."""

    def test_wav_sine_features_end_to_end(self, spark):
        import math

        import numpy as np

        from mobilitydatalakebenchmark_spark.operators import multimodal

        sr, freq, amp, dur = 16000, 440.0, 0.5, 1.0
        n = int(sr * dur)
        t = np.arange(n) / sr
        payload = multimodal.encode_wav_pcm16(amp * np.sin(2 * np.pi * freq * t), sr)
        silence = multimodal.encode_wav_pcm16(np.zeros(sr // 2), sr)
        media = spark.createDataFrame(
            [
                {"media_id": 0, "modality": "audio", "uri": None,
                 "payload": payload, "meta": None},
                {"media_id": 1, "modality": "audio", "uri": None,
                 "payload": silence, "meta": None},
            ],
            multimodal.MEDIA_SCHEMA,
        )
        out = {
            r.media_id: r
            for r in multimodal.decode_features(
                media, decoder=multimodal.stdlib_decode
            ).collect()
        }
        nch, rate, nsamp, dur_s, mean, rms, peak, zcr = out[0].features
        assert (nch, rate, nsamp) == (1.0, float(sr), float(n))
        assert math.isclose(dur_s, dur, rel_tol=1e-9)
        assert abs(mean) < 1e-3
        assert math.isclose(rms, amp / math.sqrt(2), rel_tol=1e-3)
        assert math.isclose(peak, amp, rel_tol=1e-3)
        # a 440 Hz tone crosses zero 2*440 times/s -> zcr = 880/16000
        assert math.isclose(zcr, 2 * freq / sr, rel_tol=2e-2)
        assert out[1].features[5] == 0.0  # silence has zero rms
        assert out[1].decode_ok

    def test_ppm_solid_color_features_end_to_end(self, spark):
        import math

        import numpy as np

        from mobilitydatalakebenchmark_spark.operators import multimodal

        img = np.zeros((4, 6, 3), dtype=np.uint8)
        img[..., 0] = 255  # solid red
        red = multimodal.encode_ppm(img)
        noise = multimodal.encode_ppm(
            np.random.default_rng(3).integers(0, 256, (8, 8, 3), dtype=np.uint8)
        )
        corrupt = b"P6\n not really"
        media = spark.createDataFrame(
            [
                {"media_id": 0, "modality": "image", "uri": None,
                 "payload": red, "meta": None},
                {"media_id": 1, "modality": "image", "uri": None,
                 "payload": noise, "meta": None},
                {"media_id": 2, "modality": "image", "uri": None,
                 "payload": corrupt, "meta": None},
            ],
            multimodal.MEDIA_SCHEMA,
        )
        out = {
            r.media_id: r
            for r in multimodal.decode_features(
                media, decoder=multimodal.stdlib_decode
            ).collect()
        }
        w, h, maxval, mr, mg, mb, luma, luma_std = out[0].features
        assert (w, h, maxval) == (6.0, 4.0, 255.0)
        assert (mr, mg, mb) == (1.0, 0.0, 0.0)
        # features column is array<float> (float32): ~1e-7 relative error
        assert math.isclose(luma, 0.2126, rel_tol=1e-6)
        assert luma_std == 0.0
        assert out[1].decode_ok and out[1].feat_dim == 8
        assert not out[2].decode_ok  # corrupt payload flags, doesn't fail


class TestPII:
    def test_detect_and_scrub_crafted_text(self, spark):
        from mobilitydatalakebenchmark_spark.operators import pii

        rows = [
            (0, "reach me at jane.doe+spam@sub.example.co.uk thanks"),
            (1, "call 415-555-0134 or 212-555-9876 now"),
            (2, "server at 192.168.1.254 and 10.0.0.1"),
            (3, "ssn 078-05-1120 on file"),
            (4, "clean text with no sensitive spans 12345"),
            (5, "mixed: a@b.io 1.2.3.4 999-99-9999 307-555-1212"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        prof = {r.doc_id: r for r in pii.detect_pii(df).collect()}
        assert prof[0].pii_email == 1 and prof[0].has_pii
        assert prof[1].pii_phone == 2
        assert prof[2].pii_ipv4 == 2
        assert prof[3].pii_ssn == 1
        assert not prof[4].has_pii
        assert (prof[5].pii_email, prof[5].pii_ipv4, prof[5].pii_ssn,
                prof[5].pii_phone) == (1, 1, 1, 1)

        masked = {r.doc_id: r.text for r in pii.scrub_pii(df).collect()}
        assert masked[0] == "reach me at [EMAIL] thanks"
        assert masked[1] == "call [PHONE] or [PHONE] now"
        assert masked[2] == "server at [IPV4] and [IPV4]"
        assert masked[3] == "ssn [SSN] on file"
        assert masked[4] == rows[4][1]  # untouched
        # no category survives its own re-scan
        residual = pii.detect_pii(pii.scrub_pii(df)).filter("has_pii").count()
        assert residual == 0

    def test_phone_is_not_misread_as_ssn(self, spark):
        from mobilitydatalakebenchmark_spark.operators import pii

        df = spark.createDataFrame([(0, "415-555-0134")], "doc_id int, text string")
        r = pii.detect_pii(df).collect()[0]
        assert r.pii_phone == 1 and r.pii_ssn == 0


class TestUnigramLM:
    def test_logprob_exact_small_corpus(self, spark):
        import math

        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            unigram_logprob,
        )

        # corpus: 8 tokens total; freq: a=4, b=2, c=1, d=1
        df = spark.createDataFrame(
            [(0, "a a b c"), (1, "a a b d")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in unigram_logprob(df).collect()}
        exp0 = (2 * math.log2(4 / 8) + math.log2(2 / 8) + math.log2(1 / 8)) / 4
        exp1 = exp0  # symmetric: d has same freq as c
        assert out[0].n_tokens == 4
        assert math.isclose(out[0].lm_logprob, round(exp0, 6), abs_tol=1e-6)
        assert math.isclose(out[1].lm_logprob, round(exp1, 6), abs_tol=1e-6)

    def test_rare_token_doc_scores_lower(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            unigram_logprob,
        )

        df = spark.createDataFrame(
            [(0, "x x x x x x x x"), (1, "q w e r t y u i")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.lm_logprob for r in unigram_logprob(df).collect()}
        assert out[1] < out[0]  # all-rare doc is more surprising


class TestLineStats:
    def test_gopher_signals_crafted_doc(self, spark):
        import math

        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            line_stats,
        )

        text = "\n".join(
            ["nav home about", "unique content here", "nav home about",
             "- bullet one", "trailing thought...", "nav home about"]
        )
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        r = line_stats(df).collect()[0]
        assert r.n_lines == 6
        # 'nav home about' x3 -> 6 lines, 4 distinct -> 1 - 4/6
        assert math.isclose(r.frac_dup_lines, round(1 - 4 / 6, 6), abs_tol=1e-6)
        dup_chars = 3 * len("nav home about")
        total = sum(len(l) for l in text.split("\n"))
        assert math.isclose(
            r.frac_chars_dup_lines, round(dup_chars / total, 6), abs_tol=1e-6
        )
        assert math.isclose(r.frac_bullet_lines, round(1 / 6, 6), abs_tol=1e-6)
        assert math.isclose(r.frac_ellipsis_lines, round(1 / 6, 6), abs_tol=1e-6)

    def test_no_duplicates_all_zero(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            line_stats,
        )

        df = spark.createDataFrame(
            [(0, "one line\ntwo line\nred line")], "doc_id long, text string"
        )
        r = line_stats(df).collect()[0]
        assert r.frac_dup_lines == 0.0 and r.frac_chars_dup_lines == 0.0


class TestMixtureSample:
    def test_rates_and_determinism(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            mixture_sample,
        )

        rows = [(i, "a" if i % 2 == 0 else "b", f"t{i}") for i in range(4000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        kept = mixture_sample(df, {"a": 0.25, "b": 1.0}, "lang")
        counts = {r.lang: r.n for r in kept.groupBy("lang").agg(
            F.count("*").alias("n")).collect()}
        assert counts["b"] == 2000  # weight 1.0 keeps everything
        assert abs(counts["a"] - 500) < 80  # ~25% of 2000, hash-binomial
        # reproducible under different partitioning
        ids1 = sorted(r.doc_id for r in kept.select("doc_id").collect())
        ids2 = sorted(
            r.doc_id
            for r in mixture_sample(df.repartition(13), {"a": 0.25, "b": 1.0}, "lang")
            .select("doc_id")
            .collect()
        )
        assert ids1 == ids2

    def test_unlisted_stratum_dropped_by_default(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            mixture_sample,
        )

        df = spark.createDataFrame(
            [(0, "x", "t"), (1, "y", "t")], "doc_id long, lang string, text string"
        )
        assert mixture_sample(df, {"x": 1.0}, "lang").count() == 1

    def test_empty_weights_honors_fractional_default(self, spark):
        """Regression: with no strata listed, default_weight must act as a
        per-row keep probability (hash compare), not collapse to the
        boolean default_weight >= 1.0 (which kept 0 of 1000 at 0.5)."""
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            mixture_sample,
        )

        rows = [(i, "any", f"t{i}") for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        n = mixture_sample(df, {}, "lang", default_weight=0.5).count()
        assert abs(n - 1000) < 80  # ~50%, hash-binomial
        assert mixture_sample(df, {}, "lang", default_weight=0.0).count() == 0
        assert mixture_sample(df, {}, "lang", default_weight=1.0).count() == 2000


class TestSharedPassages:
    def test_planted_passage_exact_run_length(self, spark):
        from mobilitydatalakebenchmark_spark.operators.dedup import shared_passages

        passage = " ".join(f"p{i}" for i in range(20))  # 20 shared tokens
        docs = [
            (0, "x0 x1 x2 " + passage + " y0 y1"),
            (1, "z0 z1 z2 z3 " + passage + " w0"),
            (2, " ".join(f"u{i}" for i in range(30))),  # no overlap
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = shared_passages(df, shingle_n=8).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.doc_a, r.doc_b) == (0, 1)
        # 20 shared tokens -> 13 consecutive 8-shingles -> run = 13+7 = 20
        assert r.longest_run_tokens == 20
        assert r.n_shared_shingles == 13

    def test_two_separate_passages_counted_separately(self, spark):
        from mobilitydatalakebenchmark_spark.operators.dedup import shared_passages

        p1 = " ".join(f"a{i}" for i in range(10))
        p2 = " ".join(f"b{i}" for i in range(8))
        docs = [
            (0, p1 + " q0 q1 q2 q3 q4 q5 " + p2),
            (1, p2 + " r0 r1 r2 r3 r4 r5 " + p1),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = shared_passages(df, shingle_n=8).collect()[0]
        # p1: 10 tokens -> 3 shingles (run 10); p2: 8 -> 1 shingle (run 8)
        assert r.longest_run_tokens == 10
        assert r.n_shared_shingles == 4


class TestRowwiseSignatures:
    def test_rowwise_equals_batch_signatures(self, corpus):
        from mobilitydatalakebenchmark_spark.operators.dedup import (
            minhash_signatures,
            minhash_signatures_rowwise,
        )

        a = {r.doc_id: tuple(r[c] for c in r.asDict() if c.startswith("mh_"))
             for r in minhash_signatures(corpus).collect()}
        b = {r.doc_id: tuple(r[c] for c in r.asDict() if c.startswith("mh_"))
             for r in minhash_signatures_rowwise(corpus).collect()}
        assert a == b
        # and with shingles
        a2 = {r.doc_id: r.mh_0 for r in minhash_signatures(corpus, shingle_n=3).collect()}
        b2 = {r.doc_id: r.mh_0 for r in minhash_signatures_rowwise(corpus, shingle_n=3).collect()}
        assert a2 == b2


class TestReviewFixes:
    """Regression tests for the round-3 code-review findings."""

    def test_epoch_floor_semantics_on_fractional_nanos(self, spark):
        from pyspark.sql import functions as F

        from mobilitydatalakebenchmark_spark.functions.codecs import epoch_s, epoch_us

        # 1.999999999 s in nanos: floor must give 1 s / 1999999 us, and the
        # timestamp path must agree (decimal HALF_UP would have said 2)
        df = spark.createDataFrame([(1_999_999_999,)], "ns long")
        r = df.select(
            epoch_s("ns", dtype="bigint").alias("s"),
            epoch_us("ns", dtype="bigint").alias("us"),
            epoch_s(F.timestamp_micros(F.lit(1_999_999))).alias("s_ts"),
        ).collect()[0]
        assert r.s == 1 and r.s_ts == 1
        assert r.us == 1_999_999

    def test_pii_mixed_case_email(self, spark):
        from mobilitydatalakebenchmark_spark.operators import pii

        df = spark.createDataFrame(
            [(0, "contact John.Doe@Example.COM today")], "doc_id int, text string"
        )
        r = pii.detect_pii(df).collect()[0]
        assert r.pii_email == 1 and r.has_pii
        assert pii.scrub_pii(df).collect()[0].text == "contact [EMAIL] today"

    def test_ppm_16bit_flags_not_garbage(self, spark):
        from mobilitydatalakebenchmark_spark.operators import multimodal

        payload = b"P6\n2 2\n65535\n" + b"\x00\x01" * 12
        media = spark.createDataFrame(
            [{"media_id": 0, "modality": "image", "uri": None,
              "payload": payload, "meta": None}],
            multimodal.MEDIA_SCHEMA,
        )
        r = multimodal.decode_features(
            media, decoder=multimodal.stdlib_decode
        ).collect()[0]
        assert not r.decode_ok

    def test_rowwise_signatures_drop_null_text(self, spark):
        from mobilitydatalakebenchmark_spark.operators.dedup import (
            minhash_signatures,
            minhash_signatures_rowwise,
        )

        df = spark.createDataFrame(
            [(0, "a b c"), (1, None), (2, None)], "doc_id long, text string"
        )
        assert minhash_signatures(df).count() == 1
        assert minhash_signatures_rowwise(df).count() == 1

    def test_shared_passages_short_docs_no_phantom_runs(self, spark):
        from mobilitydatalakebenchmark_spark.operators.dedup import shared_passages

        df = spark.createDataFrame(
            [(0, "a b c"), (1, "a b c")], "doc_id long, text string"
        )
        assert shared_passages(df, shingle_n=8).count() == 0

    def test_shared_passages_coverage_not_match_count(self, spark):
        from mobilitydatalakebenchmark_spark.operators.dedup import shared_passages

        block = " ".join(f"b{i}" for i in range(8))
        filler = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
        # block appears 3x in doc 0, 2x in doc 1 -> 6 join matches but only
        # 3 distinct matched positions in doc_a
        d0 = " ".join([block, filler("x", 8), block, filler("y", 8), block])
        d1 = " ".join([block, filler("z", 8), block])
        df = spark.createDataFrame([(0, d0), (1, d1)], "doc_id long, text string")
        r = shared_passages(df, shingle_n=8).collect()[0]
        assert r.n_shared_shingles == 3
        assert r.longest_run_tokens == 8

    def test_shared_passages_max_df_caps_hot_shingle(self, spark):
        """A boilerplate shingle shared by 1k docs must NOT expand to the
        ~500k-row O(k^2) pair join when max_df caps the frequency gate."""
        from mobilitydatalakebenchmark_spark.operators.dedup import shared_passages

        boiler = " ".join(f"b{i}" for i in range(8))
        rows = [(i, f"u{i}a u{i}b {boiler}") for i in range(1000)]
        # two docs that genuinely share a private passage on top of the stub
        private = " ".join(f"p{i}" for i in range(8))
        rows += [(2000, f"{private} q0 q1"), (2001, f"{private} r0 r1")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        capped = shared_passages(df, shingle_n=8, max_df=100)
        got = capped.collect()
        # hot shingle dropped entirely; the private pair survives
        assert [(r.doc_a, r.doc_b) for r in got] == [(2000, 2001)]
        assert got[0].longest_run_tokens == 8
        # uncapped control: the same input explodes into ~500k pairs
        uncapped = shared_passages(df, shingle_n=8, max_df=None)
        assert uncapped.count() == (1000 * 999) // 2 + 1


class TestCovarianceDispatch:
    """similarity.covariance_matrix picks the plan from the requested
    width: codegen'd expressions for narrow vectors, the one-pass Gram
    mapInPandas kernel for wide ones (measured crossover d≈128-256)."""

    def test_narrow_uses_expressions(self, spark):
        from mobilitydatalakebenchmark_spark.operators import similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = similarity.covariance_matrix(emb, dims=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan
        # both paths agree value-for-value at the gates' 6-dp rounding
        expr_rows = {(r.i, r.j): (r.cov_pop, r.corr_r, r.n) for r in out.collect()}
        gram_rows = {
            (r.i, r.j): (r.cov_pop, r.corr_r, r.n)
            for r in similarity.covariance_matrix_gram(emb, 8).collect()
        }
        assert expr_rows == gram_rows

    def test_wide_uses_gram_kernel(self, spark):
        import numpy as np

        from mobilitydatalakebenchmark_spark.operators import similarity

        rng = np.random.default_rng(7)
        wide = spark.createDataFrame(
            [(i, rng.standard_normal(256).tolist()) for i in range(50)],
            "vec_id long, embedding array<double>",
        )
        out = similarity.covariance_matrix(wide)  # width probed: 256
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        assert out.count() == 256 * 257 // 2


class TestMisraGries:
    """Heavy-hitter sketch under pressure: vocabulary far above the
    counter budget, so decrements actually fire."""

    @pytest.fixture(scope="class")
    def skewed_tokens(self, spark):
        # 3 planted heavy hitters (freqs 3000/2000/1000) over a 2000-token
        # noise vocabulary appearing ~3x each: N ~= 12000, so with k=16
        # the MG threshold N/(k+1) ~= 706 < every planted frequency
        rng = random.Random(11)
        toks = (
            ["alpha"] * 3000 + ["beta"] * 2000 + ["gamma"] * 1000
            + [f"noise{rng.randrange(2000)}" for _ in range(6000)]
        )
        rng.shuffle(toks)
        return spark.createDataFrame(
            [(t,) for t in toks], "token string"
        ).repartition(8)

    def test_planted_heavies_survive_decrements(self, skewed_tokens):
        cands = text_analysis.misra_gries_candidates(
            skewed_tokens, "token", n_counters=16
        )
        kept = {r.token for r in cands.collect()}
        # candidate bound: at most n_counters per partition
        per_part = cands.groupBy(F.spark_partition_id()).count()
        assert {"alpha", "beta", "gamma"} <= kept
        assert cands.count() <= 16 * 8

    def test_recounted_topk_is_exact_for_heavies(self, skewed_tokens):
        top = text_analysis.heavy_hitters_topk(
            skewed_tokens, "token", k=3, n_counters=16
        ).collect()
        assert [(r.token, r.n) for r in top] == [
            ("alpha", 3000), ("beta", 2000), ("gamma", 1000)
        ]

    def test_mg_counts_underestimate_within_bound(self, skewed_tokens):
        # per-partition guarantee: mg_count <= true partition count, and
        # underestimates by at most n_p/(k+1); checked on the global sums
        # (sum of per-partition bounds = N/(k+1))
        cands = text_analysis.misra_gries_candidates(
            skewed_tokens, "token", n_counters=16
        )
        mg = {
            r.token: r.s
            for r in cands.groupBy("token").agg(F.sum("mg_count").alias("s")).collect()
        }
        true = {
            r.token: r.n
            for r in skewed_tokens.groupBy("token")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n_total = sum(true.values())
        bound = n_total / 17
        for tok in ("alpha", "beta", "gamma"):
            assert mg[tok] <= true[tok]
            assert true[tok] - mg[tok] <= bound


class TestWeightedSample:
    def test_matches_python_reference(self, spark):
        import hashlib
        import math

        rows = [(f"s{i % 3}", i, 1 + (i * 7) % 40) for i in range(200)]
        df = spark.createDataFrame(rows, "source string, doc_id long, w int")
        got = {
            (r.source, r.doc_id, r.rk)
            for r in text_analysis.weighted_sample(
                df, "w", k=4, id_col="doc_id", group_col="source"
            ).collect()
        }
        keyed = {}
        for src, d, w in rows:
            v = int(hashlib.md5(f"ares{d}".encode()).hexdigest()[:8], 16)
            u = (v + 1) / 4294967296.0
            keyed.setdefault(src, []).append((round(math.log(u) / w, 10), -d, d))
        want = set()
        for src, items in keyed.items():
            for rk, (_, _, d) in enumerate(sorted(items, reverse=True)[:4], 1):
                want.add((src, d, rk))
        assert got == want

    def test_partition_invariant(self, spark):
        rows = [(f"s{i % 5}", i, 1 + i % 9) for i in range(500)]
        df = spark.createDataFrame(rows, "source string, doc_id long, w int")
        a = {
            (r.source, r.doc_id)
            for r in text_analysis.weighted_sample(
                df, "w", k=3, group_col="source"
            ).collect()
        }
        b = {
            (r.source, r.doc_id)
            for r in text_analysis.weighted_sample(
                df.repartition(13), "w", k=3, group_col="source"
            ).collect()
        }
        assert a == b

    def test_weight_biases_inclusion(self, spark):
        # one heavy doc (w=500) among 99 light (w=1), sampled k=5 across
        # 40 salts: the heavy doc must be included far more often than a
        # light baseline (P_incl ~ 1 for heavy vs ~0.04 for light)
        rows = [("s", i, 500 if i == 0 else 1) for i in range(100)]
        df = spark.createDataFrame(rows, "source string, doc_id long, w int")
        heavy = light = 0
        for salt in range(40):
            ids = {
                r.doc_id
                for r in text_analysis.weighted_sample(
                    df, "w", k=5, group_col="source", salt=f"s{salt}"
                ).collect()
            }
            heavy += 0 in ids
            light += 1 in ids
        assert heavy >= 35
        assert light <= 15
