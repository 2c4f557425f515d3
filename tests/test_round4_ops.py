"""Round-4 operator tests: product-quantization ANN, SemDeDup semantic
dedup, distributed covariance, document chunking, Zipf fit, perplexity
buckets, and the bucketed interval-overlap join.

Gate-level value parity is covered by tools/check_oracle.py; these tests
pin the operator *semantics* on crafted inputs (exactness vs brute force,
boundary behavior, naive-vs-bucketed plan equivalence) where the synthetic
tables can't reach the edge cases.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def test_pq_codebook_shape(spark, embeddings):
    from mobilitydatalakebenchmark_spark.operators.similarity import pq_codebook

    cb = pq_codebook(embeddings, m_subspaces=4, dsub=16, n_codewords=8)
    rows = cb.collect()
    assert len(rows) == 32
    assert {(r.m, r.codeword_id) for r in rows} == {
        (m, c) for m in range(4) for c in range(8)
    }
    assert all(len(r.cvec) == 16 for r in rows)


def test_pq_encode_covers_every_vector(spark, embeddings):
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    cb = pq_codebook(embeddings)
    codes = pq_encode(embeddings, cb)
    n = embeddings.count()
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == n
    assert all(r["count"] == 4 for r in per_vec)
    # codes must reference real codewords
    assert codes.join(cb, ["m", "codeword_id"], "left_anti").count() == 0


def test_pq_adc_matches_exhaustive_python(spark, embeddings):
    """ADC distances from the Spark lookup-table plan equal a direct python
    recomputation of sum-of-subspace distances for a spot-checked probe."""
    import numpy as np

    from mobilitydatalakebenchmark_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    cb = pq_codebook(embeddings)
    codes = pq_encode(embeddings, cb)
    probes = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    got = {
        r.vec_id: r.adc_d2
        for r in pq_adc_topk(codes, cb, probes, k=5).collect()
    }

    cb_map = {(r.m, r.codeword_id): np.array(r.cvec, dtype="float64")
              for r in cb.collect()}
    code_map = {}
    for r in codes.collect():
        code_map.setdefault(r.vec_id, {})[r.m] = r.codeword_id
    probe = np.array(
        embeddings.filter(F.col("vec_id") == 0).first().embedding, dtype="float64"
    )
    dists = {}
    for vid, ms in code_map.items():
        if vid == 0:
            continue
        d = 0.0
        for m in range(4):
            psub = probe[m * 16:(m + 1) * 16]
            cw = cb_map[(m, ms[m])]
            d += float(psub @ psub - 2 * psub @ cw + cw @ cw)
        dists[vid] = round(d, 4)
    expect = dict(sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:5])
    assert got == pytest.approx(expect)


def test_pq_recall_vs_bruteforce(spark, embeddings):
    """PQ is approximate; with 8 codewords x 4 subspaces over 50 vectors the
    ADC top-10 should still catch a decent share of the true top-5."""
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        brute_force_topk,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    probes = embeddings.limit(3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    # brute force ranks by cosine; PQ by L2 — on unnormalized vectors these
    # differ, so compare against L2 brute force computed inline
    from mobilitydatalakebenchmark_spark.operators.similarity import l2sq

    exact = (
        embeddings.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            l2sq(F.col("probe_vec"), F.col("embedding")).alias("d2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    true_top = {
        (r.probe_id, r.vec_id)
        for r in exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    cb = pq_codebook(embeddings)
    codes = pq_encode(embeddings, cb)
    approx_top = {
        (r.probe_id, r.vec_id)
        for r in pq_adc_topk(codes, cb, probes, k=10).collect()
    }
    recall = len(true_top & approx_top) / len(true_top)
    # the untrained seeded codebook on random 64-dim vectors is a weak
    # quantizer by design (the gate trades recall for SQL replayability);
    # random top-10-of-n selection would land ~10/n ~= 0.02-0.2 here, so
    # just require clearly-better-than-chance. Quality comes from pq_train.
    n = embeddings.count()
    assert recall > min(0.5, 2 * 10 / n), f"PQ recall at chance level: {recall}"


def test_pq_train_improves_quantization(spark, embeddings):
    """Lloyd refinement must strictly reduce mean reconstruction error —
    the invariant k-means training guarantees."""
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        pq_codebook,
        pq_quantization_error,
        pq_train,
    )

    seeded = pq_codebook(embeddings)
    trained = pq_train(embeddings, lloyd_iters=2)
    e0 = pq_quantization_error(embeddings, seeded)
    e2 = pq_quantization_error(embeddings, trained)
    assert e2 < e0 * 0.95, f"training did not reduce MSE: {e0} -> {e2}"


# ---------------------------------------------------------------------------
# Semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted_duplicates(spark):
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        semantic_dedup_summary,
    )

    # two exact-duplicate groups + isolated orthogonal vectors
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),     # dup of 0
        (2, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_summary(df, n_clusters=2, threshold=0.9)
    total = out.agg(
        F.sum("n_members").alias("m"), F.sum("n_dropped").alias("d")
    ).first()
    assert total.m == 6
    assert total.d == 2  # vec 1 and vec 2 drop against vec 0
    kept = out.agg(F.sum("n_kept")).first()[0]
    assert kept == 4


def test_semantic_dedup_no_drops_below_threshold(spark):
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        semantic_dedup_summary,
    )

    rows = [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_summary(df, n_clusters=2, threshold=0.5)
    assert out.agg(F.sum("n_dropped")).first()[0] == 0


def test_semantic_dedup_cap_bounds_degenerate_cluster(spark):
    """Plant one degenerate cluster (200 near-identical vectors — every one
    lands on the same centroid) and assert the per-cluster comparison cap
    keeps the pair join bounded: without the cap the join emits ~200²/2
    pairs; with max_cluster_size=10 at most 10·9/2 per cluster, and the
    un-compared members are reported as n_truncated, not silently dropped."""
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        semantic_dedup_summary,
    )

    n = 200
    rows = [(i, [1.0, float(i) * 1e-6, 0.0, 0.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_summary(
        df, n_clusters=2, threshold=0.9, max_cluster_size=10
    ).collect()
    assert sum(r.n_members for r in out) == n
    for r in out:
        # join output bounded by cap^2 regardless of cluster size
        assert r.n_dup_pairs <= 10 * 9 // 2
        assert r.n_dropped <= 9
        assert r.n_truncated == max(r.n_members - 10, 0)
        # truncated members are kept (never compared => never dropped)
        assert r.n_kept == r.n_members - r.n_dropped
    # the degenerate cluster really was truncated
    assert sum(r.n_truncated for r in out) >= n - 2 * 10


def test_semantic_dedup_cap_noop_on_small_clusters(spark):
    """A cap larger than every cluster must not change any output value
    (identity guard — the capped plan is the default gate path)."""
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        semantic_dedup_summary,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = semantic_dedup_summary(df, n_clusters=2, threshold=0.9)
    capped = semantic_dedup_summary(
        df, n_clusters=2, threshold=0.9, max_cluster_size=1000
    )
    a = [r.asDict() for r in uncapped.drop("n_truncated").collect()]
    b = [r.asDict() for r in capped.drop("n_truncated").collect()]
    assert a == b
    assert all(r.n_truncated == 0 for r in capped.collect())


# ---------------------------------------------------------------------------
# Covariance
# ---------------------------------------------------------------------------


def test_covariance_matches_numpy(spark, embeddings):
    import numpy as np

    from mobilitydatalakebenchmark_spark.plans.vectors import (
        vec_covariance_matrix,
    )

    out = {(r.i, r.j): (r.cov_pop, r.corr_r) for r in
           vec_covariance_matrix(spark, SF).collect()}
    mat = np.vstack(
        [r.embedding for r in embeddings.orderBy("vec_id").collect()]
    ).astype("float64")[:, :8]
    cov = np.cov(mat, rowvar=False, bias=True)
    corr = np.corrcoef(mat, rowvar=False)
    for (i, j), (c, r_) in out.items():
        assert c == pytest.approx(cov[i - 1, j - 1], abs=2e-6)
        assert r_ == pytest.approx(corr[i - 1, j - 1], abs=2e-6)
    assert len(out) == 36


def test_covariance_gram_matches_numpy_full_width(spark, embeddings):
    """The one-pass Gram kernel at FULL d=64 (2080 pairs — the width where
    the expression plan's crossJoin inflation actually hurts) must agree
    with numpy's covariance/correlation to the gate's 6-dp rounding."""
    import numpy as np

    from mobilitydatalakebenchmark_spark.operators.similarity import (
        covariance_matrix_gram,
    )

    out = {(r.i, r.j): (r.cov_pop, r.corr_r, r.n) for r in
           covariance_matrix_gram(embeddings, dims=64).collect()}
    mat = np.vstack(
        [r.embedding for r in embeddings.orderBy("vec_id").collect()]
    ).astype("float64")
    cov = np.cov(mat, rowvar=False, bias=True)
    corr = np.corrcoef(mat, rowvar=False)
    assert len(out) == 64 * 65 // 2
    for (i, j), (c, r_, n) in out.items():
        assert n == mat.shape[0]
        assert c == pytest.approx(cov[i - 1, j - 1], abs=2e-6)
        assert r_ == pytest.approx(corr[i - 1, j - 1], abs=2e-6)


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def test_chunk_overlap_boundaries(spark):
    from mobilitydatalakebenchmark_spark.plans import load_registry

    load_registry()
    from mobilitydatalakebenchmark_spark.plans.text import (
        _CHUNK_S,
        _CHUNK_W,
        text_chunk_overlap,
    )

    out = text_chunk_overlap(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    lens = {r.doc_id: len(r.text) for r in docs}
    texts = {r.doc_id: r.text for r in docs}
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = lens[doc_id]
        assert len(chunks) == max(1, math.ceil(n / _CHUNK_S))
        # starts advance by the stride; last chunk may be short
        for k, r in enumerate(chunks):
            assert r.chunk_start == 1 + k * _CHUNK_S
            expect = texts[doc_id][r.chunk_start - 1: r.chunk_start - 1 + _CHUNK_W]
            assert r.chunk_chars == len(expect)
        # consecutive chunks overlap by W - S characters (when full)
        full = [r for r in chunks if r.chunk_chars == _CHUNK_W]
        if len(full) >= 2:
            assert _CHUNK_W - _CHUNK_S == 40


def test_chunk_coverage_no_gaps(spark):
    """Every character position of every document is inside >= 1 chunk."""
    from mobilitydatalakebenchmark_spark.plans.text import (
        _CHUNK_S,
        _CHUNK_W,
        text_chunk_overlap,
    )

    out = text_chunk_overlap(spark, SF).collect()
    cover: dict[int, int] = {}
    for r in out:
        end = r.chunk_start + r.chunk_chars - 1
        cover[r.doc_id] = max(cover.get(r.doc_id, 0), end)
        assert r.chunk_chars > 0
    lens = {
        r.doc_id: len(r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert cover == lens  # stride <= window => contiguous coverage to the end


# ---------------------------------------------------------------------------
# Zipf + perplexity buckets
# ---------------------------------------------------------------------------


def test_zipf_slope_negative_and_r2_sane(spark):
    from mobilitydatalakebenchmark_spark.plans.text import text_zipf_slope

    row = text_zipf_slope(spark, SF).first()
    assert row.n_ranks > 10
    assert row.zipf_slope < 0  # frequency decreases with rank
    assert 0.0 <= row.zipf_r2 <= 1.0


def test_perplexity_buckets_partition_docs(spark):
    from mobilitydatalakebenchmark_spark.plans.text import (
        text_perplexity_buckets,
    )

    rows = {r.bucket: r for r in text_perplexity_buckets(spark, SF).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    # terciles: no bucket grabs more than half the corpus
    assert all(r.n_docs <= n_docs * 0.55 for r in rows.values())
    # ordering: tail has the most negative (most surprising) scores
    assert rows["tail"].max_lm_logprob <= rows["middle"].min_lm_logprob
    assert rows["middle"].max_lm_logprob <= rows["head"].min_lm_logprob


# ---------------------------------------------------------------------------
# Interval overlap join
# ---------------------------------------------------------------------------


def test_interval_overlap_bucketed_equals_naive(spark):
    """The bucketed-decomposition plan returns exactly the naive pair-join
    result (including pairs whose overlap spans a bucket boundary)."""
    from mobilitydatalakebenchmark_spark.plans.windows import (
        interval_overlap_join,
    )

    got = {
        (r.user_a, r.user_b): r.n_overlaps
        for r in interval_overlap_join(spark, SF).collect()
    }
    iv = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        )
    )
    a, b = iv.alias("a"), iv.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .groupBy(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert got == {(r.user_a, r.user_b): r.n for r in naive}


def test_interval_overlap_strictness(spark):
    """Touching intervals (a.e == b.s) do NOT count as overlapping."""
    from pyspark.sql import Row

    from mobilitydatalakebenchmark_spark.plans.windows import _IV_BUCKET_S

    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=1, user_id=1, ts=base),
        Row(event_id=2, user_id=2, ts=base + dt.timedelta(minutes=30)),  # touch
        Row(event_id=3, user_id=3, ts=base + dt.timedelta(minutes=29)),  # overlap
    ]
    df = spark.createDataFrame(rows)
    iv = df.select(
        "event_id",
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    bucketed = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("s") / _IV_BUCKET_S),
                F.floor(F.unix_timestamp("e") / _IV_BUCKET_S),
            )
        ),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .filter((F.col("a.s") < F.col("b.e")) & (F.col("b.s") < F.col("a.e")))
        .select(F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub"))
        .distinct()
        .collect()
    )
    got = {(r.ua, r.ub) for r in pairs}
    assert (1, 2) not in got          # touching, strict
    assert (1, 3) in got and (2, 3) in got


# ---------------------------------------------------------------------------
# Round-7: IVF+PQ residual tier (IVFADC / IVFADC+R)
# ---------------------------------------------------------------------------


def test_pq_encode_numpy_matches_expression_path(spark, embeddings):
    """The einsum kernel and the in-plan fold must assign identical codes
    (same distances up to ulp, same lowest-id tie-break)."""
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
        pq_encode_numpy,
    )

    cb = pq_codebook(embeddings, m_subspaces=4, dsub=16, n_codewords=8)
    a = sorted(
        tuple(r) for r in pq_encode(embeddings, cb, 4, 16).collect()
    )
    b = sorted(
        tuple(r) for r in pq_encode_numpy(embeddings, cb, 4, 16).collect()
    )
    assert a == b


def test_unit_normalize(spark):
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        norm,
        unit_normalize,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.0])],
        "id long, v array<double>",
    ).select("id", unit_normalize(F.col("v")).alias("u"))
    rows = {r.id: r.u for r in df.collect()}
    assert rows[1] == pytest.approx([0.6, 0.8])
    assert rows[2] == [0.0, 0.0]  # zero vector passes through
    assert rows[3] == pytest.approx([-1.0, 0.0])
    n = df.select(norm(F.col("u")).alias("n")).collect()
    assert all(r.n == pytest.approx(1.0) or r.n == 0.0 for r in n)


def test_ivfpq_residual_beats_plain_pq(spark, embeddings):
    """The point of residual encoding + refinement: recall@5 of the
    refined IVF+PQ tier must beat the plain seeded-PQ tier on the same
    corpus (audited 0.23 -> 0.46+ at sf0.1; asserted loosely here at
    sf0.001 to stay fast and stable)."""
    from mobilitydatalakebenchmark_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_index,
        ivfpq_refine_topk,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    probes = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )

    def hit_total(df):
        got = {}
        for r in df.select("probe_id", "vec_id").collect():
            got.setdefault(r.probe_id, set()).add(r.vec_id)
        return sum(len(got.get(p, set()) & t) for p, t in truth.items())

    truth = {}
    for r in brute_force_topk(embeddings, probes, k=5).collect():
        truth.setdefault(r.probe_id, set()).add(r.vec_id)

    cb = pq_codebook(embeddings, m_subspaces=4, dsub=16, n_codewords=8)
    plain = hit_total(
        pq_adc_topk(
            pq_encode(embeddings, cb, 4, 16), cb, probes, k=5,
            m_subspaces=4, dsub=16,
        )
    )
    codes, cents, cbr = ivfpq_index(
        embeddings, n_centroids=16, m_subspaces=8, dsub=8, n_codewords=256,
        pq_lloyd=1,
    )
    refined = hit_total(
        ivfpq_refine_topk(
            codes, cents, cbr, probes, embeddings, k=5, nprobe=4,
            shortlist=50, m_subspaces=8, dsub=8,
        )
    )
    assert refined > plain
    assert refined >= 15  # >= 0.3 recall at sf0.001 (measured 30)
