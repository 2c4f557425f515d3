"""fastText-style linear classifier inference (operators/classifier.py):
feature extraction, sparse-model semantics, and exact-score linearity."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.classifier import (
    hashed_gram_features,
    linear_classifier_scores,
    synthetic_hash_weights,
)

B = 64  # small bucket space for tests


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_feature_count_is_unigrams_plus_bigrams(spark):
    df = _docs(spark, ["a b c d", "solo"])
    n = {
        r.doc_id: r.n
        for r in hashed_gram_features(df, n_buckets=B)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert n == {0: 4 + 3, 1: 1}  # single-token doc: no bigrams, no [1,0]


def test_word_ngrams_1_drops_bigrams(spark):
    df = _docs(spark, ["a b c d"])
    n = hashed_gram_features(df, n_buckets=B, word_ngrams=1).count()
    assert n == 4


def test_scores_are_exact_and_order_free(spark):
    # score must equal the hand-computed sum of weights over grams
    df = _docs(spark, ["cat dog cat", "bird"])
    weights = synthetic_hash_weights(spark, n_buckets=B, scale=10, salt="w")
    wmap = {r.bucket: r.weight for r in weights.collect()}
    feats = hashed_gram_features(df, n_buckets=B, salt="s")
    expected = {}
    for r in feats.collect():
        expected[r.doc_id] = expected.get(r.doc_id, 0) + wmap[r.bucket]
    got = {
        r.doc_id: (r.score_scaled, r.n_features, r.is_positive)
        for r in linear_classifier_scores(
            df, weights, n_buckets=B, salt="s"
        ).collect()
    }
    assert got[0][0] == expected[0] and got[1][0] == expected[1]
    assert got[0][1] == 5 and got[1][1] == 1  # 3 uni + 2 bi; 1 uni
    assert got[0][2] == (expected[0] > 0)


def test_sparse_model_missing_buckets_score_zero(spark):
    # a weights table covering NO buckets -> every doc scores exactly bias
    df = _docs(spark, ["x y z"])
    empty = spark.createDataFrame([], "bucket long, weight long")
    got = linear_classifier_scores(
        df, empty, n_buckets=B, bias=7
    ).collect()[0]
    assert (got.score_scaled, got.is_positive) == (7, True)


def test_repeated_grams_score_repeatedly(spark):
    # bag semantics: "w w w" = 3x weight(w) + 2x weight(w_w)
    df = _docs(spark, ["w w w", "w"])
    weights = synthetic_hash_weights(spark, n_buckets=B, scale=10, salt="w")
    wmap = {r.bucket: r.weight for r in weights.collect()}
    feats = {
        (r.doc_id, r.bucket)
        for r in hashed_gram_features(df, n_buckets=B, salt="s")
        .select("doc_id", "bucket")
        .distinct()
        .collect()
    }
    uni = next(b for d, b in feats if d == 1)
    bi = next(b for d, b in feats if d == 0 and b != uni) if any(
        d == 0 and b != uni for d, b in feats
    ) else uni
    got = {
        r.doc_id: r.score_scaled
        for r in linear_classifier_scores(
            df, weights, n_buckets=B, salt="s"
        ).collect()
    }
    assert got[0] == 3 * wmap[uni] + 2 * wmap[bi]
    assert got[1] == wmap[uni]
