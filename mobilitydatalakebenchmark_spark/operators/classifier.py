"""fastText-style linear classifier INFERENCE at corpus scale.

The quality-classifier step most curation recipes approximate with
heuristics (the Gopher rules in operators/quality.py) is, in production
pipelines (GPT-3, PaLM, CCNet), a linear text classifier: hash every
token (and word-bigram, fastText's ``wordNgrams=2``) into a fixed
feature bucket, score = sum of the buckets' learned weights. At
inference time that is pure relational algebra — explode grams, hash to
buckets, broadcast-join the weight vector, sum per document — so a
trillion-token corpus scores in one linear pass with the weight table
(typically <= a few hundred thousand rows) broadcast to every executor.
No model runtime, no UDF; the "model" is a DataFrame.

Exactness: weights here are INTEGER (scaled fixed-point, the standard
quantized-inference trick), so per-doc scores are exact BIGINT sums —
no float aggregation order anywhere, which is what lets the oracle gate
compare scores value-for-value.

Scale: one explode (~2x corpus tokens), one broadcast hash join, one
map-side-combinable sum keyed by doc id. No shuffle grows beyond the
corpus token count; the weight table never shuffles at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket(gram, n_buckets: int, salt: str):
    """Deterministic md5-derived feature bucket (engine-portable: the
    DuckDB twin is CAST('0x'||substr(md5(salt||gram),1,8) AS BIGINT) %
    n_buckets)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), gram)), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def hashed_gram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    word_ngrams: int = 2,
    salt: str = "ft",
) -> DataFrame:
    """Explode each document into its hashed feature stream: unigrams
    plus (for ``word_ngrams=2``) word-bigrams joined by '_', fastText's
    input representation. Output: (id_col, bucket) — one row per gram
    occurrence (bag semantics: repeated grams score repeatedly, as in
    fastText's sum-of-embeddings)."""
    if word_ngrams not in (1, 2):
        raise ValueError("word_ngrams must be 1 or 2")
    toks = F.split(F.col(text_col), " ")
    grams = toks
    if word_ngrams == 2:
        # guard the empty case explicitly: Spark's sequence(1, 0) counts
        # DOWN (yields [1, 0]), it is not an empty range
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit("_"), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bigrams)
    return df.select(
        F.col(id_col), F.explode(grams).alias("gram")
    ).select(id_col, _bucket(F.col("gram"), n_buckets, salt).alias("bucket"))


def synthetic_hash_weights(
    spark: SparkSession,
    n_buckets: int = 4096,
    scale: int = 1000,
    salt: str = "ftw",
) -> DataFrame:
    """A deterministic stand-in weight vector: integer weights in
    [-scale, scale] derived from md5 of the bucket id. Real deployments
    replace this with trained weights loaded from parquet — the
    inference plan is identical (the classifier is just a (bucket,
    weight) table)."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % (2 * scale + 1)
            - scale
        ).alias("weight"),
    )


def linear_classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    word_ngrams: int = 2,
    bias: int = 0,
    salt: str = "ft",
) -> DataFrame:
    """Score every document with a broadcast linear model:
    score_scaled = bias + sum over gram occurrences of
    weight[hash(gram)]. ``weights`` is a (bucket long, weight long)
    table; buckets absent from it contribute 0 (a sparse model is a
    valid model). Output: (id_col, n_features, score_scaled,
    is_positive) — exact BIGINT score, classification at score > 0."""
    feats = hashed_gram_features(
        df, text_col, id_col, n_buckets, word_ngrams, salt
    )
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            (
                F.sum(F.coalesce(F.col("weight"), F.lit(0).cast("long")))
                + F.lit(bias)
            ).alias("score_scaled"),
        )
        .select(
            id_col,
            "n_features",
            "score_scaled",
            (F.col("score_scaled") > 0).alias("is_positive"),
        )
    )
