"""Text-analysis & deduplication gate queries over the documents table
(BASELINE.json north star: LLM-data-pipeline operators as first-class).

Operators: token counting, quality scoring, language distribution, exact
dedup (hash-groupBy), n-gram Jaccard near-dup, MinHash signatures + LSH
banding, document fingerprinting. All are pure column expressions (no
Python UDFs) so they scale JVM-side; the DuckDB twins prove semantics.

Scale posture: token pipelines are per-row transforms (no shuffle); dedup
group-bys shuffle on a hash key (uniformly distributed by construction);
the LSH band join replaces the O(n²) pair scan with a bucketed equi-join —
the only strategy that survives 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import register
from .relational import t

# token split: documents.text is space-separated lowercase words
_SPLIT = " "


def tokens(col: Column) -> Column:
    return F.split(col, _SPLIT)


@register(
    "text_stats",
    oracle="""
SELECT doc_id,
       length(text) AS chars,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       round((length(text) - length(replace(text, ' ', '')) + 1.0)
             / greatest(len(list_distinct(string_split(text, ' '))), 1), 4)
           AS repetition_ratio
FROM documents ORDER BY doc_id
""",
    doc="token counting + repetition quality signal (whitespace tokenizer)",
    tags=("text",),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    ).alias("n_tokens")
    n_distinct = F.size(F.array_distinct(tokens(F.col("text"))))
    return d.select(
        "doc_id",
        F.length("text").alias("chars"),
        n_tokens,
        n_distinct.alias("n_distinct_tokens"),
        F.round(
            (F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1.0)
            / F.greatest(n_distinct, F.lit(1)),
            4,
        ).alias("repetition_ratio"),
    ).orderBy("doc_id")


@register(
    "text_lang_distribution",
    oracle="""
SELECT lang, source, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
""",
    doc="language/source profile of the corpus (language-ID aggregation target)",
    tags=("text",),
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "dedup_exact_hash",
    oracle="""
SELECT text_hash, count(*) AS n_copies,
       min(doc_id) AS keeper_doc_id
FROM (SELECT doc_id, md5(text) AS text_hash FROM documents)
GROUP BY text_hash HAVING count(*) > 1
ORDER BY text_hash
""",
    doc="exact dedup: hash-groupBy on md5(text); keeper = min doc_id "
    "(first-seen semantics, same as reference A9)",
    tags=("text", "dedup"),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
        .orderBy("text_hash")
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.tok, b.tok)) AS n_common,
         len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok)) AS n_union
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
)
SELECT doc_a, doc_b, n_common,
       round(cast(n_common AS DOUBLE) / n_union, 4) AS jaccard
FROM pairs WHERE cast(n_common AS DOUBLE) / n_union > 0.3
ORDER BY doc_a
""",
    doc="token-set Jaccard similarity on adjacent doc pairs (near-dup "
    "candidate scoring); full-corpus pairing goes through MinHash-LSH below",
    tags=("text", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents", heavy=True).select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("tok")
    )
    a = d.alias("a")
    b = d.alias("b")
    n_common = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok")))
    n_union = F.size(F.col("a.tok")) + F.size(F.col("b.tok")) - n_common
    jac = n_common.cast("double") / n_union
    # filter on the RAW jaccard (the oracle does too); rounding happens
    # only in the projected output — a boundary value like 0.30004 must
    # survive the filter on both engines
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(jac > 0.3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            n_common.alias("n_common"),
            F.round(jac, 4).alias("jaccard"),
        )
        .orderBy("doc_a")
    )


# MinHash over 3-token SHINGLES (not bare tokens): the synthetic corpus
# shares a small vocabulary, so token-set Jaccard between unrelated docs is
# ~0.5+ and token-level LSH degenerates to a near-quadratic candidate set
# (measured: 62% of all pairs at sf0.1). Shingle sets are near-disjoint for
# unrelated docs — the textbook shingle->minhash->band construction.
#
# Hash budget: ONE md5 per shingle; the 32-hex digest is sliced into four
# independent 8-hex hashes (operators/dedup.minhash_signatures). Band key =
# md5(concat of the band's two elements). md5 is bit-stable across engines.

# shared oracle prefix: shingles -> per-shingle md5 -> sliced signature -> bands
_MINHASH_SQL_PREFIX = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), toks AS (
  SELECT doc_id, list_distinct(list_transform(
      generate_series(1, greatest(len(w) - 2, 1)),
      i -> array_to_string(w[i:i+2], ' '))) AS tok
  FROM words
), hashed AS (
  SELECT doc_id, tok, list_transform(tok, x -> md5('g0' || x)) AS hs FROM toks
), sig AS (
  SELECT doc_id, tok,
         list_aggregate(list_transform(hs, h -> substr(h, 1, 8)), 'min')  AS mh_0,
         list_aggregate(list_transform(hs, h -> substr(h, 9, 8)), 'min')  AS mh_1,
         list_aggregate(list_transform(hs, h -> substr(h, 17, 8)), 'min') AS mh_2,
         list_aggregate(list_transform(hs, h -> substr(h, 25, 8)), 'min') AS mh_3
  FROM hashed
), banded AS (
  SELECT doc_id, tok, mh_0, mh_1, mh_2, mh_3,
         md5(concat(mh_0, mh_1)) AS band_0,
         md5(concat(mh_2, mh_3)) AS band_1
  FROM sig
)
"""


def _shingles3(text: Column) -> Column:
    from ..operators.dedup import shingles

    return shingles(text, 3)


def _doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the `banded` CTE, via the operator library."""
    from ..operators.dedup import lsh_band_keys, minhash_signatures

    d = t(spark, sf_dir, "documents", heavy=True)
    sig = minhash_signatures(d, n_hashes=4, shingle_n=3)
    return sig, lsh_band_keys(sig, bands=2)


@register(
    "dedup_minhash_signatures",
    oracle=_MINHASH_SQL_PREFIX
    + "SELECT doc_id, mh_0, mh_1, mh_2, mh_3, band_0, band_1 FROM banded ORDER BY doc_id",
    doc="MinHash signature (4 sliced hashes) + 2 LSH band keys per document "
    "(shingle->minhash->band; bucket-join finds candidates at any scale)",
    tags=("text", "dedup", "minhash"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig, _ = _doc_signatures(spark, sf_dir)
    return sig.select(
        "doc_id",
        "mh_0",
        "mh_1",
        "mh_2",
        "mh_3",
        F.md5(F.concat("mh_0", "mh_1")).alias("band_0"),
        F.md5(F.concat("mh_2", "mh_3")).alias("band_1"),
    ).orderBy("doc_id")


@register(
    "dedup_minhash_lsh_candidates",
    oracle=_MINHASH_SQL_PREFIX
    + """, bands AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_hash FROM banded
  UNION ALL
  SELECT doc_id, 1 AS band_idx, band_1 AS band_hash FROM banded
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
""",
    doc="LSH candidate pairs: explode band keys, self-equi-join on "
    "(band_idx, band_hash) — linear in corpus size, no O(n²) pair scan",
    tags=("text", "dedup", "minhash"),
)
def dedup_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import lsh_candidate_pairs

    _, bands = _doc_signatures(spark, sf_dir)
    return lsh_candidate_pairs(bands).orderBy("doc_a", "doc_b")


@register(
    "dedup_minhash_verified",
    oracle=_MINHASH_SQL_PREFIX
    + """, bands AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_hash FROM banded
  UNION ALL
  SELECT doc_id, 1 AS band_idx, band_1 AS band_hash FROM banded
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(cast(len(list_intersect(ta.tok, tb.tok)) AS DOUBLE)
             / (len(ta.tok) + len(tb.tok) - len(list_intersect(ta.tok, tb.tok))), 4)
           AS jaccard
FROM cands c JOIN toks ta ON ta.doc_id = c.doc_a JOIN toks tb ON tb.doc_id = c.doc_b
WHERE cast(len(list_intersect(ta.tok, tb.tok)) AS DOUBLE)
      / (len(ta.tok) + len(tb.tok) - len(list_intersect(ta.tok, tb.tok))) >= 0.5
ORDER BY doc_a, doc_b
""",
    doc="full MinHash-LSH near-dup pipeline: candidates from band join, "
    "exact Jaccard verification of candidates only (never O(n²))",
    tags=("text", "dedup", "minhash"),
)
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_near_duplicates

    d = t(spark, sf_dir, "documents", heavy=True)
    out = minhash_near_duplicates(
        d, n_hashes=4, bands=2, min_jaccard=0.5, shingle_n=3
    )
    return out.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS fingerprint
FROM documents ORDER BY doc_id
""",
    doc="document fingerprint: md5 over the sorted distinct token set "
    "(order-insensitive content identity)",
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents", heavy=True)
    return d.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " ")
        ).alias("fingerprint"),
    ).orderBy("doc_id")


@register(
    "text_token_topk",
    oracle="""
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) GROUP BY token ORDER BY n DESC, token LIMIT 20
""",
    doc="corpus token frequency top-k (explode + groupBy; the BPE-ish "
    "vocabulary-building primitive)",
    tags=("text",),
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "text_langid",
    oracle="""
WITH scored AS (
  SELECT doc_id,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')),
             ['the','and','of','to','in','is','that','it','for','with'])) AS s_en,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')),
             ['le','la','les','de','des','et','un','une','est','que'])) AS s_fr,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')),
             ['der','die','das','und','ist','ein','eine','nicht','mit','zu'])) AS s_de,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')),
             ['el','la','los','las','de','y','un','una','es','que'])) AS s_es,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')),
             ['de5','shi4','le5','zai4','you3','wo3','ta1','zhe4','bu4','ren2'])) AS s_zh
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_fr, s_de, s_es, s_zh) = 0 THEN 'und'
            WHEN s_zh >= greatest(s_en, s_fr, s_de, s_es) THEN 'zh'
            WHEN s_fr >= greatest(s_en, s_de, s_es) THEN 'fr'
            WHEN s_es >= greatest(s_en, s_de) THEN 'es'
            WHEN s_en >= s_de THEN 'en'
            ELSE 'de' END AS detected_lang
FROM scored ORDER BY doc_id
""",
    doc="heuristic stopword/n-gram language ID (argmax over marker-word "
    "hits; ties break to the alphabetically-last code on both engines)",
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import detect_language

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", detect_language(F.col("text")).alias("detected_lang")
    ).orderBy("doc_id")


@register(
    "dedup_simhash",
    # Value-checkable twin for an engine-specific hash (same trick as
    # sketch_percentiles / knn_ivf): the xxhash64 fingerprint value is
    # Spark-only, but (a) the distinct-token count the fingerprint votes
    # over is oracle-computable exactly, and (b) simhash's defining
    # LOCALITY property — perturbing a doc by one token moves the
    # fingerprint by few bits — is a deterministic in-plan claim. The plan
    # computes simhash(text) and simhash(text + one unseen token) and
    # emits "hamming shift <= 32 of 64" (measured max 14, mean ~5.9 across
    # sf0.001-0.1; a non-local hash would sit at ~32 with half the docs
    # above). The fingerprint VALUES are exercised by the fully
    # value-checked dedup_simhash_md5 twin.
    oracle="""
SELECT doc_id,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       TRUE AS locality_ok
FROM documents WHERE doc_id < 200 ORDER BY doc_id
""",
    doc="64-bit SimHash fingerprints (xxhash64, operators/dedup.py), "
    "verified in-plan via the one-token-perturbation locality bound",
    tags=("text", "dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hamming_distance, simhash

    d = t(spark, sf_dir, "documents", heavy=True).filter(F.col("doc_id") < 200)
    shift = hamming_distance(
        simhash(F.col("text")), simhash(F.concat(F.col("text"), F.lit(" zzqxv")))
    )
    return d.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " "))).alias("n_distinct_tokens"),
        (shift <= 32).alias("locality_ok"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle="""
SELECT doc_id,
       round(least(1.0, (length(text) - length(replace(text, ' ', '')) + 1) / 200.0)
             * (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / (length(text) - length(replace(text, ' ', '')) + 1)), 4)
           AS quality
FROM documents WHERE doc_id < 100 ORDER BY doc_id
""",
    doc="quality scoring: length saturation x lexical diversity "
    "(stopword/punct ratios are trivial variants of the same shape)",
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    n_tokens = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    n_distinct = F.size(F.array_distinct(tokens(F.col("text"))))
    quality = F.least(F.lit(1.0), n_tokens / 200.0) * (
        n_distinct.cast("double") / n_tokens
    )
    return d.select("doc_id", F.round(quality, 4).alias("quality")).orderBy("doc_id")


@register(
    "dedup_simhash_md5",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok FROM documents
), hashed AS (
  SELECT doc_id, list_transform(tok, x -> substr(md5(x), 1, 4)) AS hs FROM toks
), votes AS (
  SELECT doc_id, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) // 1) % 2) - 1)) AS v0, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) // 2) % 2) - 1)) AS v1, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) // 4) % 2) - 1)) AS v2, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) // 8) % 2) - 1)) AS v3, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 2, 1)) - 1) // 1) % 2) - 1)) AS v4, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 2, 1)) - 1) // 2) % 2) - 1)) AS v5, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 2, 1)) - 1) // 4) % 2) - 1)) AS v6, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 2, 1)) - 1) // 8) % 2) - 1)) AS v7, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) // 1) % 2) - 1)) AS v8, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) // 2) % 2) - 1)) AS v9, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) // 4) % 2) - 1)) AS v10, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) // 8) % 2) - 1)) AS v11, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) // 1) % 2) - 1)) AS v12, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) // 2) % 2) - 1)) AS v13, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) // 4) % 2) - 1)) AS v14, list_sum(list_transform(hs, h -> 2 * (((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) // 8) % 2) - 1)) AS v15 FROM hashed
)
SELECT doc_id, cast((CASE WHEN v0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN v1 > 0 THEN 2 ELSE 0 END) + (CASE WHEN v2 > 0 THEN 4 ELSE 0 END) + (CASE WHEN v3 > 0 THEN 8 ELSE 0 END) + (CASE WHEN v4 > 0 THEN 16 ELSE 0 END) + (CASE WHEN v5 > 0 THEN 32 ELSE 0 END) + (CASE WHEN v6 > 0 THEN 64 ELSE 0 END) + (CASE WHEN v7 > 0 THEN 128 ELSE 0 END) + (CASE WHEN v8 > 0 THEN 256 ELSE 0 END) + (CASE WHEN v9 > 0 THEN 512 ELSE 0 END) + (CASE WHEN v10 > 0 THEN 1024 ELSE 0 END) + (CASE WHEN v11 > 0 THEN 2048 ELSE 0 END) + (CASE WHEN v12 > 0 THEN 4096 ELSE 0 END) + (CASE WHEN v13 > 0 THEN 8192 ELSE 0 END) + (CASE WHEN v14 > 0 THEN 16384 ELSE 0 END) + (CASE WHEN v15 > 0 THEN 32768 ELSE 0 END) AS BIGINT) AS simhash16 FROM votes ORDER BY doc_id
""",
    doc="cross-engine 16-bit SimHash: per-token md5 nibbles vote per bit "
    "(the xxhash64 64-bit variant in operators/dedup.py is the fast path; "
    "this md5 construction is bit-stable on both engines, so the simhash "
    "family gets a value-checked gate too)",
    tags=("text", "dedup", "simhash"),
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents", heavy=True).select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("tok")
    )
    hashed = d.select(
        "doc_id", F.transform("tok", lambda x: F.substring(F.md5(x), 1, 4)).alias("hs")
    )

    def _vote(pos, shift):
        return lambda acc, h: acc + (
            (F.conv(F.substring(h, pos, 1), 16, 10).cast("int") / (2 ** shift))
            .cast("int") % 2
        ) * 2 - 1

    fp = F.lit(0).cast("long")
    for i in range(16):
        vote = F.aggregate(F.col("hs"), F.lit(0), _vote(i // 4 + 1, i % 4))
        fp = fp + F.when(vote > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return hashed.select("doc_id", fp.alias("simhash16")).orderBy("doc_id")


@register(
    "dedup_drop_near_duplicates",
    oracle=_MINHASH_SQL_PREFIX
    + """, bands AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_hash FROM banded
  UNION ALL
  SELECT doc_id, 1 AS band_idx, band_1 AS band_hash FROM banded
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), edges AS (
  SELECT c.doc_a, c.doc_b
  FROM cands c JOIN toks ta ON ta.doc_id = c.doc_a JOIN toks tb ON tb.doc_id = c.doc_b
  WHERE cast(len(list_intersect(ta.tok, tb.tok)) AS DOUBLE)
        / (len(ta.tok) + len(tb.tok) - len(list_intersect(ta.tok, tb.tok))) >= 0.5
), sym AS (
  SELECT doc_a AS u, doc_b AS v FROM edges
  UNION ALL SELECT doc_b AS u, doc_a AS v FROM edges
), reach AS (
  -- transitive closure by recursive reachability; min reachable id = component
  WITH RECURSIVE walk(node, r) AS (
    SELECT u, u FROM sym
    UNION
    SELECT s.v, walk.r FROM walk JOIN sym s ON s.u = walk.node
  )
  SELECT node, min(r) AS component FROM walk GROUP BY node
), losers AS (
  SELECT node AS doc_id FROM reach WHERE node != component
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY d.doc_id
""",
    doc="end-to-end near-dup REMOVAL: MinHash-LSH pairs -> transitive "
    "closure (iterative min-label propagation, operators/components.py) -> "
    "min-id keeper per cluster. DuckDB twin closes the graph with a "
    "recursive CTE — the iterative-algorithm gate.",
    tags=("text", "dedup", "minhash", "iterative"),
)
def dedup_drop_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import drop_near_duplicates
    from ..operators.dedup import minhash_near_duplicates

    d = t(spark, sf_dir, "documents", heavy=True)
    pairs = minhash_near_duplicates(
        d, n_hashes=4, bands=2, min_jaccard=0.5, shingle_n=3
    )
    return drop_near_duplicates(d, pairs).select("doc_id").orderBy("doc_id")


@register(
    "dedup_edit_distance",
    oracle="""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS edit_dist
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) < 55
ORDER BY doc_a
""",
    doc="edit-distance near-dup scoring on adjacent doc prefixes "
    "(levenshtein is quadratic per pair — prefix-bounded, and only ever "
    "run on candidate pairs at scale)",
    tags=("text", "dedup"),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents", heavy=True).select(
        "doc_id", F.substring("text", 1, 80).alias("prefix")
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(dist < 55)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
        .orderBy("doc_a")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline additions: repetition quality, TF-IDF, and
# deterministic hash sampling/splits. All pure expressions / two-stage
# aggregations — the shapes that survive a 100 TB corpus.
# ---------------------------------------------------------------------------


@register(
    "text_repetition_dup_ngrams",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, list_transform(
      generate_series(1, greatest(len(w) - 4, 1)),
      i -> array_to_string(w[i:i+4], ' ')) AS g
  FROM words
)
SELECT doc_id, len(g) AS n_grams,
       len(list_distinct(g)) AS n_distinct_grams,
       round(1.0 - cast(len(list_distinct(g)) AS DOUBLE) / len(g), 4)
           AS dup_fraction
FROM grams ORDER BY doc_id
""",
    doc="Gopher-style repetition signal: fraction of word 5-gram "
    "occurrences that repeat within the document (per-row expression, "
    "no shuffle)",
    tags=("text", "quality"),
)
def text_repetition_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import duplicate_ngram_fraction, raw_ngrams

    d = t(spark, sf_dir, "documents", heavy=True)
    g = raw_ngrams(F.col("text"), 5)
    return d.select(
        "doc_id",
        F.size(g).alias("n_grams"),
        F.size(F.array_distinct(g)).alias("n_distinct_grams"),
        duplicate_ngram_fraction(F.col("text"), 5).alias("dup_fraction"),
    ).orderBy("doc_id")


@register(
    "text_df_idf",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), dfreq AS (
  SELECT token, count(*) AS df FROM toks GROUP BY token
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT token, df, round(ln(cast(n_docs AS DOUBLE) / df), 4) AS idf
FROM dfreq, n
ORDER BY df DESC, token LIMIT 30
""",
    doc="corpus document-frequency + IDF per token (two-stage agg; corpus "
    "size broadcast as a single-row cross join — the vocabulary-weighting "
    "primitive for TF-IDF and rare-token filters)",
    tags=("text",),
)
def text_df_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import idf_table

    d = t(spark, sf_dir, "documents")
    return idf_table(d).orderBy(F.desc("df"), F.asc("token")).limit(30)


@register(
    "text_tfidf_keywords",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM words GROUP BY doc_id, token
), dlen AS (
  SELECT doc_id, count(*) AS n_tok FROM words GROUP BY doc_id
), dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM words GROUP BY token
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round((cast(tf AS DOUBLE) / n_tok)
               * ln(cast(n_docs AS DOUBLE) / df), 4) AS tfidf
  FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (token), n
), ranked AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tfidf FROM ranked
WHERE rk <= 3 AND doc_id < 100
ORDER BY doc_id, tfidf DESC, token
""",
    doc="per-document top-3 TF-IDF keywords (tf and df aggs + broadcast "
    "joins + per-doc rank window; ranking on the ROUNDED score so the "
    "cross-engine order is identical, token tiebreak)",
    tags=("text",),
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    # df and n_docs are corpus-wide by definition; tf, doc length and the
    # per-doc rank only matter for the doc_id < 100 slice — push that
    # filter below the explode so the heavy aggs scan 100 docs, not all
    words_out = d.filter(F.col("doc_id") < 100).select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    tf = words_out.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dlen = words_out.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    dfreq = words.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dlen, "doc_id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("tf").cast("double") / F.col("n_tok"))
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "token")
    )


@register(
    "sample_hash_split",
    oracle="""
SELECT doc_id, source,
       CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 'train'
            WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e0' THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
""",
    doc="deterministic train/val/test split from the id's md5 first hex "
    "byte (75/12.5/12.5): stable under any repartitioning or re-run — "
    "unlike random splits, membership is a pure function of the id",
    tags=("text", "sampling"),
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import hash_split

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "source", hash_split(F.col("doc_id")).alias("split")
    ).orderBy("doc_id")


@register(
    "sample_deterministic_strata",
    oracle="""
SELECT source, count(*) AS n_sampled, min(doc_id) AS first_doc
FROM documents
WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < '34'
GROUP BY source ORDER BY source
""",
    doc="deterministic ~20% sample (md5 hex byte < '34' = 52/256) with "
    "per-source stratum counts — reproducible corpus downsampling",
    tags=("text", "sampling"),
)
def sample_deterministic_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import deterministic_sample

    d = t(spark, sf_dir, "documents")
    return (
        deterministic_sample(d, "doc_id", "34")
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"), F.min("doc_id").alias("first_doc"))
        .orderBy("source")
    )


@register(
    "pack_sequences_contiguous",
    oracle="""
WITH sized AS (
  SELECT source, doc_id, md5(cast(doc_id AS VARCHAR)) AS h,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), placed AS (
  SELECT source, doc_id, n_tokens,
         row_number() OVER w AS pack_order,
         cast(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset,
         cast(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) - 1
              AS BIGINT) AS last_offset
  FROM sized WINDOW w AS (PARTITION BY source ORDER BY h, doc_id)
)
SELECT source, doc_id, n_tokens, pack_order, start_offset,
       start_offset // 512 AS start_bin,
       last_offset // 512  AS end_bin
FROM placed ORDER BY source, pack_order
""",
    doc="contiguous sequence packing per training shard: docs laid "
    "end-to-end in deterministic md5(id) order, chunked at 512 tokens "
    "(shard-partitioned running offset — no global sort; docs straddling "
    "a boundary report start_bin != end_bin)",
    tags=("text", "packing"),
)
def pack_sequences_contiguous(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import pack_sequences

    d = t(spark, sf_dir, "documents")
    return pack_sequences(d, capacity=512).select(
        "source",
        "doc_id",
        "n_tokens",
        "pack_order",
        "start_offset",
        "start_bin",
        "end_bin",
    ).orderBy("source", "pack_order")


@register(
    "contamination_check",
    oracle="""
WITH split AS (
  SELECT doc_id, text,
         CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 'train'
              WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e0' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), sh AS (
  SELECT doc_id, split, unnest(list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
      i -> array_to_string((string_split(text, ' '))[i:i+4], ' ')))) AS shingle
  FROM split
)
SELECT e.doc_id AS test_doc, e.split,
       count(DISTINCT e.shingle) AS n_shared_shingles,
       count(DISTINCT tr.doc_id) AS n_train_docs
FROM sh e JOIN sh tr ON tr.shingle = e.shingle AND tr.split = 'train'
WHERE e.split != 'train'
GROUP BY e.doc_id, e.split
ORDER BY test_doc
""",
    doc="train/eval contamination scan: eval docs sharing any 5-token "
    "shingle with a training doc (hash split -> shingle equi-join; the "
    "linear-scale alternative to pairwise comparison)",
    tags=("text", "dedup", "sampling"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import contamination, hash_split

    d = t(spark, sf_dir, "documents", heavy=True).withColumn(
        "split", hash_split(F.col("doc_id"))
    )
    return (
        contamination(d, shingle_n=5)
        .select("test_doc", F.col("split"), "n_shared_shingles", "n_train_docs")
        .orderBy("test_doc")
    )


# -- PII scrubbing (operators/pii.py). The synthetic documents contain no
# real PII, so each gate decorates the text DETERMINISTICALLY from doc_id —
# the identical construction in Spark and DuckDB — and then runs genuine
# regex detection/masking on the result. Pattern literals are shared via
# PII_PATTERNS (Java-regex/RE2 common subset).

_PII_DECOR_SQL = """
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' id 078-05-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         AS text
  FROM documents
"""


def _pii_decorated(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    did.cast("string"),
                    F.lit("@mail.example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 4 == 0,
                F.concat(
                    F.lit(" call 415-555-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (did % 256).cast("string"),
                    F.lit("."),
                    ((did * 7) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" id 078-05-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def _pii_oracle_counts() -> str:
    from ..operators.pii import PII_PATTERNS

    cols = ",\n       ".join(
        f"cast(sum(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    return f"""
WITH decorated AS ({_PII_DECOR_SQL})
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN len(regexp_extract_all(text, '{PII_PATTERNS["email"]}')) > 0
                  OR len(regexp_extract_all(text, '{PII_PATTERNS["ssn"]}')) > 0
                  OR len(regexp_extract_all(text, '{PII_PATTERNS["phone"]}')) > 0
                  OR len(regexp_extract_all(text, '{PII_PATTERNS["ipv4"]}')) > 0
             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       {cols}
FROM decorated GROUP BY source ORDER BY source
"""


@register(
    "pii_detect_counts",
    oracle=None,  # set below — needs PII_PATTERNS at import time
    doc="PII detection rollup: per-source document counts + per-category "
    "match totals over deterministically decorated text (pure regexp_count "
    "expressions — zero-shuffle per-row scan + one combinable aggregate)",
    tags=("text", "pii"),
)
def pii_detect_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pii import PII_PATTERNS, detect_pii

    prof = detect_pii(_pii_decorated(spark, sf_dir), "text")
    aggs = [F.count("*").alias("n_docs"),
            F.sum(F.col("has_pii").cast("int")).cast("long").alias("n_docs_with_pii")]
    aggs += [
        F.sum(f"pii_{name}").cast("long").alias(f"n_{name}") for name in PII_PATTERNS
    ]
    return prof.groupBy("source").agg(*aggs).orderBy("source")


# patch the oracle in after definition (needs the pattern dict)
from . import REGISTRY as _REG  # noqa: E402

_REG["pii_detect_counts"].oracle = _pii_oracle_counts()


def _pii_oracle_scrub() -> str:
    from ..operators.pii import PII_PATTERNS

    masked = "text"
    for name, pat in PII_PATTERNS.items():
        masked = f"regexp_replace({masked}, '{pat}', '[{name.upper()}]', 'g')"
    residual = " + ".join(
        f"len(regexp_extract_all({masked}, '{pat}'))" for pat in PII_PATTERNS.values()
    )
    return f"""
WITH decorated AS ({_PII_DECOR_SQL})
SELECT doc_id,
       length({masked}) AS masked_len,
       cast(len(regexp_extract_all({masked}, '\\[(EMAIL|SSN|PHONE|IPV4)\\]')) AS BIGINT)
           AS n_redactions,
       cast({residual} AS BIGINT) AS n_residual_pii
FROM decorated ORDER BY doc_id
"""


@register(
    "pii_scrub_stats",
    oracle=None,
    doc="PII redaction: chained global regexp_replace masks every span; "
    "n_residual_pii must be 0 everywhere (the gate re-scans the masked "
    "text with the same patterns)",
    tags=("text", "pii"),
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pii import PII_PATTERNS, pii_counts, scrub_pii

    masked = scrub_pii(_pii_decorated(spark, sf_dir), "text")
    residual = None
    for c in pii_counts(F.col("text")):
        residual = c if residual is None else residual + c
    return masked.select(
        "doc_id",
        F.length("text").alias("masked_len"),
        F.regexp_count("text", F.lit(r"\[(EMAIL|SSN|PHONE|IPV4)\]"))
        .cast("long")
        .alias("n_redactions"),
        residual.cast("long").alias("n_residual_pii"),
    ).orderBy("doc_id")


_REG["pii_scrub_stats"].oracle = _pii_oracle_scrub()


@register(
    "url_domain_topk",
    oracle=f"""
WITH decorated AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0 THEN ' see https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/page/' || CAST(doc_id AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 9 = 0 THEN ' cdn http://static.cdn-host.net/a' || CAST(doc_id AS VARCHAR) ELSE '' END
         AS text
  FROM documents
), urls AS (
  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[a-z0-9.-]+')) AS url
  FROM decorated
)
SELECT regexp_extract(url, 'https?://([a-z0-9.-]+)', 1) AS domain,
       count(*) AS n_urls,
       count(DISTINCT doc_id) AS n_docs
FROM urls
GROUP BY domain
ORDER BY n_urls DESC, domain
LIMIT 10
""",
    doc="URL extraction + per-domain rollup (regexp_extract_all -> explode "
    "-> one aggregate; the crawl-curation 'top domains' profile)",
    tags=("text", "url"),
)
def url_domain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    decorated = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit(" see https://site"),
                    (did % 20).cast("string"),
                    F.lit(".example.com/page/"),
                    did.cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 9 == 0,
                F.concat(
                    F.lit(" cdn http://static.cdn-host.net/a"), did.cast("string")
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    urls = decorated.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(r"https?://[a-z0-9.-]+"), 0)
        ).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            F.regexp_extract("url", r"https?://([a-z0-9.-]+)", 1).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_urls"), "domain")
        .limit(10)
    )


@register(
    "text_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT cast(sum(c) AS DOUBLE) AS t FROM freq
)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       round(avg(log2(cast(freq.c AS DOUBLE) / tot.t)), 6) AS lm_logprob
FROM tok JOIN freq USING (token) CROSS JOIN tot
GROUP BY tok.doc_id
ORDER BY tok.doc_id
""",
    doc="per-doc mean unigram log2-prob under the corpus's own LM (cheap "
    "surprisal/quality filter; vocabulary-bounded broadcast join, never "
    "corpus-sized)",
    tags=("text", "quality"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import unigram_logprob

    return unigram_logprob(t(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "text_line_repetition",
    oracle=r"""
WITH decorated AS (
  SELECT doc_id,
         regexp_replace(text, '(\S+ \S+ \S+ \S+ \S+ \S+ \S+) ', '\1' || chr(10), 'g') AS text
  FROM documents
), lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM decorated
), per_line AS (
  SELECT doc_id, line, count(*) AS n FROM lines GROUP BY doc_id, line
)
SELECT doc_id,
       cast(sum(n) AS BIGINT) AS n_lines,
       round(1 - count(*) / cast(sum(n) AS DOUBLE), 6) AS frac_dup_lines,
       round(sum(CASE WHEN n > 1 THEN n * length(line) ELSE 0 END)
             / cast(greatest(sum(n * length(line)), 1) AS DOUBLE), 6)
           AS frac_chars_dup_lines,
       round(sum(CASE WHEN starts_with(line, '- ') THEN n ELSE 0 END)
             / cast(sum(n) AS DOUBLE), 6) AS frac_bullet_lines,
       round(sum(CASE WHEN line LIKE '%...' THEN n ELSE 0 END)
             / cast(sum(n) AS DOUBLE), 6) AS frac_ellipsis_lines
FROM per_line GROUP BY doc_id ORDER BY doc_id
""",
    doc="Gopher-style line-repetition filter signals (dup-line and "
    "dup-char fractions over text re-lined every 7 tokens — boilerplate "
    "detection; two combinable aggregates, linear in line count)",
    tags=("text", "quality"),
)
def text_line_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import line_stats

    d = t(spark, sf_dir, "documents")
    # re-line the single-line synthetic docs deterministically: newline
    # after every 7th token (identical construction in the DuckDB oracle;
    # Java regex uses $1 where RE2 uses \1 — same output)
    decorated = d.select(
        "doc_id",
        F.regexp_replace(
            "text", r"(\S+ \S+ \S+ \S+ \S+ \S+ \S+) ", "$1\n"
        ).alias("text"),
    )
    return line_stats(decorated).orderBy("doc_id")


_MIX_WEIGHTS = {"en": 0.5, "fr": 1.0, "de": 0.25, "es": 0.75, "zh": 0.125}


def _mix_oracle() -> str:
    def hex4(p: float) -> str:
        q = int(p * 65536)
        return "g" if q >= 65536 else format(max(0, q), "04x")

    cases = "\n         ".join(
        f"WHEN lang = '{s}' THEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) < '{hex4(p)}'"
        for s, p in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH kept AS (
  SELECT * FROM documents
  WHERE CASE {cases}
        ELSE FALSE END
)
SELECT lang, count(*) AS n_kept,
       cast(sum(n_chars) AS BIGINT) AS kept_chars
FROM kept GROUP BY lang ORDER BY lang
"""


@register(
    "sample_corpus_mixture",
    oracle=None,
    doc="deterministic data-mixing downsample (per-language keep "
    "probabilities via md5-prefix thresholds — reproducible across "
    "engines/partitionings; zero-shuffle filter + one rollup)",
    tags=("text", "sampling"),
)
def sample_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import mixture_sample

    kept = mixture_sample(t(spark, sf_dir, "documents"), _MIX_WEIGHTS, "lang")
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("lang")
    )


_REG["sample_corpus_mixture"].oracle = _mix_oracle()


@register(
    "dedup_shared_passages",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), ps AS (
  SELECT doc_id, i AS pos, md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM tok, LATERAL unnest(generate_series(1, len(toks) - 7)) AS t(i)
), rep AS (
  SELECT h FROM ps GROUP BY h
  HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000
), m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
         a.pos - b.pos AS diag
  FROM ps a JOIN rep USING (h) JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id
), isl AS (
  SELECT doc_a, doc_b, diag,
         pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                    ORDER BY pos_a) AS island
  FROM m
), runs AS (
  SELECT doc_a, doc_b, diag, island, count(*) AS run_shingles
  FROM isl GROUP BY doc_a, doc_b, diag, island
), agg_long AS (
  SELECT doc_a, doc_b,
         CAST(max(run_shingles) + 7 AS BIGINT) AS longest_run_tokens
  FROM runs GROUP BY doc_a, doc_b
), agg_cov AS (
  SELECT doc_a, doc_b,
         CAST(count(DISTINCT pos_a) AS BIGINT) AS n_shared_shingles
  FROM m GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, longest_run_tokens, n_shared_shingles
FROM agg_long JOIN agg_cov USING (doc_a, doc_b)
ORDER BY doc_a, doc_b
""",
    doc="passage-level duplication: longest contiguous shared 8-token runs "
    "per doc pair (positional shingle hashes -> repeated-hash gate with a "
    "max_df=1000 stop-shingle cap against hot-key quadratic fan-out -> "
    "diagonal gaps-and-islands; linear in match count, never all-pairs)",
    tags=("text", "dedup"),
)
def dedup_shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shared_passages

    return (
        shared_passages(t(spark, sf_dir, "documents", heavy=True), shingle_n=8, max_df=1000)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Exact substring-level duplicate spans (operators/dedup.duplicate_spans —
# the ExactSubstr policy of Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): every maximal token run duplicated
# anywhere in the corpus, per document, with a min-length cut. Unlike
# dedup_shared_passages this never forms doc PAIRS — positions are marked
# through a global shingle-frequency table, so the plan is linear in
# corpus tokens with no max_df cap needed. All-integer output.
# ---------------------------------------------------------------------------

_SS_N = 8           # shingle width (span boundary resolution)
_SS_MIN_LEN = 12    # minimum duplicate-span length to report, in tokens


@register(
    "dedup_substring_spans",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), ps AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(toks[i:i+{_SS_N - 1}], ' ')) AS h
  FROM tok, LATERAL unnest(generate_series(1, len(toks) - {_SS_N - 1}))
           AS t(i)
), rep AS (
  SELECT h FROM ps GROUP BY h HAVING count(*) >= 2
), m AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             AS island
  FROM ps WHERE h IN (SELECT h FROM rep)
), sp AS (
  SELECT doc_id,
         CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + {_SS_N - 1} AS BIGINT) AS span_end
  FROM m GROUP BY doc_id, island
)
SELECT doc_id, span_start, span_end,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
FROM sp WHERE span_end - span_start + 1 >= {_SS_MIN_LEN}
ORDER BY doc_id, span_start
""",
    doc="exact substring-level duplicate spans (operators/dedup."
    "duplicate_spans — ExactSubstr of Lee et al. 2022 re-expressed "
    "Spark-first): positional 8-token shingle hashes -> global "
    "occurrence count (within-doc repeats included) -> marked-position "
    "gaps-and-islands per doc -> maximal duplicated runs >= 12 tokens; "
    "no pair join anywhere, linear in corpus tokens, exact integer "
    "token positions",
    tags=("text", "dedup"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicate_spans

    return duplicate_spans(
        t(spark, sf_dir, "documents", heavy=True),
        shingle_n=_SS_N,
        min_len_tokens=_SS_MIN_LEN,
        min_occurrences=2,
    ).orderBy("doc_id", "span_start")


@register(
    "dedup_substring_removal",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), ps AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(toks[i:i+{_SS_N - 1}], ' ')) AS h
  FROM tok, LATERAL unnest(generate_series(1, len(toks) - {_SS_N - 1}))
           AS t(i)
), rep AS (
  SELECT h FROM ps GROUP BY h HAVING count(*) >= 2
), m AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             AS island
  FROM ps WHERE h IN (SELECT h FROM rep)
), sp AS (
  SELECT doc_id,
         CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + {_SS_N - 1} AS BIGINT) AS span_end
  FROM m GROUP BY doc_id, island
  HAVING max(pos) + {_SS_N - 1} - min(pos) + 1 >= {_SS_MIN_LEN}
), spg AS (
  SELECT doc_id, span_start, span_end,
         CASE WHEN max(span_end) OVER (
                PARTITION BY doc_id ORDER BY span_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR span_start > max(span_end) OVER (
                PARTITION BY doc_id ORDER BY span_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS ni
  FROM sp
), isl AS (
  SELECT doc_id, span_start, span_end,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY span_start
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM spg
), merged AS (
  SELECT doc_id, min(span_start) AS s, max(span_end) AS e
  FROM isl GROUP BY doc_id, island
), dup AS (
  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
  FROM merged GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(len(toks) - coalesce(dup_tokens, 0) AS BIGINT) AS kept_tokens
FROM tok t LEFT JOIN dup USING (doc_id) ORDER BY doc_id
""",
    doc="the APPLICATION half of exact-substring dedup: the reported "
    "duplicate spans (dedup_substring_spans) merge into per-doc interval "
    "unions (operators/timeseries.coalesce_intervals — overlapping spans "
    "must not double-count) and every document reports its exact "
    "n/dup/kept token budget — the 'how much survives the ExactSubstr "
    "cut' accounting a curation pipeline runs before committing to the "
    "removal; one extra doc-keyed window over the spans table, all "
    "integer token arithmetic",
    tags=("text", "dedup", "curation"),
)
def dedup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicate_spans
    from ..operators.timeseries import coalesce_intervals

    d = t(spark, sf_dir, "documents", heavy=True)
    spans = duplicate_spans(
        d, shingle_n=_SS_N, min_len_tokens=_SS_MIN_LEN, min_occurrences=2
    )
    merged = coalesce_intervals(spans, "doc_id", "span_start", "span_end")
    dup = merged.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens")
    )
    toks = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return (
        toks.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            (
                F.col("n_tokens")
                - F.coalesce(F.col("dup_tokens"), F.lit(0))
            ).cast("long").alias("kept_tokens"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round 4: chunking, Zipf corpus stats, CCNet-style perplexity buckets.
# ---------------------------------------------------------------------------

_CHUNK_W = 120  # chunk window (chars)
_CHUNK_S = 80   # stride (chars) -> 40-char overlap between chunks


@register(
    "text_chunk_overlap",
    oracle=f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), {_CHUNK_S}))
             AS chunk_start
  FROM documents
), chunks AS (
  SELECT doc_id, (chunk_start - 1) // {_CHUNK_S} AS chunk_idx, chunk_start,
         substr(text, chunk_start, {_CHUNK_W}) AS chunk
  FROM starts
)
SELECT doc_id, chunk_idx, chunk_start,
       length(chunk) AS chunk_chars,
       length(chunk) - length(replace(chunk, ' ', '')) + 1 AS n_tokens,
       md5(chunk) AS chunk_hash
FROM chunks ORDER BY doc_id, chunk_idx
""",
    doc="sliding-window document chunking (120-char window, 80-char stride "
    "= 40-char overlap) — the RAG / training-sequence prep step: one "
    "posexplode(sequence) per document, pure expressions, zero shuffle; "
    "chunk identity via md5 so downstream chunk-level dedup composes",
    tags=("text", "chunk"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    starts = d.select(
        "doc_id",
        "text",
        F.posexplode(
            F.sequence(
                F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_CHUNK_S)
            )
        ).alias("chunk_idx", "chunk_start"),
    )
    chunk = F.expr(f"substring(text, chunk_start, {_CHUNK_W})")
    return (
        starts.withColumn("chunk", chunk)
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_start",
            F.length("chunk").alias("chunk_chars"),
            (
                F.length("chunk")
                - F.length(F.regexp_replace("chunk", " ", ""))
                + 1
            ).alias("n_tokens"),
            F.md5("chunk").alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_ZIPF_TOPN = 100


@register(
    "text_zipf_slope",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank
  FROM freq ORDER BY c DESC, token LIMIT {_ZIPF_TOPN}
)
SELECT count(*) AS n_ranks,
       round(regr_slope(ln(c), ln(rank)), 4) AS zipf_slope,
       round(regr_intercept(ln(c), ln(rank)), 4) AS zipf_intercept,
       round(regr_r2(ln(c), ln(rank)), 4) AS zipf_r2
FROM top
""",
    doc="Zipf's-law fit over the corpus token-frequency distribution: "
    "log-freq vs log-rank linear regression on the top-100 tokens (a "
    "natural-language corpus fits slope ~ -1; far-off slopes flag "
    "machine-generated or template text). Scale: frequency agg is "
    "map-side partial; the top-N is TakeOrderedAndProject (no full "
    "sort), so the only bounded single-partition step is the N-row rank",
    tags=("text", "quality"),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("c"))
    top = freq.orderBy(F.desc("c"), "token").limit(_ZIPF_TOPN)
    w = Window.orderBy(F.desc("c"), "token")  # post-limit: N rows, bounded
    ranked = top.withColumn("rank", F.row_number().over(w))
    y = F.log(F.col("c").cast("double"))
    x = F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_ranks"),
        F.round(F.regr_slope(y, x), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), 4).alias("zipf_r2"),
    )


@register(
    "text_perplexity_buckets",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT cast(sum(c) AS DOUBLE) AS t FROM freq
), scores AS (
  SELECT tok.doc_id,
         count(*) AS n_tokens,
         round(avg(log2(cast(freq.c AS DOUBLE) / tot.t)), 6) AS lm_logprob
  FROM tok JOIN freq USING (token) CROSS JOIN tot
  GROUP BY tok.doc_id
), cuts AS (
  SELECT quantile_cont(lm_logprob, 1.0/3) AS c1,
         quantile_cont(lm_logprob, 2.0/3) AS c2
  FROM scores
), bucketed AS (
  SELECT s.*,
         CASE WHEN s.lm_logprob <= c.c1 THEN 'tail'
              WHEN s.lm_logprob <= c.c2 THEN 'middle'
              ELSE 'head' END AS bucket
  FROM scores s CROSS JOIN cuts c
)
SELECT bucket, count(*) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(lm_logprob), 6) AS avg_lm_logprob,
       round(min(lm_logprob), 6) AS min_lm_logprob,
       round(max(lm_logprob), 6) AS max_lm_logprob
FROM bucketed GROUP BY bucket ORDER BY bucket
""",
    doc="CCNet-style perplexity bucketing: per-doc unigram-LM surprisal "
    "(text_unigram_logprob's operator), exact tercile cutoffs via the "
    "percentile aggregate (sort-based agg, map-side partial — no global "
    "row window), then a broadcast scalar comparison assigns head/middle/"
    "tail. Cutoffs interpolate the 6-dp-rounded scores, so both engines "
    "compare bitwise-identical doubles. SCALE NOTE: exact percentile "
    "buffers every per-doc score through partial-merge into one final "
    "reducer (~8 GB of doubles at 10^9 docs) — above ~10^8 docs use the "
    "GK-sketch twin text_perplexity_buckets_sketch, whose cutoff agg is "
    "fully mergeable; this exact form stays the small-corpus default "
    "because its cutoffs are bit-reproducible across engines",
    tags=("text", "quality"),
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import unigram_logprob

    d = t(spark, sf_dir, "documents")
    scores = unigram_logprob(d)
    cuts = scores.agg(
        F.percentile("lm_logprob", 1.0 / 3).alias("c1"),
        F.percentile("lm_logprob", 2.0 / 3).alias("c2"),
    )
    bucketed = scores.crossJoin(F.broadcast(cuts)).withColumn(
        "bucket",
        F.when(F.col("lm_logprob") <= F.col("c1"), F.lit("tail"))
        .when(F.col("lm_logprob") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("head")),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("lm_logprob"), 6).alias("avg_lm_logprob"),
            F.round(F.min("lm_logprob"), 6).alias("min_lm_logprob"),
            F.round(F.max("lm_logprob"), 6).alias("max_lm_logprob"),
        )
        .orderBy("bucket")
    )


_PPLX_ACC = 10000  # GK-sketch accuracy for the scale-path cutoffs


@register(
    "text_perplexity_buckets_sketch",
    # Value-checkable twin for the sketch path (the sketch_percentiles /
    # knn_ivf_seeded trick, third use): the approx cutoff VALUES are
    # engine-specific, but the GK sketch's rank-error guarantee makes the
    # resulting bucket SHARES a deterministic claim — each bucket must hold
    # n/3 docs within the published bound (2n/accuracy + 2, doubled for the
    # middle bucket whose two cutoffs each carry the error). The Spark plan
    # computes those booleans in-plan; the oracle asserts them TRUE and
    # checks the doc count exactly. A degraded sketch flips a boolean and
    # the gate hash-mismatches — a real value check, not rows-only.
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), scores AS (
  SELECT doc_id FROM tok GROUP BY doc_id
)
SELECT b.bucket, TRUE AS ok_share,
       (SELECT count(*) FROM scores) AS n_total
FROM (VALUES ('head'), ('middle'), ('tail')) AS b(bucket)
ORDER BY b.bucket
""",
    doc="scale path for CCNet-style perplexity bucketing: tercile cutoffs "
    "from percentile_approx (mergeable GK sketch — partial aggregation at "
    "any scale, no single-reducer buffering of per-doc scores, unlike the "
    "exact-percentile twin text_perplexity_buckets whose final reduce "
    "buffers every score and hits a memory wall around 10^9 docs). "
    "Verified in-plan against the sketch's rank-error bound: each bucket's "
    "share of docs must sit within 2n/accuracy + 2 of n/3. Prefer this "
    "operator above ~10^8 docs; the exact twin remains the small-corpus "
    "default because its cutoffs are bit-reproducible",
    tags=("text", "quality", "sketch"),
)
def text_perplexity_buckets_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import unigram_logprob

    d = t(spark, sf_dir, "documents")
    # scores feeds the cutoff agg AND the bucketing pass — checkpoint so
    # the unigram pipeline (explode + vocab join + per-doc agg) runs once
    scores = unigram_logprob(d).localCheckpoint(eager=False)
    cuts = scores.agg(
        F.percentile_approx(
            "lm_logprob", [1.0 / 3, 2.0 / 3], _PPLX_ACC
        ).alias("cs"),
        F.count("*").alias("n_total"),
    )
    # tie-run sizes at each cutoff, computed in the SAME pass as the
    # bucket counts: GK guarantees the rank of SOME position inside a
    # tied run, but count(x <= cutoff) counts the whole run — the
    # soundness allowance must widen by (run − 1) per cutoff involved, or
    # a duplicate-heavy corpus (exact-dup documents share identical 6-dp
    # scores) straddling a cutoff flips the boolean spuriously.
    bucketed = scores.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("lm_logprob") <= F.col("cs")[0], F.lit("tail"))
        .when(F.col("lm_logprob") <= F.col("cs")[1], F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
        (F.col("lm_logprob") == F.col("cs")[0]).cast("long").alias("_e1"),
        (F.col("lm_logprob") == F.col("cs")[1]).cast("long").alias("_e2"),
        "n_total",
    )
    per = bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("_e1").alias("_t1"),
        F.sum("_e2").alias("_t2"),
        F.first("n_total").alias("_nt"),
    )
    # coalesce: no-op whenever the corpus is non-empty (per then has >=1
    # row and the sums/max are non-NULL); on an EMPTY corpus it pins the
    # oracle's fixed 3-row frame values (ok_share TRUE, n_total 0)
    # instead of NULL-cascading through the share test (degenerate
    # sweep, r11)
    stats = per.agg(
        F.coalesce(F.sum("_t1"), F.lit(0)).alias("tie1"),
        F.coalesce(F.sum("_t2"), F.lit(0)).alias("tie2"),
        F.coalesce(F.max("_nt"), F.lit(0)).alias("n_total"),
    )
    # always exactly 3 rows: a literal bucket frame left-joined with the
    # observed counts (an empty bucket is n_docs=0, not a missing row —
    # the oracle emits a fixed 3-row VALUES table)
    from ..session import local_df

    buckets = local_df(
        spark, [("head",), ("middle",), ("tail",)], "bucket string"
    )
    full = (
        buckets.join(per.select("bucket", "n_docs"), "bucket", "left")
        .withColumn("n_docs", F.coalesce("n_docs", F.lit(0)))
        .crossJoin(F.broadcast(stats))
    )
    # GK guarantee: |rank(c) - q*n| <= n/accuracy; 2x + 2 slack as in
    # sketch_percentiles, plus the tie-run widening. The middle bucket
    # subtracts two ranks, so both its deviation bound and both tie runs
    # apply.
    err = F.col("n_total") / _PPLX_ACC * 2 + F.lit(2.0)
    t1 = F.greatest(F.col("tie1") - 1, F.lit(0)).cast("double")
    t2 = F.greatest(F.col("tie2") - 1, F.lit(0)).cast("double")
    allowance = (
        F.when(F.col("bucket") == "middle", err * 2 + t1 + t2)
        .when(F.col("bucket") == "tail", err + t1)
        .otherwise(err + t2)
    )
    return full.select(
        "bucket",
        (
            F.abs(F.col("n_docs") - F.col("n_total") / 3.0) <= allowance
        ).alias("ok_share"),
        "n_total",
    ).orderBy("bucket")


@register(
    "pipeline_quality_dedup_split",
    oracle="""
WITH scored AS (
  SELECT doc_id, text,
         (length(text) - length(replace(text, ' ', '')) + 1) AS n_tokens,
         round(least(1.0, (length(text) - length(replace(text, ' ', '')) + 1)
                          / 200.0)
               * (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / (length(text) - length(replace(text, ' ', '')) + 1)), 4)
             AS quality
  FROM documents
), kept AS (
  SELECT * FROM scored WHERE quality >= 0.08
), keepers AS (
  SELECT md5(text) AS h, min(doc_id) AS keeper FROM kept GROUP BY md5(text)
), deduped AS (
  SELECT k.* FROM kept k JOIN keepers ON md5(k.text) = keepers.h
                                     AND k.doc_id = keepers.keeper
), split AS (
  SELECT *,
         CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'c0'
                  THEN 'train'
              WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e0'
                  THEN 'val'
              ELSE 'test' END AS split
  FROM deduped
)
SELECT split, count(*) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 4) AS avg_quality,
       min(doc_id) AS first_doc
FROM split GROUP BY split ORDER BY split
""",
    doc="end-to-end training-data pipeline composition — the FineWeb/"
    "RefinedWeb shape in one plan: quality scoring (length saturation x "
    "lexical diversity, 4-dp rounded so the threshold compare is "
    "bit-stable cross-engine) -> filter >= 0.08 -> exact dedup keeping "
    "the first doc per md5(text) (groupBy-min + equi-join, no window) -> "
    "deterministic md5 train/val/test split -> per-split corpus stats. "
    "Every stage is a gate elsewhere (text_quality_score, "
    "dedup_exact_hash, sample_hash_split); this gate pins that they "
    "compose without re-materialization: one scan, three shuffles "
    "(dedup groupBy, dedup join, split agg), all map-side-combinable",
    tags=("text", "pipeline", "dedup", "sampling"),
)
def pipeline_quality_dedup_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import hash_split

    d = t(spark, sf_dir, "documents")
    n_tokens = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    n_distinct = F.size(F.array_distinct(tokens(F.col("text"))))
    quality = F.round(
        F.least(F.lit(1.0), n_tokens / 200.0)
        * (n_distinct.cast("double") / n_tokens),
        4,
    )
    kept = d.select(
        "doc_id",
        F.md5("text").alias("h"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality"),
    ).filter(F.col("quality") >= 0.08)
    keepers = kept.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    # join on the column-name list (merges `h`, no self-join lineage
    # ambiguity — `kept["h"] == keepers["h"]` degraded to a trivially-true
    # predicate because `keepers` derives from `kept`), then pin the keeper
    # row with a plain filter. Same rows, no Catalyst warning.
    deduped = (
        kept.join(keepers, "h")
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "n_tokens", "quality")
    )
    return (
        deduped.withColumn("split", hash_split(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


_GOPHER_STOPWORDS = ("the", "a", "of", "to", "and")


@register(
    "text_gopher_quality",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         length(replace(text, ' ', '')) AS nospace_chars
  FROM documents
), feat AS (
  SELECT doc_id,
         len(words) AS n_words,
         round(cast(nospace_chars AS DOUBLE) / len(words), 4)
             AS mean_word_len,
         round(cast(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
                    AS DOUBLE) / len(words), 4) AS alpha_word_frac,
         len(list_intersect(list_distinct(words),
                            ['the', 'a', 'of', 'to', 'and']))
             AS n_stopwords
  FROM w
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, n_stopwords,
       (n_words BETWEEN 20 AND 80) AS ok_word_count,
       (mean_word_len BETWEEN 3 AND 10) AS ok_mean_word_len,
       (alpha_word_frac >= 0.8) AS ok_alpha,
       (n_stopwords >= 2) AS ok_stopwords,
       ((n_words BETWEEN 20 AND 80) AND (mean_word_len BETWEEN 3 AND 10)
        AND alpha_word_frac >= 0.8 AND n_stopwords >= 2) AS keep
FROM feat ORDER BY doc_id
""",
    doc="Gopher-style rule-based quality filter (Rae et al. 2021 heuristics "
    "re-thresholded for the synthetic corpus): word-count bounds, mean "
    "word length, alphabetic-word fraction, stopword presence — each rule "
    "one JVM expression over the split-token array, no explode and no "
    "shuffle at all (pure per-row projection; at 100 TB this is a "
    "scan-speed map stage that fuses into whatever consumes it). Ratios "
    "are 4-dp rounded before thresholding so both engines compare "
    "identical doubles",
    tags=("text", "quality"),
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    words = tokens(F.col("text"))
    n_words = F.size(words)
    mean_word_len = F.round(
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words,
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda x: x.rlike("[a-z]"))).cast("double")
        / n_words,
        4,
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    feat = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stopwords"),
    )
    ok_wc = F.col("n_words").between(20, 80)
    ok_mwl = F.col("mean_word_len").between(3, 10)
    ok_alpha = F.col("alpha_word_frac") >= 0.8
    ok_stop = F.col("n_stopwords") >= 2
    return feat.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "n_stopwords",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_alpha & ok_stop).alias("keep"),
    ).orderBy("doc_id")


@register(
    "pack_shard_manifest",
    oracle="""
WITH sized AS (
  SELECT source, doc_id, md5(cast(doc_id AS VARCHAR)) AS h,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), placed AS (
  SELECT source, doc_id, n_tokens,
         cast(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM sized
), assigned AS (
  SELECT source, doc_id, n_tokens,
         source || '-' || cast(start_offset // 512 AS VARCHAR) AS shard
  FROM placed
)
SELECT shard, count(*) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       md5(string_agg(cast(doc_id AS VARCHAR), ','
                      ORDER BY cast(doc_id AS VARCHAR))) AS content_md5
FROM assigned GROUP BY shard ORDER BY shard
""",
    doc="training-shard manifest (operators/shards.py assign_shards + "
    "the write_shards manifest aggregate, 512-token shards): token-balanced "
    "shard cut on the deterministic packing layout, per-shard doc/token "
    "counts, id range, and an order-canonical content md5 — the trainer-"
    "facing integrity record verify_shards re-derives from written files",
    tags=("text", "packing"),
)
def pack_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.shards import assign_shards

    d = t(spark, sf_dir, "documents")
    assigned = assign_shards(d, shard_tokens=512)
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(F.collect_list(F.col("doc_id").cast("string"))),
                )
            ).alias("content_md5"),
        )
        .orderBy("shard")
    )


_TEMP_ALPHA = 0.5  # mixture temperature (XLM-R-style alpha-sampling)


@register(
    "sample_temperature_mixture",
    oracle=f"""
WITH per AS (
  SELECT source,
         sum(length(text) - length(replace(text, ' ', '')) + 1) AS s_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT cast(sum(s_tokens) AS DOUBLE) AS n FROM per
), raw AS (
  SELECT source, s_tokens,
         power(s_tokens / tot.n, {_TEMP_ALPHA} - 1.0) AS w
  FROM per CROSS JOIN tot
), mx AS (
  SELECT max(w) AS m FROM raw
), rates AS (
  SELECT source, s_tokens, round(w / mx.m, 6) AS rate
  FROM raw CROSS JOIN mx
), kept AS (
  SELECT d.source, d.doc_id,
         length(d.text) - length(replace(d.text, ' ', '')) + 1 AS n_tokens
  FROM documents d JOIN rates r USING (source)
  WHERE CASE WHEN r.rate >= 1.0 THEN TRUE
             ELSE substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 4)
                  < lpad(lower(to_hex(CAST(floor(r.rate * 65536) AS INT))),
                         4, '0')
        END
)
SELECT r.source, r.rate, cast(r.s_tokens AS BIGINT) AS source_tokens,
       count(k.doc_id) AS n_kept,
       cast(coalesce(sum(k.n_tokens), 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept k USING (source)
GROUP BY r.source, r.rate, r.s_tokens ORDER BY r.source
""",
    doc="temperature-based mixture resampling (the multilingual "
    "rebalancing step: keep-rate per source proportional to p^(alpha-1), "
    f"alpha={_TEMP_ALPHA}, normalized so the rarest source keeps "
    "everything) with rates DERIVED FROM THE DATA in-plan — per-source "
    "token totals (one combinable agg), broadcast normalization, then the "
    "same deterministic md5-threshold keep as sample_corpus_mixture. "
    "Rates are 6-dp rounded before the 16-bit quantization so both "
    "engines threshold identical values; floor() is explicit because "
    "Spark truncates double->int where DuckDB rounds",
    tags=("text", "sampling"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import temperature_keep, temperature_rates

    d = t(spark, sf_dir, "documents")
    n_tok = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    rates = temperature_rates(d, "source", _TEMP_ALPHA)
    kept = temperature_keep(
        d.select("source", "doc_id", n_tok.alias("n_tokens")), rates, "source"
    )
    kept_agg = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
    )
    return (
        rates.join(F.broadcast(kept_agg), "source", "left")
        .select(
            "source",
            "rate",
            F.col("s_tokens").cast("long").alias("source_tokens"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )


@register(
    "text_token_topk_sketch",
    # identical oracle to text_token_topk: with n_counters >= the 31-token
    # synthetic vocabulary no decrement ever fires, so MG candidates cover
    # everything and the recounted top-20 must EQUAL the exact top-20 —
    # a full value check of the sketch->recount plumbing. The decrement
    # regime (vocab >> counters) is pinned by the planted-skew pytest;
    # this corpus is near-uniform, where no sketch can promise candidate
    # coverage below vocabulary size.
    oracle="""
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) GROUP BY token ORDER BY n DESC, token LIMIT 20
""",
    doc="corpus token top-k through the Misra-Gries heavy-hitter path "
    "(operators/text_analysis.misra_gries_candidates + exact candidate "
    "recount): per-partition mergeable sketches bound the candidate set "
    "by n_counters x n_partitions regardless of vocabulary size — the "
    "scale path for top-k over unbounded key spaces (URLs, n-grams), "
    "where the plain explode+groupBy shuffles the full vocabulary",
    tags=("text", "sketch", "kernel"),
)
def text_token_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import heavy_hitters_topk

    d = t(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    return heavy_hitters_topk(toks, "token", k=20, n_counters=64)


@register(
    "sample_weighted_ares",
    oracle="""
WITH sized AS (
  SELECT source, doc_id,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), keyed AS (
  SELECT source, doc_id, n_tokens,
         round(ln((CAST('0x' || substr(md5('ares' || cast(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) + 1) / 4294967296.0)
               / cast(n_tokens AS DOUBLE), 10) AS ares_key
  FROM sized
)
SELECT source, doc_id, n_tokens, ares_key, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY ares_key DESC, doc_id) AS rk
  FROM keyed
) WHERE rk <= 3 ORDER BY source, rk
""",
    doc="deterministic weighted sampling without replacement (Efraimidis-"
    "Spirakis A-Res, operators/text_analysis.weighted_sample): u from "
    "md5(salt||id), rank by ln(u)/weight per source, keep top 3 — "
    "inclusion probability proportional to token count, fully replayable "
    "in SQL (no RNG state anywhere). The quality/length-weighted corpus "
    "subsetting primitive; one window shuffle keyed by the group",
    tags=("text", "sampling"),
)
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import weighted_sample

    d = t(spark, sf_dir, "documents")
    n_tokens = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    sized = d.select("source", "doc_id", n_tokens.alias("n_tokens"))
    out = weighted_sample(
        sized, weight_col="n_tokens", k=3, id_col="doc_id", group_col="source"
    )
    return out.select("source", "doc_id", "n_tokens", "ares_key", "rk").orderBy(
        "source", "rk"
    )


# ---------------------------------------------------------------------------
# Round-7 continuation: inverted-index ranked retrieval (operators/
# retrieval.py). BM25 is float, so the gate enforces the determinism
# discipline end-to-end: exact-integer inputs (tf, dl, df, N, sum_dl),
# ONE shared parenthesization (float literals below are repr()'d from the
# same Python floats both engines parse), an ordered per-document fold
# over term scores, and ranking on the 4-decimal-rounded score with
# doc_id tiebreak. The fold makes the pre-rounded value aggregation-
# order-invariant, so the only cross-engine noise is libm ln() ulps
# (~1e-13 relative); hand-probed rounding margins (the margin_probe
# rewrite applied at the fold CTE, over ALL candidate rows, not just
# top-k) are >= 7.7e-6 grid units at sf0.001/0.01/0.1 — 7x the repo
# threshold and ~7 orders above the noise floor.
# ---------------------------------------------------------------------------

_BM25_QUERIES = {
    "q1": "spark join window",
    "q2": "dup merge stream",
    "q3": "vector scan fast",
}
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 10


def _bm25_oracle() -> str:
    vals = ", ".join(
        f"('{qid}', '{term}')"
        for qid, text in sorted(_BM25_QUERIES.items())
        for term in dict.fromkeys(text.split())
    )
    k1, k1p1, one_b, b = (
        repr(_BM25_K1), repr(_BM25_K1 + 1.0), repr(1.0 - _BM25_B), repr(_BM25_B)
    )
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY term, doc_id
),
ds AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
corpus AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM ds
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings
  WHERE term IN (SELECT term FROM q) GROUP BY term
),
per AS (
  SELECT q.query_id, p.doc_id, p.term,
         ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (CAST(p.tf AS DOUBLE) * {k1p1})
           / (CAST(p.tf AS DOUBLE)
              + {k1} * ({one_b} + {b} * (CAST(ds.dl * c.n_docs AS DOUBLE)
                                         / CAST(c.sum_dl AS DOUBLE))))
           AS term_score
  FROM q
  JOIN postings p USING (term)
  JOIN dfreq d USING (term)
  JOIN ds USING (doc_id)
  CROSS JOIN corpus c
),
folded AS (
  SELECT query_id, doc_id,
         round(list_sum(list(term_score ORDER BY term)), 4) AS score
  FROM per GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM folded
)
SELECT query_id, rank, doc_id, score
FROM ranked WHERE rank <= {_BM25_TOPK}
ORDER BY query_id, rank
"""


@register(
    "bm25_ranked_retrieval",
    oracle=_bm25_oracle(),
    doc="BM25 ranked retrieval over an inverted index (operators/"
    "retrieval.py — Okapi BM25, k1=1.2 b=0.75): postings built by one "
    "explode+group-by, query joins touch only the query terms' posting "
    "lists (broadcast df + corpus stats), per-document score is an "
    "ordered fold over exact-integer inputs, ranking on the 4-decimal "
    "rounded score with doc_id tiebreak — the corpus-search primitive "
    "for contamination triage and training-data debugging",
    tags=("text", "retrieval", "index"),
)
def bm25_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk, build_postings, literal_queries

    docs = t(spark, sf_dir, "documents")
    postings, doc_stats = build_postings(docs)
    queries = literal_queries(spark, _BM25_QUERIES)
    return bm25_topk(
        postings, doc_stats, queries,
        k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK,
    ).orderBy("query_id", "rank")


@register(
    "contrastive_negative_mining",
    oracle="""
WITH cand AS (
  SELECT doc_id AS neg_id, lang AS neg_label,
         CAST(CAST('0x' || substr(md5('cand:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 8 AS INT) AS bucket
  FROM documents
),
anc AS (
  SELECT doc_id AS anchor_id, lang AS anchor_label,
         CAST(CAST('0x' || substr(md5('probe:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 8 AS INT) AS bucket
  FROM documents WHERE doc_id < 60
),
j AS (
  SELECT anchor_id, neg_id, neg_label,
         md5(CAST(anchor_id AS VARCHAR) || ':' || CAST(neg_id AS VARCHAR)) AS draw
  FROM anc JOIN cand USING (bucket)
  WHERE neg_label <> anchor_label AND neg_id <> anchor_id
),
r AS (
  SELECT anchor_id, neg_id, neg_label,
         CAST(row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY draw, neg_id) AS INT) AS neg_rank
  FROM j
)
SELECT anchor_id, neg_rank, neg_id, neg_label
FROM r WHERE neg_rank <= 4
ORDER BY anchor_id, neg_rank
""",
    doc="blocked contrastive negative mining (operators/contrastive.py — "
    "k=4 other-language negatives per anchor WITHOUT a cross join: "
    "candidates bucketed by md5, each anchor probes one pseudo-random "
    "bucket, per-anchor md5 draw ranks the bucket's other-label rows; "
    "join size n*(n/B) = linear for B ~ n, every step engine-"
    "reproducible hash algebra so the oracle replays the exact sample)",
    tags=("text", "sampling", "contrastive"),
)
def contrastive_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.contrastive import negative_samples

    docs = t(spark, sf_dir, "documents")
    return (
        negative_samples(
            docs, "doc_id", "lang", k=4, n_buckets=8,
            anchors=docs.filter(F.col("doc_id") < 60),
        )
        .orderBy("anchor_id", "neg_rank")
    )


# ---------------------------------------------------------------------------
# Round-7 continuation: BPE merge-rule training (operators/bpe.py) — the
# "needs a driver loop" algorithm as ONE lazy plan: per round, the 1-row
# winning pair cross-joins back into the corpus (no collect), and the
# oracle replays the identical rounds with scalar subqueries. Literal
# replace is left-to-right non-overlapping in both engines — exactly
# BPE's greedy application order.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_oracle() -> str:
    parts = ["WITH t0 AS (SELECT doc_id, text FROM documents)"]
    for r in range(1, _BPE_ROUNDS + 1):
        parts.append(
            f""",
p{r} AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(list_transform(
        range(1, len(string_split(text, ' '))),
        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
    )) AS pair
    FROM t{r - 1}
  ) GROUP BY pair
),
top{r} AS (SELECT pair, c FROM p{r} ORDER BY c DESC, pair LIMIT 1),
t{r} AS (
  -- sentinel-prefixed rendering makes the pattern self-delimiting:
  -- literal replace == greedy BPE application, even through runs
  SELECT doc_id,
         trim(replace(
           replace(chr(1) || replace(text, ' ', ' ' || chr(1)) || ' ',
                   chr(1) || replace((SELECT pair FROM top{r}),
                                     ' ', ' ' || chr(1)) || ' ',
                   chr(1) || replace((SELECT pair FROM top{r}),
                                     ' ', '@') || ' '),
           chr(1), '')) AS text
  FROM t{r - 1}
),
s{r} AS (
  SELECT {r} AS round,
         (SELECT pair FROM top{r}) AS pair,
         (SELECT c FROM top{r}) AS pair_count,
         (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT)
          FROM t{r}) AS corpus_tokens_after
)"""
        )
    # pair IS NOT NULL mirrors the operator's sentinel-round drop: a
    # round with no adjacent pairs anywhere (e.g. an EMPTY corpus) has a
    # NULL winning pair on both engines and appears in NEITHER result
    # (degenerate sweep, r11); on any corpus with pairs it is a no-op
    union = " UNION ALL ".join(
        f"SELECT * FROM s{r} WHERE pair IS NOT NULL"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    parts.append(f"\n{union} ORDER BY round")
    return "".join(parts)


@register(
    "bpe_train_rounds",
    oracle=_bpe_oracle(),
    doc="BPE merge-rule training, 3 rounds as one declarative plan "
    "(operators/bpe.py — per round: adjacent-pair histogram, 1-row "
    "argmax broadcast-cross-joined back, greedy left-to-right corpus "
    "rewrite; no driver collect anywhere; winner order (count desc, "
    "pair asc) is a total order so the replay is exact)",
    tags=("text", "tokenizer", "iterative"),
)
def bpe_train_rounds_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train_rounds

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    rules, _ = bpe_train_rounds(docs, "text", n_rounds=_BPE_ROUNDS)
    return rules.orderBy("round")


@register(
    "length_bucketed_batches",
    oracle="""
WITH base AS (
  SELECT doc_id,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
         CAST(length(bin(greatest(
             length(text) - length(replace(text, ' ', '')) + 1, 1))) - 1
           AS INT) AS bucket
  FROM documents
), placed AS (
  SELECT doc_id, n_tokens, bucket,
         row_number() OVER (
           PARTITION BY bucket
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM base
), batched AS (
  SELECT doc_id, n_tokens, bucket,
         CAST((rn - 1) // 8 AS BIGINT) AS batch_idx,
         CAST((rn - 1) % 8 AS INT) AS pos_in_batch
  FROM placed
)
SELECT bucket, batch_idx,
       CAST(count(*) AS BIGINT) AS batch_docs,
       max(n_tokens) AS pad_to,
       CAST(CAST(count(*) AS BIGINT) * max(n_tokens) - sum(n_tokens)
         AS BIGINT) AS padding_waste,
       min(doc_id) AS first_doc
FROM batched
GROUP BY bucket, batch_idx
ORDER BY bucket, batch_idx
""",
    doc="length-grouped batching (operators/text_analysis."
    "length_bucketed_batches — HF group_by_length semantics): power-of-"
    "two length buckets via INTEGER bit algebra (a float log2 would flip "
    "floor at exact powers), md5-shuffled fixed-size batches per bucket, "
    "pad-to = bucket-batch max; the per-batch padding_waste column IS "
    "the metric the op exists to minimize",
    tags=("text", "batching", "training"),
)
def length_bucketed_batches_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import length_bucketed_batches

    docs = t(spark, sf_dir, "documents")
    placed = length_bucketed_batches(docs, batch_size=8)
    return (
        placed.groupBy("bucket", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("batch_docs"),
            F.max("n_tokens").alias("pad_to"),
            (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")).alias(
                "padding_waste"
            ),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("bucket", "batch_idx")
    )


@register(
    "minhash_group_rollup",
    oracle="""
WITH words AS (
  SELECT source, doc_id, string_split(text, ' ') AS w FROM documents
), toks AS (
  SELECT source, doc_id, unnest(list_distinct(list_transform(
      generate_series(1, greatest(len(w) - 2, 1)),
      i -> array_to_string(w[i:i+2], ' ')))) AS tok
  FROM words
), hashed AS (
  SELECT source, md5('g0' || tok) AS h FROM toks
)
SELECT source,
       min(substr(h, 1, 8))  AS mh_0,
       min(substr(h, 9, 8))  AS mh_1,
       min(substr(h, 17, 8)) AS mh_2,
       min(substr(h, 25, 8)) AS mh_3,
       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_shingle_hashes
FROM hashed GROUP BY source ORDER BY source
""",
    doc="mergeable MinHash rollup (operators/dedup.minhash_signatures + "
    "min-merge): the per-SOURCE signature computed by MERGING per-doc "
    "signatures (min of mins — the rollup path that never rescans "
    "text), while the oracle computes the DIRECT signature over the "
    "union of the group's shingles; equality proves the mergeability "
    "identity cross-engine — MinHash joins HLL/KLL/Theta/MG in the "
    "sketch-algebra family (per-corpus-slice near-dup signatures that "
    "re-aggregate to any coarser grain)",
    tags=("text", "dedup", "minhash", "rollup"),
)
def minhash_group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures

    d = t(spark, sf_dir, "documents", heavy=True)
    sig = minhash_signatures(d, n_hashes=4, shingle_n=3)
    src = d.select("doc_id", "source")
    per_doc = sig.join(src, "doc_id")
    # the distinct-hash count is exact support metadata for the group
    # signature; derived from the same shingle hashes, order-invariant
    from ..operators.dedup import shingles as _sh

    hashes = d.select(
        "source", F.explode(_sh(F.col("text"), 3)).alias("tok")
    ).select("source", F.md5(F.concat(F.lit("g0"), F.col("tok"))).alias("h"))
    support = hashes.groupBy("source").agg(
        F.countDistinct("h").alias("n_distinct_shingle_hashes")
    )
    merged = per_doc.groupBy("source").agg(
        F.min("mh_0").alias("mh_0"),
        F.min("mh_1").alias("mh_1"),
        F.min("mh_2").alias("mh_2"),
        F.min("mh_3").alias("mh_3"),
    )
    return merged.join(support, "source").orderBy("source")


# ---------------------------------------------------------------------------
# Round-9 continuation: ranked-retrieval EVALUATION (operators/retrieval.
# ndcg_at_k) — nDCG@10 of the BM25 run against graded relevance labels.
# The discount is pre-scaled to integer rank weights (round(1e6/log2(r+1))
# — identical literals in both engines), so DCG/IDCG are exact integer
# dot products and the only float op is one division per query. Ranks
# come from the margin-audited bm25 gate; the ideal ordering re-ranks the
# retrieved set (rel desc, rank tiebreak) — the run-comparison form.
# ---------------------------------------------------------------------------


def _ndcg_oracle() -> str:
    from ..operators.retrieval import dcg_weights_scaled

    whens = " ".join(
        f"WHEN {r} THEN {w}"
        for r, w in enumerate(dcg_weights_scaled(_BM25_TOPK), start=1)
    )
    return f"""
WITH base AS ({_bm25_oracle()}),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
lab AS (
  SELECT b.query_id, b.rank,
         CAST(CASE WHEN d.dl > 60 THEN 2
                   WHEN d.dl > 30 THEN 1 ELSE 0 END AS BIGINT) AS rel
  FROM base b JOIN dl d USING (doc_id)
), ideal AS (
  SELECT query_id, rank, rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, rank) AS irank
  FROM lab
), scored AS (
  SELECT query_id,
         rel * (CASE rank {whens} ELSE 0 END) AS term,
         rel * (CASE irank {whens} ELSE 0 END) AS iterm
  FROM ideal
), agg AS (
  SELECT query_id,
         CAST(sum(term) AS BIGINT) AS dcg_scaled,
         CAST(sum(iterm) AS BIGINT) AS idcg_scaled
  FROM scored GROUP BY query_id
)
SELECT query_id, dcg_scaled, idcg_scaled,
       CASE WHEN idcg_scaled = 0 THEN 0.0
            ELSE round(CAST(dcg_scaled AS DOUBLE)
                       / CAST(idcg_scaled AS DOUBLE), 6) END AS ndcg
FROM agg ORDER BY query_id
"""


@register(
    "retrieval_ndcg_eval",
    oracle=_ndcg_oracle(),
    doc="nDCG@10 evaluation of the BM25 run (operators/retrieval."
    "ndcg_at_k): graded relevance from doc length (2 if dl>60, 1 if "
    "dl>30, else 0), DCG = exact integer dot product of rel with "
    "pre-scaled rank weights round(1e6/log2(r+1)), ideal ordering "
    "re-ranks the retrieved set by (rel desc, rank); one double "
    "division per query — the eval harness a retrieval deployment "
    "runs per index build, with the ranking itself margin-audited by "
    "the bm25 gate",
    tags=("text", "retrieval", "eval"),
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import (
        bm25_topk,
        build_postings,
        literal_queries,
        ndcg_at_k,
    )

    docs = t(spark, sf_dir, "documents")
    postings, doc_stats = build_postings(docs)
    queries = literal_queries(spark, _BM25_QUERIES)
    ranked = bm25_topk(
        postings, doc_stats, queries,
        k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK,
    ).select("query_id", "rank", "doc_id")
    dl = F.size(F.split("text", " "))
    rel = docs.select(
        "doc_id",
        F.when(dl > 60, 2).when(dl > 30, 1).otherwise(0).alias("rel"),
    )
    return (
        ndcg_at_k(ranked, rel, k=_BM25_TOPK)
        .select("query_id", "dcg_scaled", "idcg_scaled", "ndcg")
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: feature-hashing collision audit — the "hashing
# trick" (Weinberger 2009) maps an unbounded vocabulary into a fixed
# 1024-bucket feature space; before shipping a hashed featurizer you
# audit how crowded the buckets get (collisions blur features). The
# hash is the repo's engine-reproducible md5 algebra (same bytes on
# both engines), so the whole audit is exact integers: vocabulary ->
# bucket -> load histogram.
# Scale: one token explode into a distinct (vocabulary-sized) hash
# aggregate, then a 1024-key rollup — the heavy shuffle is the
# vocabulary collapse, identical to text_token_topk's.
# ---------------------------------------------------------------------------

_FH_BUCKETS = 1024


@register(
    "feature_hash_collisions",
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents
), bucketed AS (
  SELECT CAST(CAST('0x' || substr(md5(token), 1, 8) AS BIGINT)
              % {_FH_BUCKETS} AS BIGINT) AS bucket
  FROM vocab
), loads AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS load FROM bucketed GROUP BY bucket
)
SELECT load,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(load) AS BIGINT) AS n_tokens
FROM loads GROUP BY load ORDER BY load
""",
    doc="feature-hashing (hashing-trick) collision audit: distinct "
    "whitespace tokens hash via md5 into 1024 buckets, report the "
    "bucket-load histogram (load -> bucket count -> token mass) — "
    "engine-reproducible hash algebra, exact integers; one "
    "vocabulary-collapse shuffle + a 1024-key rollup",
    tags=("text", "ml", "sketch"),
)
def feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    vocab = d.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).distinct()
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
        % _FH_BUCKETS
    ).cast("long")
    loads = (
        vocab.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("load"))
    )
    return (
        loads.groupBy("load")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("load").alias("n_tokens"),
        )
        .orderBy("load")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: corpus novelty profile — for each document in
# doc_id order, what fraction of its word trigrams has never appeared
# in any earlier document? The curve every dataset-curation run looks
# at: it falls as a crawl saturates, and a cliff marks a bulk
# duplicate. ("Deduplicating Training Data Makes Language Models
# Better" measures the same saturation at the substring level —
# dedup_substring_spans; this is the document-resolution readout.)
# Exactness: shingles are the repo's canonical trigram builder
# (shingles() == the generate_series/array_to_string twin), first
# appearance is min(doc_id) per shingle, everything is integer until
# the final one-division rate rounded 6dp.
# Scale: one shingle explode into a min-aggregate keyed by shingle
# (map-side combinable), one join back on (shingle) to re-attribute
# first appearances — both shuffles are vocabulary-sized, never
# pairwise.
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), toks AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      generate_series(1, greatest(len(w) - 2, 1)),
      i -> array_to_string(w[i:i+2], ' ')))) AS g
  FROM words
), firsts AS (
  SELECT g, min(doc_id) AS first_doc FROM toks GROUP BY g
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(CASE WHEN f.first_doc = t.doc_id THEN 1 END) AS BIGINT)
         AS n_novel,
       round(CAST(count(CASE WHEN f.first_doc = t.doc_id THEN 1 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty_rate
FROM toks t JOIN firsts f ON f.g = t.g
GROUP BY t.doc_id ORDER BY t.doc_id
""",
    doc="per-document trigram novelty in doc_id order (the corpus "
    "saturation curve): shingle -> min(doc_id) first appearance -> "
    "fraction of this doc's shingles first seen here — canonical "
    "shingle builder, integer counts, one end division; two "
    "vocabulary-sized shuffles, never pairwise",
    tags=("text", "dedup", "mining"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(shingles(F.col("text"), 3)).alias("g")
    )
    firsts = toks.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    joined = toks.join(firsts, "g")
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("novelty_rate"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: vocabulary drift between corpus halves — split
# the corpus at the doc_id midpoint (stand-in for a time cutover) and
# report the tokens whose document frequency moved most: the
# token-resolution drift detector next to the distribution-level KS
# (drift_ks_value_shift) and category-level chi-squared
# (drift_chi2_event_mix) gates. New jargon, dying topics and crawler
# regressions all surface here first.
# Exactness: document frequencies and corpus sizes are BIGINT; the
# mover ranking uses the integer cross-difference |df1*n2 - df2*n1|
# (no float ordering anywhere); the reported rates are one division
# each, rounded 6dp.
# Scale: one distinct (doc, token) explode, one token-keyed conditional
# count — vocabulary-sized shuffle, then a top-20 rank.
# ---------------------------------------------------------------------------


@register(
    "text_vocab_drift",
    oracle="""
WITH half AS (
  SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) // 2 AS cut
), tagged AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token,
         doc_id < (SELECT cut FROM half) AS early
  FROM documents
), n AS (
  SELECT CAST(count(DISTINCT CASE WHEN early THEN doc_id END) AS BIGINT)
           AS n1,
         CAST(count(DISTINCT CASE WHEN NOT early THEN doc_id END) AS BIGINT)
           AS n2
  FROM tagged
), df AS (
  SELECT token,
         CAST(count(CASE WHEN early THEN 1 END) AS BIGINT) AS df1,
         CAST(count(CASE WHEN NOT early THEN 1 END) AS BIGINT) AS df2
  FROM tagged GROUP BY token
)
SELECT token, df1, df2,
       CASE WHEN n.n1 = 0 THEN NULL
            ELSE round(CAST(df1 AS DOUBLE) / CAST(n.n1 AS DOUBLE), 6)
       END AS rate_early,
       CASE WHEN n.n2 = 0 THEN NULL
            ELSE round(CAST(df2 AS DOUBLE) / CAST(n.n2 AS DOUBLE), 6)
       END AS rate_late,
       CAST(abs(df1 * n.n2 - df2 * n.n1) AS BIGINT) AS cross_diff
FROM df CROSS JOIN n
ORDER BY cross_diff DESC, token LIMIT 20
""",
    # an empty half (corpus of < 2 docs) has no document-frequency RATE:
    # both engines pin NULL (degenerate sweep, r11); no-op otherwise
    doc="vocabulary drift across the doc_id midpoint: per-token "
    "document frequency in each half, movers ranked by the integer "
    "cross-difference |df1*n2 - df2*n1| (no float ordering), rates one "
    "division each — the token-level drift detector beside the KS and "
    "chi-squared gates; one vocabulary-sized shuffle",
    tags=("text", "drift", "mining"),
)
def text_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    # the midpoint cut stays IN-PLAN as a broadcast 1-row aggregate (no
    # eager driver .count() embedded as a literal)
    cut_df = d.agg(F.expr("count(*) div 2").alias("cut"))
    tagged = (
        d.crossJoin(F.broadcast(cut_df))
        .select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("token"),
            (F.col("doc_id") < F.col("cut")).alias("early"),
        )
        .distinct()
    )
    n = tagged.agg(
        F.countDistinct(F.when(F.col("early"), F.col("doc_id"))).alias("n1"),
        F.countDistinct(
            F.when(~F.col("early"), F.col("doc_id"))
        ).alias("n2"),
    )
    df = tagged.groupBy("token").agg(
        F.count(F.when(F.col("early"), 1)).alias("df1"),
        F.count(F.when(~F.col("early"), 1)).alias("df2"),
    )
    return (
        df.crossJoin(F.broadcast(n))
        .select(
            "token",
            "df1",
            "df2",
            F.when(
                F.col("n1") > 0,
                F.round(
                    F.col("df1").cast("double") / F.col("n1").cast("double"),
                    6,
                ),
            ).alias("rate_early"),
            F.when(
                F.col("n2") > 0,
                F.round(
                    F.col("df2").cast("double") / F.col("n2").cast("double"),
                    6,
                ),
            ).alias("rate_late"),
            F.abs(
                F.col("df1") * F.col("n2") - F.col("df2") * F.col("n1")
            ).alias("cross_diff"),
        )
        .orderBy(F.desc("cross_diff"), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: Flesch reading-ease — the 1948 readability
# formula (206.835 - 1.015 words/sentence - 84.6 syllables/word) that
# still anchors text-quality stacks; here syllables are approximated
# by vowel groups, the standard cheap proxy. Complements the Gopher
# rules (text_gopher_quality) and the composite quality score with the
# classic readability axis.
# Exactness: word / sentence-mark / vowel-group counts are integer
# regex counts (identical semantics for these character-class patterns
# on both engines); the score is a FIXED expression tree over two
# divisions of exact integers, rounded 4dp.
# Scale: pure per-row string expressions — map-side only, zero
# shuffles before the output sort.
# ---------------------------------------------------------------------------


@register(
    "text_readability_flesch",
    oracle="""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
              AS BIGINT) AS n_syll
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syll,
       round(CAST(206835 * n_sentences * n_words
                  - 1015 * n_words * n_words
                  - 84600 * n_syll * n_sentences AS DOUBLE)
             / CAST(1000 * n_sentences * n_words AS DOUBLE), 4) AS flesch
FROM m ORDER BY doc_id
""",
    doc="Flesch reading-ease per document with vowel-group syllable "
    "proxy: integer regex counts (words, sentence marks, vowel "
    "groups), score = fixed expression tree over two exact-integer "
    "divisions rounded 4dp — the classic readability axis beside the "
    "Gopher rules; map-side only, zero shuffles",
    tags=("text", "quality"),
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.greatest(
            F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1)
        )
        .cast("long")
        .alias("n_sentences"),
        F.regexp_count(F.lower("text"), F.lit(r"[aeiou]+"))
        .cast("long")
        .alias("n_syll"),
    )
    # one division of exact BIGINTs: flesch = (206835·s·w − 1015·w² −
    # 84600·syl·s) / (1000·s·w) — order-invariant by construction, so a
    # value landing exactly on a 4dp half-boundary still rounds
    # identically on both engines (margin-audit INVARIANT_SAFE)
    num = (
        F.lit(206835) * F.col("n_sentences") * F.col("n_words")
        - F.lit(1015) * F.col("n_words") * F.col("n_words")
        - F.lit(84600) * F.col("n_syll") * F.col("n_sentences")
    )
    den = F.lit(1000) * F.col("n_sentences") * F.col("n_words")
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syll",
        F.round(num.cast("double") / den.cast("double"), 4).alias("flesch"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round-9 continuation: cross-source overlap matrix — which sources
# copy from each other? For every source pair, the number of distinct
# word trigrams they share and the Jaccard overlap: the corpus-mixing
# audit a training-data pipeline runs before weighting sources
# (boilerplate-heavy source pairs get down-weighted; a near-1 overlap
# means one source mirrors another). Shingle-resolution sibling of
# contamination_check (which tests train-vs-eval directionally).
# Exactness: all counts are distinct-shingle BIGINTs; Jaccard is one
# division of exact integers rounded 6dp.
# Scale: one distinct (shingle, source) shuffle, then a within-shingle
# source self-join whose fanout is bounded by |sources|^2 (= 25 here)
# per shingle — vocabulary-sized work, never document-pairwise.
# ---------------------------------------------------------------------------


@register(
    "source_overlap_matrix",
    oracle="""
WITH words AS (
  SELECT source, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT source, unnest(list_transform(
      generate_series(1, greatest(len(w) - 2, 1)),
      i -> array_to_string(w[i:i+2], ' '))) AS g
  FROM words
), per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY source
), shared AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM sh a JOIN sh b ON b.g = a.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.src_a, s.src_b, s.n_shared,
       pa.n_sh AS n_a, pb.n_sh AS n_b,
       round(CAST(s.n_shared AS DOUBLE)
             / CAST(pa.n_sh + pb.n_sh - s.n_shared AS DOUBLE), 6)
         AS jaccard
FROM shared s
JOIN per_src pa ON pa.source = s.src_a
JOIN per_src pb ON pb.source = s.src_b
ORDER BY s.src_a, s.src_b
""",
    doc="cross-source trigram overlap matrix: distinct shingles per "
    "source, shared shingles per source pair via a within-shingle "
    "self-join (fanout bounded by |sources|^2 per shingle), Jaccard "
    "one exact division — the corpus-mixing audit before weighting "
    "sources; vocabulary-sized shuffles, never document-pairwise",
    tags=("text", "dedup", "mining"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    d = t(spark, sf_dir, "documents")
    sh = d.select(
        "source", F.explode(shingles(F.col("text"), 3)).alias("g")
    ).distinct()
    per_src = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("source").alias("src_a"), "g")
    b = sh.select(F.col("source").alias("src_b"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per_src.select(
        F.col("source").alias("src_a"), F.col("n_sh").alias("n_a")
    )
    pb = per_src.select(
        F.col("source").alias("src_b"), F.col("n_sh").alias("n_b")
    )
    return (
        shared.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: truncation-loss report — every sequence model
# trains at a fixed context length, and the curation question is what
# a given max_len throws away: per source, the tokens beyond the first
# 128 per document, the share of documents affected, and the share of
# total token mass lost. The capacity-planning twin of
# length_bucketed_batches / pack_sequences_contiguous.
# Exactness: whitespace token counts and losses are BIGINT; the two
# shares are one division each, rounded 6dp.
# Scale: map-side token counting into one source-keyed rollup.
# ---------------------------------------------------------------------------

_TRUNC_MAX_LEN = 128


@register(
    "truncation_loss_report",
    oracle=f"""
WITH m AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(count(CASE WHEN n_tok > {_TRUNC_MAX_LEN} THEN 1 END) AS BIGINT)
         AS n_truncated,
       CAST(sum(greatest(n_tok - {_TRUNC_MAX_LEN}, 0)) AS BIGINT)
         AS tokens_lost,
       round(CAST(count(CASE WHEN n_tok > {_TRUNC_MAX_LEN} THEN 1 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS doc_share_truncated,
       round(CAST(sum(greatest(n_tok - {_TRUNC_MAX_LEN}, 0)) AS DOUBLE)
             / CAST(sum(n_tok) AS DOUBLE), 6) AS token_share_lost
FROM m GROUP BY source ORDER BY source
""",
    doc=f"truncation-loss report at max_len={_TRUNC_MAX_LEN}: per "
    "source, documents over the context length, whitespace tokens "
    "beyond it, and the doc/token shares lost — the capacity-planning "
    "twin of the packing gates; BIGINT counts, two end divisions; "
    "map-side counting into one source rollup",
    tags=("text", "ml", "quality"),
)
def truncation_loss_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    m = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    over = F.count(F.when(F.col("n_tok") > _TRUNC_MAX_LEN, 1))
    lost = F.sum(
        F.greatest(F.col("n_tok") - _TRUNC_MAX_LEN, F.lit(0).cast("long"))
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            over.alias("n_truncated"),
            lost.alias("tokens_lost"),
            F.round(
                over.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("doc_share_truncated"),
            F.round(
                lost.cast("double") / F.sum("n_tok").cast("double"), 6
            ).alias("token_share_lost"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: quality-aware canonical selection — dedup's
# final act: inside each exact-duplicate group (md5 of the normalized
# text), KEEP the best copy (longest, then lowest doc_id) and report
# per source what survived and what was removed. The "which copy do we
# keep" policy is where real pipelines differ from textbook dedup —
# this gate pins an explicit, total-ordered policy.
# Exactness: group keys are md5 strings (engine-exact), the keeper is
# an integer-ordered argmin via row_number, counts BIGINT.
# Scale: one hash-group shuffle + one rank window per group — the
# exact-dedup plan with a keep-policy window on top.
# ---------------------------------------------------------------------------


@register(
    "dedup_canonical_selection",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         md5(lower(trim(text))) AS h
  FROM documents
), ranked AS (
  SELECT doc_id, source, h,
         row_number() OVER (PARTITION BY h
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM keyed
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN rk = 1 THEN 1 END) AS BIGINT) AS n_kept,
       CAST(count(CASE WHEN rk > 1 THEN 1 END) AS BIGINT) AS n_removed
FROM ranked GROUP BY source ORDER BY source
""",
    doc="quality-aware canonical selection: exact-duplicate groups by "
    "md5(normalized text), keep the longest copy (doc_id tie-break) "
    "via one rank window, report kept/removed per source — pins the "
    "keep policy real dedup pipelines differ on; one hash-group "
    "shuffle + one window",
    tags=("text", "dedup"),
)
def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    w = Window.partitionBy("h").orderBy(F.desc("n_chars"), "doc_id")
    ranked = keyed.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("rk") == 1, 1)).alias("n_kept"),
            F.count(F.when(F.col("rk") > 1, 1)).alias("n_removed"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: MinHash estimator error audit — the sketch
# family's missing eval: for adjacent doc pairs, the 16-hash MinHash
# Jaccard ESTIMATE (matching min-slots / 16) next to the EXACT token
# Jaccard, with the absolute error per pair. Before trusting LSH band
# thresholds you look at exactly this table (the estimator's stderr is
# sqrt(J(1-J)/k) — the audit shows where 16 hashes is enough).
# Exactness: min-slot digests are md5 strings (engine-exact, min =
# string order both sides), match counts and set sizes are integers;
# estimate and exact are one division each and the error is a fixed
# two-term tree rounded 6dp.
# Scale: 16 md5 columns per (doc, token) into one doc-keyed min
# rollup — the minhash signature build's exact shape, then an adjacent
# -pair self-join.
# ---------------------------------------------------------------------------

_MHE_K = 16


@register(
    "minhash_error_audit",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), sig AS (
  SELECT doc_id,
         {", ".join(f"min(md5('s{i}:' || tok)) AS h{i}" for i in range(_MHE_K))}
  FROM toks GROUP BY doc_id
), sets AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok
  FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(_MHE_K))}
              AS BIGINT) AS n_match,
         CAST(len(list_intersect(a.tok, b.tok)) AS BIGINT) AS n_common,
         CAST(len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))
              AS BIGINT) AS n_union
  FROM sets a
  JOIN sets b ON b.doc_id = a.doc_id + 1
  JOIN sig sa ON sa.doc_id = a.doc_id
  JOIN sig sb ON sb.doc_id = b.doc_id
)
SELECT doc_a, doc_b, n_match, n_common, n_union,
       round(CAST(n_match AS DOUBLE) / {_MHE_K}.0, 6) AS est_jaccard,
       round(CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE), 6)
         AS exact_jaccard,
       round(abs(CAST(n_match AS DOUBLE) / {_MHE_K}.0
                 - CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE)), 6)
         AS abs_err
FROM pairs ORDER BY doc_a
""",
    doc="MinHash estimator error audit on adjacent doc pairs: 16-hash "
    "estimate (matching min md5 slots / 16) vs exact token Jaccard "
    "with per-pair absolute error — the table you read before trusting "
    "LSH band thresholds; signature build + one adjacent-pair join, "
    "md5 min-slots engine-exact",
    tags=("text", "dedup", "sketch", "eval"),
)
def minhash_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    )
    sig = toks.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("tok")))).alias(
                f"h{i}"
            )
            for i in range(_MHE_K)
        ]
    )
    sets = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tok")
    )
    a = sets.alias("a")
    b = sets.alias("b")
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    n_match = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(_MHE_K)
    ).cast("long")
    inter = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok"))).cast(
        "long"
    )
    union = (
        F.size(F.col("a.tok")) + F.size(F.col("b.tok"))
    ).cast("long") - inter
    est = F.col("n_match").cast("double") / F.lit(float(_MHE_K))
    exact = F.col("n_common").cast("double") / F.col("n_union").cast("double")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .join(sa, F.col("sa.doc_id") == F.col("a.doc_id"))
        .join(sb, F.col("sb.doc_id") == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            n_match.alias("n_match"),
            inter.alias("n_common"),
            union.alias("n_union"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            "n_common",
            "n_union",
            F.round(est, 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
        .orderBy("doc_a")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: language-ID confusion matrix — the eval table
# for the heuristic detector: declared lang (the `lang` column) vs
# detected lang (operators/text_analysis.detect_language, the gate-
# verified argmax over marker-word hits), counts per (declared,
# detected) cell plus per-declared-language accuracy. What a curation
# deployment reads before trusting lang filters at corpus scale.
# Exactness: cells are BIGINT counts; each accuracy is one division.
# Scale: one scan with the marker-word intersections + one ≤36-cell
# rollup.
# ---------------------------------------------------------------------------

_LANGID_DETECT_SQL = """
  SELECT doc_id, lang AS declared,
         CASE WHEN greatest(s_en, s_fr, s_de, s_es, s_zh) = 0 THEN 'und'
              WHEN s_zh >= greatest(s_en, s_fr, s_de, s_es) THEN 'zh'
              WHEN s_fr >= greatest(s_en, s_de, s_es) THEN 'fr'
              WHEN s_es >= greatest(s_en, s_de) THEN 'es'
              WHEN s_en >= s_de THEN 'en'
              ELSE 'de' END AS detected
  FROM (
    SELECT doc_id, lang,
           len(list_intersect(list_distinct(string_split(lower(text), ' ')),
               ['the','and','of','to','in','is','that','it','for','with'])) AS s_en,
           len(list_intersect(list_distinct(string_split(lower(text), ' ')),
               ['le','la','les','de','des','et','un','une','est','que'])) AS s_fr,
           len(list_intersect(list_distinct(string_split(lower(text), ' ')),
               ['der','die','das','und','ist','ein','eine','nicht','mit','zu'])) AS s_de,
           len(list_intersect(list_distinct(string_split(lower(text), ' ')),
               ['el','la','los','las','de','y','un','una','es','que'])) AS s_es,
           len(list_intersect(list_distinct(string_split(lower(text), ' ')),
               ['de5','shi4','le5','zai4','you3','wo3','ta1','zhe4','bu4','ren2'])) AS s_zh
    FROM documents
  )
"""


@register(
    "langid_confusion_matrix",
    oracle=f"""
WITH pred AS ({_LANGID_DETECT_SQL}),
decl_tot AS (
  SELECT declared, CAST(count(*) AS BIGINT) AS n_declared
  FROM pred GROUP BY declared
)
SELECT p.declared, p.detected,
       CAST(count(*) AS BIGINT) AS n,
       d.n_declared,
       round(CAST(count(*) AS DOUBLE) / CAST(d.n_declared AS DOUBLE), 6)
         AS cell_share
FROM pred p JOIN decl_tot d ON d.declared = p.declared
GROUP BY p.declared, p.detected, d.n_declared
ORDER BY p.declared, p.detected
""",
    doc="language-ID confusion matrix: declared lang column vs the "
    "heuristic detector's argmax, BIGINT counts per cell and the "
    "per-declared share (one division) — the eval a curation "
    "deployment reads before trusting lang filters; one scan + a "
    "bounded-cell rollup",
    tags=("text", "langid", "eval"),
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import detect_language

    d = t(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("declared"),
        detect_language(F.col("text")).alias("detected"),
    )
    decl_tot = pred.groupBy("declared").agg(
        F.count(F.lit(1)).alias("n_declared")
    )
    return (
        pred.groupBy("declared", "detected")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(decl_tot), "declared")
        .select(
            "declared",
            "detected",
            "n",
            "n_declared",
            F.round(
                F.col("n").cast("double") / F.col("n_declared").cast("double"),
                6,
            ).alias("cell_share"),
        )
        .orderBy("declared", "detected")
    )


# ---------------------------------------------------------------------------
# Round-10 depth: hapax legomena share per source — the
# vocabulary-richness signal curation pipelines read next to Zipf slope
# and vocab drift: a source whose token distribution is all hapaxes is
# noise or boilerplate-free prose; one with almost none is templated.
# Exactness: BIGINT vocabulary and hapax counts, ratio one division 6dp.
# Scale: one (source, token) hash rollup then a source-keyed rollup.
# ---------------------------------------------------------------------------


@register(
    "text_hapax_ratio",
    oracle="""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), cnt AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, token
)
SELECT source,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS hapax,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       round(CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
FROM cnt GROUP BY source ORDER BY source
""",
    doc="hapax legomena share per source (vocabulary richness next to "
    "Zipf slope / vocab drift): per-source type count, hapax count, "
    "token total and hapax/vocab ratio — BIGINT counts, one division "
    "6dp; one (source, token) rollup then a source rollup",
    tags=("text", "quality"),
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.count(F.when(F.col("c") == 1, 1)).alias("hapax"),
            F.sum("c").alias("n_tokens"),
            F.round(
                F.count(F.when(F.col("c") == 1, 1)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-10 continuation: MRR@10 — the second standard retrieval metric
# next to nDCG (retrieval_ndcg_eval): reciprocal rank of the FIRST
# relevant hit per query, averaged. Exactness trick: ranks are <= 10
# and every 1..10 divides 2520 = lcm(1..10), so rr_scaled =
# 2520 div rank is an EXACT integer — the mean is one division of
# exact integers at the very end, no float reciprocals summed.
# Scale: rides the BM25 run (postings equi-joins); the eval itself is
# a per-query min + a 3-row window.
# ---------------------------------------------------------------------------


def _mrr_oracle() -> str:
    return f"""
WITH base AS ({_bm25_oracle()}),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
lab AS (
  SELECT b.query_id, b.rank,
         CASE WHEN d.dl > 30 THEN 1 ELSE 0 END AS rel
  FROM base b JOIN dl d USING (doc_id)
), firstrel AS (
  SELECT query_id,
         min(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank
  FROM lab GROUP BY query_id
), rr AS (
  SELECT query_id,
         CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
         CAST(coalesce(2520 // first_rel_rank, 0) AS BIGINT) AS rr_scaled
  FROM firstrel
)
SELECT query_id, first_rel_rank, rr_scaled,
       round(CAST(sum(rr_scaled) OVER () AS DOUBLE)
             / CAST(count(*) OVER () * 2520 AS DOUBLE), 6) AS mrr
FROM rr ORDER BY query_id
"""


@register(
    "retrieval_mrr_eval",
    oracle=_mrr_oracle(),
    doc="MRR@10 of the BM25 run: reciprocal rank of the first relevant "
    "hit (relevance = doc length > 30 tokens), scaled by "
    "lcm(1..10) = 2520 so every reciprocal is an EXACT integer "
    "(2520 div rank) and the mean is one end division — the second "
    "standard retrieval eval next to nDCG, riding the same "
    "margin-audited run",
    tags=("text", "retrieval", "eval"),
)
def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk, build_postings, literal_queries

    docs = t(spark, sf_dir, "documents")
    postings, doc_stats = build_postings(docs)
    queries = literal_queries(spark, _BM25_QUERIES)
    ranked = bm25_topk(
        postings, doc_stats, queries,
        k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK,
    ).select("query_id", "rank", "doc_id")
    dl = F.size(F.split("text", " "))
    rel = docs.select("doc_id", F.when(dl > 30, 1).otherwise(0).alias("rel"))
    # broadcast the 30-row run onto the doc-dim relevance table (never
    # the reverse — rel is corpus-sized at scale)
    firstrel = (
        rel.join(F.broadcast(ranked), "doc_id")
        .groupBy("query_id")
        .agg(
            F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias(
                "first_rel_rank"
            )
        )
    )
    rr = firstrel.select(
        "query_id",
        F.col("first_rel_rank").cast("long").alias("first_rel_rank"),
        F.coalesce(
            F.expr("2520 div first_rel_rank"), F.lit(0)
        ).cast("long").alias("rr_scaled"),
    )
    w_all = Window.partitionBy()
    return rr.select(
        "query_id",
        "first_rel_rank",
        "rr_scaled",
        F.round(
            F.sum("rr_scaled").over(w_all).cast("double")
            / (F.count(F.lit(1)).over(w_all) * 2520).cast("double"),
            6,
        ).alias("mrr"),
    ).orderBy("query_id")
