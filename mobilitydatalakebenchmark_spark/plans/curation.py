"""Round-7 continuation gates: corpus-curation and temporal primitives the
registry did not yet pin.

* interval coalescing (merge overlapping extents — the interval form of
  sessionization, reference W5 generalized);
* URL canonicalization dedup (operators/urls.py — the crawl-curation key);
* positional phrase retrieval + reciprocal-rank fusion (operators/
  retrieval.py — exact phrase queries over a positional inverted index,
  and the standard hybrid-ranker combiner);
* normalization-aware text dedup (case/punct/whitespace variants collapse);
* hour-of-day seasonality profile (the calendar-seasonality screen);
* equi-depth decile binning (feature discretization via ntile);
* bucketized big-big range join (promoting the operators/asof.py scale
  path, previously pytest-only, to an oracle gate);
* tolerance-bounded as-of lookup (asof_join + max-gap filter, vs DuckDB's
  native ASOF JOIN).

Hash-robustness: every gate is exact by construction — integer epochs and
counts, string algebra, ntile over a unique total order, or fixed-order
two-term IEEE sums (RRF) — no rounded quotient of a float aggregate
anywhere, so no margin-probe exposure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.codecs import epoch_us
from . import register
from .relational import t

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# ---------------------------------------------------------------------------
# Interval coalescing: each event opens a 30-minute extent; overlapping or
# touching extents per user merge into islands (operators/timeseries.
# coalesce_intervals). One shuffle on user_id; exact integer microseconds.
# ---------------------------------------------------------------------------

_IC_EXTENT_US = 30 * 60 * 1_000_000

# shared by interval_coalesce (batch) and streaming_islands_maintainer
# (stream-then-read): the maintained table must equal the from-scratch
# batch recompute, so both gates check against the SAME oracle.
_IC_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + {_IC_EXTENT_US} AS end_us
  FROM events
), g AS (
  SELECT user_id, start_us, end_us,
         CASE WHEN max(end_us) OVER (
                PARTITION BY user_id ORDER BY start_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start_us > max(end_us) OVER (
                PARTITION BY user_id ORDER BY start_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS new_island,
         event_id
  FROM iv
), s AS (
  SELECT user_id, start_us, end_us,
         CAST(sum(new_island) OVER (PARTITION BY user_id
                               ORDER BY start_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM g
)
SELECT user_id, island, min(start_us) AS start_us, max(end_us) AS end_us,
       count(*) AS n_rows
FROM s GROUP BY user_id, island
ORDER BY user_id, island
"""


@register(
    "interval_coalesce",
    oracle=_IC_ORACLE,
    doc="interval coalescing (operators/timeseries.coalesce_intervals): "
    "30-min event extents per user merged into overlap islands via the "
    "running-max-of-end construction — W5's gap sessionization "
    "generalized to rows carrying their own extent; exact integer "
    "microseconds, one user-keyed shuffle shared by both windows and "
    "the island aggregate",
    tags=("window", "time", "interval"),
)
def interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import coalesce_intervals

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("start_us"),
        (epoch_us("ts") + F.lit(_IC_EXTENT_US)).alias("end_us"),
    )
    return coalesce_intervals(
        ev, "user_id", "start_us", "end_us", tiebreak="event_id"
    ).orderBy("user_id", "island")


@register(
    "streaming_islands_maintainer",
    oracle=_IC_ORACLE,
    doc="the STREAMING islands maintainer gets its own driver verdict "
    "(streaming/intervals.py — previously pytest-only): the gate "
    "splits the interval rows into three parquet files, streams them "
    "through stream_islands as three file-source micro-batches "
    "(maxFilesPerTrigger=1, availableNow) into a bucket-partitioned "
    "islands table with (run, epoch) replay stamps, then reads the "
    "MAINTAINED table back; the oracle recomputes the islands from the "
    "raw events in one batch pass, so any associativity, replay-stamp "
    "or partition-overwrite defect in the incremental path flips a "
    "cell. Interval merge is associative, so batch arrival order "
    "cannot change the result",
    tags=("streaming", "window", "interval", "write"),
)
def streaming_islands_maintainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.intervals import read_islands, stream_islands

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_gates",
        f"stream_islands_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "src")
    table = os.path.join(base, "islands")
    ckpt = os.path.join(base, "ckpt")

    iv = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("start_us"),
        (epoch_us("ts") + F.lit(_IC_EXTENT_US)).alias("end_us"),
    )
    if iv.isEmpty():
        # empty source: zero micro-batches would ever fire and the sink
        # table is never created — the maintained result is empty
        # (degenerate sweep, r11)
        return spark.createDataFrame(
            [],
            "user_id long, island long, start_us long, end_us long,"
            " n_rows long",
        )
    # three arrival slices — each lands as ONE file so the file source
    # delivers exactly three micro-batches (gate-scale slices are small;
    # at fleet scale the stream arrives pre-batched by the source)
    for m in range(3):
        iv.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(iv.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_islands(stream, table, ckpt, "user_id")
    q.awaitTermination()

    # island ordinals are per-merge artifacts; read_islands re-derives
    # the per-key ordinal (cast long: the oracle's island is BIGINT and
    # the driver hash is type-sensitive)
    return (
        read_islands(spark, table, "user_id")
        .select(
            "user_id",
            F.col("island").cast("long").alias("island"),
            "start_us",
            "end_us",
            "n_rows",
        )
        .orderBy("user_id", "island")
    )


# ---------------------------------------------------------------------------
# URL canonicalization dedup. Raw URLs are synthesized in-plan from doc_id
# (the url_domain_topk decoration pattern) with the full mess: scheme/host
# case, www., explicit default port, trailing slash, utm_ params, fragment.
# doc_id % 24 controls the noise, doc_id % 10 the page — so each canonical
# page collapses many raw spellings and the gate verifies the whole
# canonicalization pipeline cell-by-cell. Pure string algebra — exact.
# ---------------------------------------------------------------------------


def _raw_url_sql() -> str:
    return (
        "(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' WHEN doc_id % 3 = 1 "
        "THEN 'https' ELSE 'http' END)"
        " || '://'"
        " || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)"
        " || 'Site' || CAST(doc_id % 10 AS VARCHAR) || '.Example.COM'"
        " || (CASE WHEN doc_id % 4 = 0 THEN (CASE WHEN doc_id % 3 = 2 "
        "THEN ':80' ELSE ':443' END) ELSE '' END)"
        " || '/page/' || CAST(doc_id % 5 AS VARCHAR)"
        " || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)"
        " || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=s' "
        "|| CAST(doc_id % 3 AS VARCHAR) || '&id=' "
        "|| CAST(doc_id % 4 AS VARCHAR) || '&utm_campaign=c' "
        "WHEN doc_id % 3 = 0 THEN '?id=' || CAST(doc_id % 4 AS VARCHAR) "
        "ELSE '' END)"
        " || (CASE WHEN doc_id % 6 = 0 THEN '#frag' "
        "|| CAST(doc_id AS VARCHAR) ELSE '' END)"
    )


def _raw_url_spark() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 3 == 0, F.lit("HTTPS"))
        .when(did % 3 == 1, F.lit("https"))
        .otherwise(F.lit("http")),
        F.lit("://"),
        F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"),
        (did % 10).cast("string"),
        F.lit(".Example.COM"),
        F.when(
            did % 4 == 0,
            F.when(did % 3 == 2, F.lit(":80")).otherwise(F.lit(":443")),
        ).otherwise(F.lit("")),
        F.lit("/page/"),
        (did % 5).cast("string"),
        F.when(did % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit("?utm_source=s"),
                (did % 3).cast("string"),
                F.lit("&id="),
                (did % 4).cast("string"),
                F.lit("&utm_campaign=c"),
            ),
        )
        .when(
            did % 3 == 0,
            F.concat(F.lit("?id="), (did % 4).cast("string")),
        )
        .otherwise(F.lit("")),
        F.when(
            did % 6 == 0, F.concat(F.lit("#frag"), did.cast("string"))
        ).otherwise(F.lit("")),
    )


def _url_canonical_oracle() -> str:
    from ..operators.urls import canonical_url_sql

    return f"""
WITH raw AS (
  SELECT doc_id, {_raw_url_sql()} AS url FROM documents
)
SELECT {canonical_url_sql('url')} AS canonical_url,
       count(*) AS n_raw,
       count(DISTINCT url) AS n_spellings,
       min(doc_id) AS keeper_doc
FROM raw
GROUP BY canonical_url
ORDER BY canonical_url
"""


@register(
    "url_canonical_dedup",
    oracle=_url_canonical_oracle(),
    doc="URL canonicalization dedup (operators/urls.py): lower scheme/"
    "host, strip www./fragment/default port/trailing slash/utm_ params "
    "as pure regexp column expressions, then one hash aggregate on the "
    "canonical key — the crawl-curation page-identity step; raw URLs "
    "synthesized in-plan from doc_id so the oracle replays every "
    "spelling variant exactly",
    tags=("text", "url", "dedup"),
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.urls import canonical_url

    raw = t(spark, sf_dir, "documents").select(
        "doc_id", _raw_url_spark().alias("url")
    )
    return (
        raw.groupBy(canonical_url(F.col("url")).alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("url").alias("n_spellings"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# Positional phrase retrieval: exact n-token phrase occurrences over a
# positional inverted index (operators/retrieval.positional_postings +
# phrase_match). Integer positions only — exact on any engine.
# ---------------------------------------------------------------------------

_PHRASES = {
    "p1": "table table",
    "p2": "fast merge batch",
    "p3": "the line sort",
}


def _phrase_oracle() -> str:
    vals = ", ".join(
        f"('{qid}', {i}, '{term}', {len(text.split())})"
        for qid, text in sorted(_PHRASES.items())
        for i, term in enumerate(text.split())
    )
    return f"""
WITH q(query_id, off, term, plen) AS (VALUES {vals}),
tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
  FROM documents
),
cand AS (
  SELECT q.query_id, tok.doc_id, tok.pos - q.off AS anchor, q.off, q.plen
  FROM tok JOIN q USING (term)
  WHERE tok.pos - q.off >= 0
),
anchors AS (
  SELECT query_id, doc_id, anchor
  FROM cand
  GROUP BY query_id, doc_id, anchor, plen
  HAVING count(DISTINCT off) = plen
)
SELECT query_id, doc_id, count(*) AS n_hits
FROM anchors GROUP BY query_id, doc_id
ORDER BY query_id, doc_id
"""


@register(
    "retrieval_phrase_match",
    oracle=_phrase_oracle(),
    doc="exact phrase retrieval over a positional inverted index "
    "(operators/retrieval.positional_postings + phrase_match): each "
    "matched (posting, phrase-token) pair proposes anchor pos-offset, "
    "an anchor where all plen offsets matched is one occurrence — one "
    "join against broadcast phrase terms, any phrase length, repeated "
    "tokens handled naturally; all-integer arithmetic",
    tags=("text", "retrieval", "index", "phrase"),
)
def retrieval_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import literal_phrases, phrase_match, positional_postings

    docs = t(spark, sf_dir, "documents")
    pp = positional_postings(docs)
    return phrase_match(pp, literal_phrases(spark, _PHRASES)).orderBy(
        "query_id", "doc_id"
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion: BM25 (scored ranker) fused with distinct-term
# overlap (lexical-recall ranker). Ranks are exact ints; each RRF score is
# two IEEE divisions summed in fixed order — bit-identical, no rounding.
# ---------------------------------------------------------------------------

_RRF_K = 60


def _rrf_oracle() -> str:
    from .text import _BM25_B, _BM25_K1, _BM25_QUERIES, _BM25_TOPK

    vals = ", ".join(
        f"('{qid}', '{term}')"
        for qid, text in sorted(_BM25_QUERIES.items())
        for term in dict.fromkeys(text.split())
    )
    k1, k1p1, one_b, b = (
        repr(_BM25_K1),
        repr(_BM25_K1 + 1.0),
        repr(1.0 - _BM25_B),
        repr(_BM25_B),
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
bm25 AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT)
             AS rank_a
  FROM folded
  QUALIFY rank_a <= {_BM25_TOPK}
),
ovl AS (
  SELECT q.query_id, p.doc_id,
         count(DISTINCT p.term) AS n_matched, min(ds.dl) AS dl
  FROM q JOIN postings p USING (term) JOIN ds USING (doc_id)
  GROUP BY q.query_id, p.doc_id
),
ovl_ranked AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY n_matched DESC, dl, doc_id) AS INT)
             AS rank_b
  FROM ovl
  QUALIFY rank_b <= {_BM25_TOPK}
),
fused AS (
  SELECT coalesce(a.query_id, b.query_id) AS query_id,
         coalesce(a.doc_id, b.doc_id) AS doc_id,
         a.rank_a, b.rank_b,
         coalesce(1.0 / ({_RRF_K} + a.rank_a), 0.0)
           + coalesce(1.0 / ({_RRF_K} + b.rank_b), 0.0) AS rrf_score
  FROM bm25 a FULL OUTER JOIN ovl_ranked b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS INT)
           AS fused_rank,
       doc_id,
       coalesce(rank_a, 0) AS rank_a,
       coalesce(rank_b, 0) AS rank_b,
       rrf_score
FROM fused
QUALIFY fused_rank <= {_BM25_TOPK}
ORDER BY query_id, fused_rank
"""


@register(
    "retrieval_rrf_fusion",
    oracle=_rrf_oracle(),
    doc="reciprocal-rank fusion of BM25 and distinct-term-overlap "
    "rankings (operators/retrieval.rrf_fuse, Cormack & Clarke 2009 "
    "k=60): ranks are exact ints, each fused score is two IEEE "
    "divisions summed in FIXED order — bit-identical doubles on both "
    "engines with no rounding; the hybrid-retrieval combiner for "
    "lexical + scored (or lexical + vector) rankers",
    tags=("text", "retrieval", "fusion"),
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import (
        bm25_topk,
        build_postings,
        literal_queries,
        overlap_topk,
        rrf_fuse,
    )
    from .text import _BM25_B, _BM25_K1, _BM25_QUERIES, _BM25_TOPK

    docs = t(spark, sf_dir, "documents")
    postings, doc_stats = build_postings(docs)
    # both rankers consume the postings group-by — checkpoint it once
    postings = postings.localCheckpoint(eager=False)
    queries = literal_queries(spark, _BM25_QUERIES)
    a = bm25_topk(
        postings, doc_stats, queries, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK
    )
    b = overlap_topk(postings, queries, topk=_BM25_TOPK)
    return rrf_fuse(a, b, k=_RRF_K, topk=_BM25_TOPK).orderBy(
        "query_id", "fused_rank"
    )


# ---------------------------------------------------------------------------
# Normalization-aware dedup: groups of 4 docs share a base text, each
# member decorated with different case/punct/whitespace noise; the
# normalizer (lower, strip non-alnum, collapse runs of spaces, trim) must
# collapse each group back to one canonical form. Pure string algebra.
# ---------------------------------------------------------------------------

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(noisy), "
    "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


@register(
    "text_normalize_dedup",
    oracle=f"""
WITH base AS (
  SELECT doc_id, doc_id - doc_id % 4 AS base_id FROM documents
),
paired AS (
  SELECT b.doc_id, b.base_id, d.text AS base_text
  FROM base b JOIN documents d ON d.doc_id = b.base_id
),
noised AS (
  SELECT doc_id, base_id,
         CASE doc_id % 4
           WHEN 0 THEN base_text
           WHEN 1 THEN upper(base_text)
           WHEN 2 THEN base_text || ' !!'
           ELSE replace(base_text, ' ', '  ')
         END AS noisy
  FROM paired
),
normed AS (
  SELECT doc_id, base_id, {_NORM_SQL} AS norm FROM noised
)
SELECT md5(norm) AS content_key,
       count(*) AS n_members,
       count(DISTINCT base_id) AS n_bases,
       min(doc_id) AS keeper_doc
FROM normed
GROUP BY content_key
ORDER BY content_key
""",
    doc="normalization-aware exact dedup: case/punctuation/whitespace "
    "variants (synthesized in-plan — groups of 4 docs share a base "
    "text with per-member noise) collapse under lower + strip-non-"
    "alnum + collapse-spaces + trim, then one hash aggregate on "
    "md5(normalized) — the cheap dedup tier that runs BEFORE MinHash "
    "in a curation pipeline; pure string algebra, zero float",
    tags=("text", "dedup", "normalize"),
)
def text_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 4).alias("base_id")
    )
    src = docs.select(
        F.col("doc_id").alias("base_id"), F.col("text").alias("base_text")
    )
    paired = base.join(src, "base_id")
    did = F.col("doc_id")
    noisy = (
        F.when(did % 4 == 0, F.col("base_text"))
        .when(did % 4 == 1, F.upper("base_text"))
        .when(did % 4 == 2, F.concat(F.col("base_text"), F.lit(" !!")))
        .otherwise(F.regexp_replace("base_text", " ", "  "))
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(noisy), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        paired.select("doc_id", "base_id", F.md5(norm).alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("base_id").alias("n_bases"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .orderBy("content_key")
    )


# ---------------------------------------------------------------------------
# Hour-of-day seasonality profile: counts per (event_type, hour), share of
# the type's total (ONE division of two bigints — bit-identical), peak
# hour flagged via rank on (count desc, hour asc). Exact throughout.
# ---------------------------------------------------------------------------


@register(
    "seasonal_hour_profile",
    oracle="""
WITH h AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hour, count(*) AS n_events
  FROM events GROUP BY event_type, hour
)
SELECT event_type, hour, n_events,
       CAST(n_events AS DOUBLE)
         / CAST(sum(n_events) OVER (PARTITION BY event_type) AS DOUBLE)
         AS share,
       (row_number() OVER (PARTITION BY event_type
                           ORDER BY n_events DESC, hour) = 1) AS is_peak
FROM h
ORDER BY event_type, hour
""",
    doc="hour-of-day seasonality profile per event type: grouped counts, "
    "per-type share (one bigint/bigint division — bit-identical, no "
    "rounding), peak hour via rank on (count desc, hour) — the "
    "calendar-seasonality screen behind load shaping and anomaly "
    "baselines; two windows share the one event_type shuffle",
    tags=("window", "time", "seasonality"),
)
def seasonal_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_type = Window.partitionBy("event_type")
    w_rank = w_type.orderBy(F.desc("n_events"), F.asc("hour"))
    return (
        h.withColumn(
            "share",
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w_type).cast("double"),
        )
        .withColumn("is_peak", F.row_number().over(w_rank) == 1)
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# Equi-depth decile binning: ntile(10) semantics over a UNIQUE total
# order (price cents, then the line's composite key) so bucket assignment
# is engine-deterministic; per-bin exact integer sums, divisions last.
# Spark side: NO partition-less ntile window (that pulls the whole fact
# into ONE task's sort — the r11 verdict's scale-killer finding). The
# global rank comes from the range-partitioned surrogate_keys pattern
# (rank within sampled ranges + broadcast cumulative range counts), and
# the decile from the closed-form ntile formula: with N rows, the first
# N%10 buckets take N div 10 + 1 rows, the rest N div 10 — identical
# bucket assignment to ntile(10), bit-exact vs the oracle's ntile.
# ---------------------------------------------------------------------------


@register(
    "equidepth_decile_bins",
    oracle="""
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem
),
b AS (
  SELECT cents,
         ntile(10) OVER (ORDER BY cents, l_orderkey, l_linenumber) AS decile
  FROM c
)
SELECT decile, count(*) AS n,
       round(sum(cents) / 100.0, 2) AS sum_price,
       min(cents) / 100.0 AS min_price,
       max(cents) / 100.0 AS max_price
FROM b GROUP BY decile ORDER BY decile
""",
    doc="equi-depth decile binning (feature discretization): ntile(10) "
    "over the unique total order (price cents, orderkey, linenumber) — "
    "deterministic bucket assignment on both engines — then exact "
    "integer per-bin sums with the division last; the quantile-"
    "bucketing primitive behind calibration curves and monotone "
    "feature encoders",
    tags=("agg", "window", "binning"),
)
def equidepth_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.codecs import surrogate_keys

    li = t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked = surrogate_keys(
        li,
        ["cents", "l_orderkey", "l_linenumber"],
        out_col="_grk",
        total_col="_n",
    )
    # closed-form ntile(10) from (global rank, N); CASE short-circuits so
    # the div-by-zero branch is unreachable when N < 10
    deciled = ranked.withColumn(
        "decile",
        F.expr(
            "CAST(CASE WHEN _grk <= (_n % 10) * (_n div 10 + 1)"
            " THEN (_grk - 1) div (_n div 10 + 1) + 1"
            " ELSE (_n % 10) + (_grk - (_n % 10) * (_n div 10 + 1) - 1)"
            "      div (_n div 10) + 1 END AS INT)"
        ),
    )
    return (
        deciled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("cents") / 100.0, 2).alias("sum_price"),
            (F.min("cents") / 100.0).alias("min_price"),
            (F.max("cents") / 100.0).alias("max_price"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Bucketized big-big range join: the operators/asof.range_join scale path
# (intervals exploded into fixed-width buckets, equi-join on bucket id,
# residual predicate) — previously pytest-only, now oracle-checked. The
# tier table here is small, but the PLAN is the big-big one: no broadcast
# theta join anywhere, the shuffle keys are uniform bucket ids.
# ---------------------------------------------------------------------------

_RJB_TIERS = [
    ("t0", 0.0, 25.0),
    ("t1", 25.0, 60.0),
    ("t2", 60.0, 110.0),
    ("t3", 110.0, 200.0),
    ("t4", 200.0, 1000.0),
]
_RJB_WIDTH = 20.0


@register(
    "range_join_bucketized",
    oracle=f"""
SELECT t.tier, count(*) AS n,
       CAST(sum(CAST(round(e.value * 1000000) AS BIGINT)) AS BIGINT)
         AS value_e6
FROM events e
JOIN (VALUES {', '.join(f"('{n}', {repr(lo)}, {repr(hi)})" for n, lo, hi in _RJB_TIERS)})
     t(tier, lo, hi)
  ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier ORDER BY t.tier
""",
    doc="bucketized big-big range join (operators/asof.range_join with "
    "bucket_width): intervals explode into the fixed-width buckets they "
    "overlap, fact rows key to their bucket, equi-join + residual "
    "predicate — the linear-shuffle plan that replaces the broadcast "
    "theta join when BOTH sides are large; totals as exact 1e-6-grid "
    "integers so the oracle compare is order-invariant",
    tags=("join", "range", "bucketized"),
)
def range_join_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import range_join

    ev = t(spark, sf_dir, "events")
    from ..session import local_df

    tiers = local_df(
        spark, _RJB_TIERS, "tier string, lo double, hi double"
    )
    return (
        range_join(ev, tiers, "value", bucket_width=_RJB_WIDTH)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "value_e6"
            ),
        )
        .orderBy("tier")
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of lookup: every purchase gets the latest prior
# click per user ONLY if it is within 2 hours — the staleness-bounded
# feature-lookup semantics (merge_asof tolerance=...). The match value
# passes through unmodified (no float aggregation); the gap is exact
# integer microseconds. Oracle: DuckDB's native ASOF JOIN + the same
# tolerance mask — an independent engine's asof semantics as the check.
# ---------------------------------------------------------------------------

_ASOF_TOL_US = 2 * 3600 * 1_000_000


@register(
    "asof_tolerance_lookup",
    oracle=f"""
WITH purchases AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
         c.value AS click_value,
         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT event_id, user_id, strftime(ts, '{TS_FMT_DUCK}') AS purchase_ts,
       purchase_value,
       CASE WHEN gap_us <= {_ASOF_TOL_US} THEN click_value END
           AS click_value,
       CASE WHEN gap_us <= {_ASOF_TOL_US} THEN gap_us END AS gap_us,
       coalesce(gap_us <= {_ASOF_TOL_US}, FALSE) AS matched
FROM j
ORDER BY event_id
""",
    doc="tolerance-bounded as-of lookup (operators/asof.asof_join + max-"
    "gap mask): purchases take the latest prior click per user only "
    "within 2 h — merge_asof(tolerance=...) semantics, the staleness "
    "bound every feature-store lookup needs; verified against DuckDB's "
    "NATIVE ASOF JOIN (an independent implementation of the "
    "semantics), values pass through unaggregated, gap is exact "
    "integer microseconds",
    tags=("join", "time", "asof"),
)
def asof_tolerance_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("value").alias("click_value"),
        F.col("ts").alias("click_ts"),
    )
    j = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        value_cols=["click_value", "click_ts"],
    )
    gap = epoch_us("ts") - epoch_us("asof_click_ts")
    within = gap <= F.lit(_ASOF_TOL_US)
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        "purchase_value",
        F.when(within, F.col("asof_click_value")).alias("click_value"),
        F.when(within, gap).alias("gap_us"),
        F.coalesce(within, F.lit(False)).alias("matched"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Pareto frontier (skyline): per return flag, the lineitems not weakly
# dominated on (price low, quantity high). One RANGE-frame window on the
# price order gives the classic sweep: a row is on the frontier iff its
# quantity beats every STRICTLY cheaper row's max and it is the max
# quantity at its own price point. Exact integer cents / centi-units.
# ---------------------------------------------------------------------------


# shared by pareto_frontier_price_qty (batch) and
# streaming_pareto_maintainer (stream-then-read): frontier merge is
# associative and history-free, so the maintained table must equal the
# from-scratch batch sweep — same oracle for both.
_PARETO_ORACLE = """
WITH c AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         l_orderkey
  FROM lineitem
),
swept AS (
  SELECT flag, cents, qty_c, l_orderkey,
         max(qty_c) OVER (PARTITION BY flag ORDER BY cents
                          RANGE BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS best_cheaper,
         max(qty_c) OVER (PARTITION BY flag, cents) AS best_here
  FROM c
)
SELECT flag, cents / 100.0 AS price, qty_c / 100.0 AS quantity,
       count(*) AS n_dups, min(l_orderkey) AS keeper_order
FROM swept
WHERE qty_c > coalesce(best_cheaper, -1) AND qty_c = best_here
GROUP BY flag, cents, qty_c
ORDER BY flag, cents
"""


@register(
    "pareto_frontier_price_qty",
    oracle=_PARETO_ORACLE,
    doc="Pareto frontier / skyline per return flag on (minimize price, "
    "maximize quantity): one price-ordered RANGE-frame window per "
    "group — keep rows whose quantity beats every strictly-cheaper "
    "row's max and equal the max at their own price — the multi-"
    "objective shortlist operator (cheapest-per-capability screens); "
    "exact integer grids, the frontier group-by dedups ties",
    tags=("window", "skyline", "optimizer"),
)
def pareto_frontier_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        "l_orderkey",
    )
    w_cheaper = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_here = Window.partitionBy("flag", "cents")
    swept = li.withColumn(
        "best_cheaper", F.max("qty_c").over(w_cheaper)
    ).withColumn("best_here", F.max("qty_c").over(w_here))
    frontier = swept.filter(
        (F.col("qty_c") > F.coalesce(F.col("best_cheaper"), F.lit(-1)))
        & (F.col("qty_c") == F.col("best_here"))
    )
    return (
        frontier.groupBy("flag", "cents", "qty_c")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("l_orderkey").alias("keeper_order"),
        )
        .select(
            "flag",
            (F.col("cents") / 100.0).alias("price"),
            (F.col("qty_c") / 100.0).alias("quantity"),
            "n_dups",
            "keeper_order",
        )
        .orderBy("flag", "price")
    )


def _gate_tmp(sf_dir: str, name: str) -> str:
    """Fresh scratch root for a write-path gate (per gate x SF)."""
    import os
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_gates",
        f"{name}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    return base


@register(
    "streaming_pareto_maintainer",
    oracle=_PARETO_ORACLE,
    doc="the STREAMING Pareto-frontier maintainer gets its own driver "
    "verdict (streaming/skyline_stream.py — previously pytest-only): "
    "lineitem (flag, price-cents, qty) points split into three parquet "
    "files stream through stream_frontier as three micro-batches "
    "(maxFilesPerTrigger=1, availableNow) into the bucket-partitioned "
    "frontier table; the gate reads the MAINTAINED frontier back and "
    "the oracle re-sweeps from scratch — valid because dominance only "
    "grows (a point dominated at any epoch stays dominated in the full "
    "set), so frontier(frontier(A) ∪ B) == frontier(A ∪ B) and "
    "survivor multiplicities/keeper ids are exact",
    tags=("streaming", "skyline", "write"),
)
def streaming_pareto_maintainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..streaming.skyline_stream import read_frontier, stream_frontier

    base = _gate_tmp(sf_dir, "stream_pareto")
    src_dir = os.path.join(base, "src")

    pts = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        "l_orderkey",
    )
    if pts.isEmpty():
        # empty source: no batch ever fires, the frontier table is never
        # created — the maintained skyline is empty (degenerate sweep)
        return spark.createDataFrame(
            [],
            "flag string, price double, quantity double, n_dups long,"
            " keeper_order long",
        )
    for m in range(3):
        pts.filter(F.col("l_orderkey") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_frontier(
        stream,
        os.path.join(base, "frontier"),
        os.path.join(base, "ckpt"),
        by="flag",
        cost_col="cents",
        gain_col="qty_c",
        id_col="l_orderkey",
    )
    q.awaitTermination()

    return (
        read_frontier(spark, os.path.join(base, "frontier"))
        .select(
            "flag",
            (F.col("cents") / 100.0).alias("price"),
            (F.col("qty_c") / 100.0).alias("quantity"),
            "n_dups",
            F.col("l_orderkey").alias("keeper_order"),
        )
        .orderBy("flag", "price")
    )


@register(
    "streaming_rollup_maintainer",
    oracle="""
WITH x AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT bucket_ts,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS total,
       min(cents) AS vmin,
       max(cents) AS vmax
FROM x GROUP BY bucket_ts ORDER BY bucket_ts
""",
    doc="the STREAMING continuous-aggregate maintainer gets its own "
    "driver verdict (streaming/rollup_stream.py — previously "
    "pytest-only): events stream through stream_rollup as three "
    "file-source micro-batches into the day-partitioned rollup table "
    "(DAY buckets at gate scale: every micro-batch spans the whole "
    "month, so hour buckets would rewrite ~720 tiny partitions per "
    "epoch and the gate would time out on file ops, not logic; the "
    "touched-partition pruning under test is identical) "
    "(per batch: build partials, read back ONLY touched bucket "
    "partitions, merge states exactly — sums of sums, min of mins — "
    "rewrite via dynamic partition overwrite under a (run, epoch) "
    "stamp); the gate reads the MAINTAINED table and the oracle "
    "recomputes from the raw rows, so a merge, replay-stamp or "
    "pruning defect flips a cell. Exact integer cents",
    tags=("streaming", "rollup", "write"),
)
def streaming_rollup_maintainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..streaming.rollup_stream import read_rollup, stream_rollup

    base = _gate_tmp(sf_dir, "stream_rollup")
    src_dir = os.path.join(base, "src")

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    if ev.isEmpty():
        # empty source: the rollup table is never created (degenerate)
        return spark.createDataFrame(
            [],
            "bucket_ts timestamp, n long, total long, vmin long,"
            " vmax long",
        )
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_rollup(
        stream,
        os.path.join(base, "rollup"),
        os.path.join(base, "ckpt"),
        ts_col="ts",
        val_col="cents",
        bucket="day",
    )
    q.awaitTermination()

    return (
        read_rollup(spark, os.path.join(base, "rollup"))
        .select("bucket_ts", "n", "total", "vmin", "vmax")
        .orderBy("bucket_ts")
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) apportionment: split a fixed token budget
# across sources proportionally to their exact token counts, distributing
# the rounding leftover to the largest remainders. Pure BIGINT algebra
# (budget*tokens <= ~1e13 — far inside long range), engine-identical.
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 1_000_000


@register(
    "budget_apportion_sources",
    oracle=f"""
WITH toks AS (
  SELECT source,
         CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS total FROM toks),
q AS (
  SELECT source, n_tokens,
         CAST(({_BUDGET_TOKENS} * n_tokens) // total AS BIGINT)
           AS floor_alloc,
         ({_BUDGET_TOKENS} * n_tokens) % total AS remainder
  FROM toks CROSS JOIN tot
),
lo AS (
  SELECT {_BUDGET_TOKENS} - sum(floor_alloc) AS leftover FROM q
),
r AS (
  SELECT source, n_tokens, floor_alloc, remainder,
         row_number() OVER (ORDER BY remainder DESC, source) AS rnk
  FROM q
)
SELECT source, n_tokens, floor_alloc,
       CASE WHEN rnk <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END AS extra,
       CAST(floor_alloc
         + CASE WHEN rnk <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END
         AS BIGINT) AS alloc
FROM r
ORDER BY source
""",
    doc="largest-remainder (Hamilton) budget apportionment: a fixed "
    "1M-token budget split across sources proportional to exact token "
    "counts, floor quotas first, the leftover distributed one each to "
    "the largest remainders (source tiebreak) — the data-mixing "
    "allocator that hits the budget EXACTLY (temperature resampling's "
    "rates never do); pure bigint div/mod, the leftover scalar "
    "broadcasts",
    tags=("text", "sampling", "apportionment"),
)
def budget_apportion_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text")
        - F.length(F.regexp_replace("text", " ", ""))
        + 1
    ).cast("long")
    toks = docs.groupBy("source").agg(F.sum(n_tokens).alias("n_tokens"))
    tot = toks.agg(F.sum("n_tokens").alias("total"))
    q = toks.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"({_BUDGET_TOKENS} * n_tokens) div total").alias("floor_alloc"),
        ((F.lit(_BUDGET_TOKENS) * F.col("n_tokens")) % F.col("total")).alias(
            "remainder"
        ),
    )
    lo = q.agg(
        (F.lit(_BUDGET_TOKENS) - F.sum("floor_alloc")).alias("leftover")
    )
    ranked = q.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("remainder"), F.asc("source"))),
    ).crossJoin(F.broadcast(lo))
    extra = F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "source",
        "n_tokens",
        "floor_alloc",
        extra.alias("extra"),
        (F.col("floor_alloc") + extra).alias("alloc"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# BPE encoding applied: train the same 3 merge rounds as bpe_train_rounds,
# then report the per-source compression the learned rules buy — the
# "apply the tokenizer" half of the BPE story (the train gate pins the
# rules; this pins the rewritten corpus itself via exact token counts).
# ---------------------------------------------------------------------------


def _bpe_encode_oracle() -> str:
    from .text import _BPE_ROUNDS

    parts = [
        "WITH t0 AS (SELECT doc_id, source, text FROM documents)"
    ]
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
  SELECT doc_id, source,
         trim(replace(
           replace(chr(1) || replace(text, ' ', ' ' || chr(1)) || ' ',
                   chr(1) || replace((SELECT pair FROM top{r}),
                                     ' ', ' ' || chr(1)) || ' ',
                   chr(1) || replace((SELECT pair FROM top{r}),
                                     ' ', '@') || ' '),
           chr(1), '')) AS text
  FROM t{r - 1}
)"""
        )
    parts.append(
        f"""
SELECT b.source,
       count(*) AS n_docs,
       CAST(sum(len(string_split(b.text, ' '))) AS BIGINT) AS tokens_before,
       CAST(sum(len(string_split(a.text, ' '))) AS BIGINT) AS tokens_after,
       CAST(sum(len(string_split(b.text, ' '))) AS BIGINT)
         - CAST(sum(len(string_split(a.text, ' '))) AS BIGINT) AS tokens_saved
FROM t0 b JOIN t{_BPE_ROUNDS} a USING (doc_id)
GROUP BY b.source
ORDER BY b.source
"""
    )
    return "".join(parts)


@register(
    "bpe_encode_corpus",
    oracle=_bpe_encode_oracle(),
    doc="BPE encoding applied per source (operators/bpe.bpe_train_rounds "
    "merged output): the 3 trained merge rules rewrite the corpus, the "
    "gate pins exact before/after/saved token counts per source — the "
    "tokenizer-application half of the BPE pair (bpe_train_rounds pins "
    "the rules); greedy left-to-right literal replace is engine-"
    "identical via the sentinel rendering, counts are exact bigints",
    tags=("text", "tokenizer", "iterative"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train_rounds
    from ..operators.text_analysis import token_count
    from .text import _BPE_ROUNDS

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    _, merged = bpe_train_rounds(docs, "text", n_rounds=_BPE_ROUNDS)
    before = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("tb")
    )
    after = merged.select("doc_id", token_count(F.col("text")).alias("ta"))
    joined = before.join(after, "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tb").alias("tokens_before"),
            F.sum("ta").alias("tokens_after"),
            (F.sum("tb") - F.sum("ta")).alias("tokens_saved"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Location l-diversity audit: k-anonymity's stronger sibling — a cell is
# publishable only if its visitors carry >= l DISTINCT sensitive values
# (event_type stands in for the sensitive attribute). Exact counts only.
# ---------------------------------------------------------------------------

_CELL10_SQL = """cast(floor((value % 80.0) / 10.0) AS BIGINT) AS cx,
         cast(floor(((value * 3.7) % 160.0) / 10.0) AS BIGINT) AS cy"""


@register(
    "l_diversity_cells",
    oracle=f"""
WITH obs AS (
  SELECT user_id, event_type, {_CELL10_SQL}
  FROM events
)
SELECT cx, cy,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_entities,
       cast(count(DISTINCT event_type) AS BIGINT) AS n_sensitive,
       cast(count(*) AS BIGINT) AS n_obs,
       count(DISTINCT event_type) < 3 AS suppressed
FROM obs GROUP BY cx, cy
ORDER BY cx, cy
""",
    doc="location l-diversity audit (operators/mobility_metrics."
    "l_diverse_cells, Machanavajjhala et al. 2007): per grid cell, "
    "exact distinct-entity AND distinct-sensitive-value counts, "
    "suppressing cells with fewer than l distinct sensitive values — "
    "the leak k-anonymity misses when all k visitors share the "
    "sensitive value; one cell-keyed shuffle like k_anonymity_cells",
    tags=("mobility", "agg", "privacy"),
)
def l_diversity_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mobility_metrics import l_diverse_cells

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    out = l_diverse_cells(
        ev,
        l=3,
        cell_lat_deg=10.0,
        cell_lon_deg=10.0,
        id_col="user_id",
        sensitive_col="event_type",
    )
    return out.select(
        "cx", "cy", "n_entities", "n_sensitive", "n_obs", "suppressed"
    ).orderBy("cx", "cy")


# ---------------------------------------------------------------------------
# Group-level k-fold assignment: every USER lands wholly in one fold
# (md5(user_id) % 5) — the leakage-safe cross-validation split (row-level
# splits like sample_hash_split leak a user's behavior across folds).
# Deterministic hash algebra; share is one bigint/bigint division.
# ---------------------------------------------------------------------------

_KFOLDS = 5


@register(
    "group_kfold_assign",
    oracle=f"""
WITH folded AS (
  SELECT CAST(CAST('0x' || substr(md5('fold:' || CAST(user_id AS VARCHAR)),
                                  1, 8) AS BIGINT) % {_KFOLDS} AS INT)
             AS fold,
         user_id, event_type
  FROM events
)
SELECT fold,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_users,
       cast(count(*) AS BIGINT) AS n_events,
       cast(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_purchases,
       CAST(count(*) AS DOUBLE)
         / CAST(sum(count(*)) OVER () AS DOUBLE) AS share
FROM folded
GROUP BY fold
ORDER BY fold
""",
    doc="group-level k-fold assignment: md5(user_id) mod 5 puts every "
    "user's rows wholly in one fold — the leakage-safe CV split (row-"
    "level splits leak a user across folds); engine-reproducible hash "
    "algebra, per-fold exact counts, share is one bigint division — "
    "membership is a pure function of the id, stable under any "
    "repartitioning",
    tags=("sampling", "ml", "split"),
)
def group_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.concat(F.lit("fold:"), F.col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % _KFOLDS
    ).cast("int")
    h = ev.select(fold.alias("fold"), "user_id", "event_type")
    w_all = Window.partitionBy()
    return (
        h.groupBy("fold")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_purchases"
            ),
        )
        .withColumn(
            "share",
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w_all).cast("double"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation per user: the persistence screen (r near 1 = a
# sticky series, near 0 = noise). Exact bigint moments over the lag pairs
# (values on their 1e-4 grid), numerator/denominator assembled with a
# FIXED operation order — int->double conversion, sqrt, multiply, divide
# are all IEEE-determined, so r is bit-identical with no rounding. At
# corpus scales where n*Sxx would exceed int64 (~1e5 rows per key at this
# grid), the sums switch to DECIMAL(38) — a cast, not a redesign.
# ---------------------------------------------------------------------------


@register(
    "acf_lag1_per_user",
    oracle="""
WITH v AS (
  SELECT user_id,
         CAST(round(value * 10000) AS BIGINT) AS x,
         lead(CAST(round(value * 10000) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM events
),
m AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM v WHERE y IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS acf1
FROM m
WHERE n >= 2
ORDER BY user_id
""",
    doc="lag-1 autocorrelation per user (the persistence/stickiness "
    "screen): lead-window pairs on the per-user sort, Pearson r from "
    "exact bigint moments on the value's 1e-4 grid, assembled in one "
    "fixed IEEE order (conversion, sqrt, multiply, divide are all "
    "correctly-rounded ops) — bit-identical with no rounding; "
    "degenerate (constant) series emit NULL; one user-keyed shuffle "
    "shared by the window and the aggregate",
    tags=("window", "time", "stats"),
)
def acf_lag1_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    x = F.round(F.col("value") * 10000).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select("user_id", "ts", "event_id", x.alias("x")).withColumn(
        "y", F.lead("x").over(w)
    )
    m = (
        v.filter(F.col("y").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    var_x = n * F.col("sxx") - sx * sx
    var_y = n * F.col("syy") - sy * sy
    num = (n * F.col("sxy") - sx * sy).cast("double")
    acf1 = F.when(
        (var_x > 0) & (var_y > 0),
        num / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double"))),
    )
    return (
        m.filter(n >= 2)
        .select("user_id", n.alias("n_pairs"), acf1.alias("acf1"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Hierarchy flattening: ancestors to depth 4 over an explicit parent-
# pointer edge table (parent = node div 2 — a binary-heap-shaped org
# chart synthesized from customer keys). The Spark plan is the bounded
# join-chain (the warehouse way: d broadcast self-joins for depth d);
# the oracle replays it with a genuinely RECURSIVE CTE, pinning that the
# chain equals real recursion. Integer keys only.
# ---------------------------------------------------------------------------

_HIER_DEPTH = 4


@register(
    "hierarchy_ancestors",
    oracle=f"""
WITH RECURSIVE edges AS (
  SELECT c_custkey AS node, c_custkey // 2 AS parent
  FROM customer WHERE c_custkey >= 2
),
anc(node, depth, ancestor) AS (
  SELECT node, 1 AS depth, parent AS ancestor FROM edges
  UNION ALL
  SELECT a.node, a.depth + 1, e.parent
  FROM anc a JOIN edges e ON e.node = a.ancestor
  WHERE a.depth < {_HIER_DEPTH}
)
SELECT node, depth, ancestor
FROM anc
ORDER BY node, depth
""",
    doc="hierarchy flattening to depth 4 (org-chart / BOM ancestor "
    "expansion): parent-pointer edge table (parent = custkey div 2), "
    "Spark runs the bounded broadcast join-chain — one self-join per "
    "level, the plan shape that scales because each level is an equi-"
    "join, never a driver loop — while the oracle replays it with a "
    "genuinely RECURSIVE CTE; ancestors above the root fall out "
    "because the join finds no edge row (custkey 1 has none)",
    tags=("join", "hierarchy", "iterative"),
)
def hierarchy_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    edges = cust.filter(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").alias("node"),
        F.expr("c_custkey div 2").alias("parent"),
    )
    # level 1 straight from the edge table; deeper levels re-join the
    # edge table on the previous level's ancestor
    level = edges.select("node", F.lit(1).alias("depth"), F.col("parent").alias("ancestor"))
    out = level
    for _ in range(2, _HIER_DEPTH + 1):
        level = (
            level.join(
                edges.select(
                    F.col("node").alias("ancestor"),
                    F.col("parent").alias("_up"),
                ),
                "ancestor",
            )
            .select(
                "node",
                (F.col("depth") + 1).alias("depth"),
                F.col("_up").alias("ancestor"),
            )
        )
        out = out.unionByName(level)
    return out.orderBy("node", "depth")


# ---------------------------------------------------------------------------
# Weighted median per group: first price (in the exact cents order) whose
# running quantity weight reaches half the group total — the robust
# central-price statistic mean-based summaries miss. Pure bigints; the
# 2*cum >= total comparison avoids any division.
# ---------------------------------------------------------------------------


@register(
    "weighted_median_price",
    oracle="""
WITH c AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         l_orderkey, l_linenumber
  FROM lineitem
),
r AS (
  SELECT flag, cents, qty_c,
         sum(qty_c) OVER (PARTITION BY flag
                          ORDER BY cents, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cum_w,
         sum(qty_c) OVER (PARTITION BY flag) AS total_w
  FROM c
)
SELECT flag,
       min(cents) / 100.0 AS wmedian_price,
       min(total_w) / 100.0 AS total_weight
FROM r
WHERE 2 * cum_w >= total_w
GROUP BY flag
ORDER BY flag
""",
    doc="weighted median price per return flag (weight = quantity): one "
    "per-group sort shared by the running-weight and total windows, "
    "the median is the first row where 2*cum >= total — all-bigint "
    "comparison, no division until the final display scale; the "
    "robust central-price statistic, and the exact reference for a "
    "sketch-based weighted quantile at 100 TB",
    tags=("window", "agg", "stats"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("flag")
    r = li.withColumn("cum_w", F.sum("qty_c").over(w_cum)).withColumn(
        "total_w", F.sum("qty_c").over(w_tot)
    )
    return (
        r.filter(2 * F.col("cum_w") >= F.col("total_w"))
        .groupBy("flag")
        .agg(
            (F.min("cents") / 100.0).alias("wmedian_price"),
            (F.min("total_w") / 100.0).alias("total_weight"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen: the classic fabricated-numbers detector.
# Counts are exact; observed share is ONE bigint division; the expected
# Benford mass is a shared repr() literal per digit — every float on
# both sides is the identical IEEE value, so the deviation column needs
# no rounding.
# ---------------------------------------------------------------------------

import math as _math

_BENFORD = {d: repr(_math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def _benford_case_sql() -> str:
    # CAST each literal: DuckDB types a bare 0.30102999... literal as
    # DECIMAL(17,16), which would ship a Decimal column where Spark
    # ships a double — same value, different wire type
    whens = " ".join(
        f"WHEN {d} THEN CAST({lit} AS DOUBLE)" for d, lit in _BENFORD.items()
    )
    return f"CASE digit {whens} END"


@register(
    "benford_first_digit",
    oracle=f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM lineitem
  WHERE l_extendedprice > 0
),
c AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
),
tot AS (SELECT sum(n) AS total FROM c)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS observed,
       {_benford_case_sql()} AS expected,
       CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
         - {_benford_case_sql()} AS deviation
FROM c CROSS JOIN tot
ORDER BY digit
""",
    doc="Benford first-digit screen (the fabricated-numbers detector "
    "from forensic accounting / DQ): leading digit of exact price "
    "cents, per-digit counts, observed share as one bigint division, "
    "expected mass log10(1+1/d) as shared repr literals — every float "
    "identical on both engines, the deviation column ships unrounded; "
    "one 9-group aggregate, scan-dominated at any scale",
    tags=("agg", "quality", "stats"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    digit = F.substring(
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
        1,
        1,
    ).cast("int")
    c = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.agg(F.sum("n").alias("total"))
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == d, F.lit(float(_BENFORD[d]))
        ).otherwise(expected)
    observed = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            observed.alias("observed"),
            expected.alias("expected"),
            (observed - expected).alias("deviation"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Key-skew observability: per key-space, the exact Gini coefficient of the
# per-key row-count distribution — the one number that says "this join/
# aggregation key will hot-spot". Gini from the sorted-rank identity
# G = (2*S1 - (n+1)*S0) / (n*S0) with S1 = sum(i * c_i) over counts
# sorted ascending — all BIGINT until one final division.
# ---------------------------------------------------------------------------


@register(
    "skew_gini_report",
    oracle="""
WITH uc AS (
  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY k
),
ur AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c, k) AS BIGINT) AS i FROM uc
),
um AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s0,
         CAST(sum(i * c) AS BIGINT) AS s1,
         max(c) AS max_c
  FROM ur
),
oc AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY k
),
orr AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c, k) AS BIGINT) AS i FROM oc
),
om AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s0,
         CAST(sum(i * c) AS BIGINT) AS s1,
         max(c) AS max_c
  FROM orr
)
SELECT 'events.user_id' AS key_space, n AS n_keys, s0 AS total_rows,
       max_c AS max_count,
       CAST(2 * s1 - (n + 1) * s0 AS DOUBLE) / CAST(n * s0 AS DOUBLE) AS gini
FROM um
UNION ALL
SELECT 'lineitem.l_orderkey', n, s0, max_c,
       CAST(2 * s1 - (n + 1) * s0 AS DOUBLE) / CAST(n * s0 AS DOUBLE)
FROM om
ORDER BY key_space
""",
    doc="key-skew observability report: exact Gini coefficient of the "
    "per-key row-count distribution for two join/agg key spaces, via "
    "the sorted-rank identity (2*S1 - (n+1)*S0)/(n*S0) — all-bigint "
    "moments over a range-partitioned global rank of the per-key count "
    "table (no single-task sort), ONE final division; the number that "
    "predicts shuffle hot-spotting before functions/skew.py salting is "
    "needed",
    tags=("agg", "skew", "observability"),
)
def skew_gini_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    def gini_of(df: DataFrame, key: str, label: str) -> DataFrame:
        counts = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        # per-key count table is SF-proportional: global rank via the
        # range-partitioned surrogate_keys pattern, not a partition-less
        # window (r12 de-weak — identical numbering, no one-task sort)
        from ..functions.codecs import surrogate_keys

        ranked = surrogate_keys(counts, ["c", "k"], out_col="i")
        m = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s0"),
            F.sum(F.col("i") * F.col("c")).alias("s1"),
            F.max("c").alias("max_c"),
        )
        n, s0, s1 = F.col("n"), F.col("s0"), F.col("s1")
        return m.select(
            F.lit(label).alias("key_space"),
            n.alias("n_keys"),
            s0.alias("total_rows"),
            F.col("max_c").alias("max_count"),
            (
                (2 * s1 - (n + 1) * s0).cast("double")
                / (n * s0).cast("double")
            ).alias("gini"),
        )

    ev = t(spark, sf_dir, "events")
    li = t(spark, sf_dir, "lineitem")
    return (
        gini_of(ev, "user_id", "events.user_id")
        .unionByName(gini_of(li, "l_orderkey", "lineitem.l_orderkey"))
        .orderBy("key_space")
    )


# ---------------------------------------------------------------------------
# Join-cardinality identity: the optimizer's equi-join size estimate from
# per-key histograms — sum over keys of cntA(k)*cntB(k) — must EQUAL the
# actual join row count. The gate computes both (histograms joined on the
# key vs the real join, counted) and pins the identity as a boolean, so
# a statistics regression in either path is a red row. All-bigint.
# ---------------------------------------------------------------------------


@register(
    "join_cardinality_estimate",
    oracle="""
WITH a AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS ca
  FROM orders GROUP BY k
),
b AS (
  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS cb
  FROM events GROUP BY k
),
est AS (
  SELECT CAST(sum(ca * cb) AS BIGINT) AS estimated,
         CAST(count(*) AS BIGINT) AS n_shared_keys
  FROM a JOIN b USING (k)
),
act AS (
  SELECT CAST(count(*) AS BIGINT) AS actual
  FROM orders o JOIN events e ON o.o_custkey = e.user_id
)
SELECT estimated, actual, n_shared_keys, estimated = actual AS identity_holds
FROM est CROSS JOIN act
""",
    doc="equi-join cardinality from per-key histograms: sum over shared "
    "keys of cntA*cntB (two group-bys + a key-table join — the plan an "
    "optimizer's statistics pass runs) pinned EQUAL to the actual join "
    "row count computed the expensive way; the in-plan identity "
    "boolean makes a statistics regression a red row, and the "
    "histogram form is how the estimate stays computable when the "
    "real join would be too big to materialize",
    tags=("join", "optimizer", "stats"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    ev = t(spark, sf_dir, "events")
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    est = a.join(b, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("estimated"),
        F.count(F.lit(1)).alias("n_shared_keys"),
    )
    act = orders.join(ev, orders.o_custkey == ev.user_id).agg(
        F.count(F.lit(1)).alias("actual")
    )
    return est.crossJoin(F.broadcast(act)).select(
        "estimated",
        "actual",
        "n_shared_keys",
        (F.col("estimated") == F.col("actual")).alias("identity_holds"),
    )


# ---------------------------------------------------------------------------
# Hybrid text+vector retrieval: the production RAG shape — BM25 over the
# documents table fused (RRF) with cosine top-k over the aligned
# embeddings table (vec_id == doc_id in the driver schema). Each query
# carries text terms AND a probe vector (the embedding of probe doc
# 0/1/2, the knn gates' convention). The vector rank rounds cosine to 4
# decimals with id tiebreak (the repo's ANN discipline); the RRF sum is
# the fixed-order two-term form — no further rounding anywhere.
# ---------------------------------------------------------------------------

_HYBRID_PROBE = {"q1": 0, "q2": 1, "q3": 2}


def _hybrid_oracle() -> str:
    from .text import _BM25_B, _BM25_K1, _BM25_QUERIES, _BM25_TOPK

    vals = ", ".join(
        f"('{qid}', '{term}')"
        for qid, text in sorted(_BM25_QUERIES.items())
        for term in dict.fromkeys(text.split())
    )
    probe_vals = ", ".join(
        f"('{qid}', {pid})" for qid, pid in sorted(_HYBRID_PROBE.items())
    )
    k1, k1p1, one_b, b = (
        repr(_BM25_K1),
        repr(_BM25_K1 + 1.0),
        repr(1.0 - _BM25_B),
        repr(_BM25_B),
    )
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
pq(query_id, probe_id) AS (VALUES {probe_vals}),
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
corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM ds),
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
bm25 AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT)
             AS rank_a
  FROM folded
  QUALIFY rank_a <= {_BM25_TOPK}
),
probes AS (
  SELECT pq.query_id, e.vec_id AS probe_id, e.embedding AS probe_vec
  FROM pq JOIN embeddings e ON e.vec_id = pq.probe_id
),
sims AS (
  SELECT p.query_id, e.vec_id AS doc_id,
         round(list_dot_product(p.probe_vec, e.embedding)
               / (sqrt(list_dot_product(p.probe_vec, p.probe_vec))
                  * sqrt(list_dot_product(e.embedding, e.embedding))), 4)
             AS cos_sim
  FROM probes p CROSS JOIN embeddings e
  WHERE e.vec_id != p.probe_id
),
vecrank AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, doc_id) AS INT)
             AS rank_b
  FROM sims
  QUALIFY rank_b <= {_BM25_TOPK}
),
fused AS (
  SELECT coalesce(a.query_id, b.query_id) AS query_id,
         coalesce(a.doc_id, b.doc_id) AS doc_id,
         a.rank_a, b.rank_b,
         coalesce(1.0 / (60 + a.rank_a), 0.0)
           + coalesce(1.0 / (60 + b.rank_b), 0.0) AS rrf_score
  FROM bm25 a FULL OUTER JOIN vecrank b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS INT)
           AS fused_rank,
       doc_id,
       coalesce(rank_a, 0) AS rank_a,
       coalesce(rank_b, 0) AS rank_b,
       rrf_score
FROM fused
QUALIFY fused_rank <= {_BM25_TOPK}
ORDER BY query_id, fused_rank
"""


@register(
    "retrieval_hybrid_text_vector",
    oracle=_hybrid_oracle(),
    doc="hybrid text+vector retrieval (the RAG-serving shape): BM25 over "
    "the documents inverted index RRF-fused with cosine top-10 over "
    "the id-aligned embeddings table (each query = text terms + a "
    "probe vector) — operators/retrieval.rrf_fuse combining the two "
    "rank tables; lexical side reuses the bm25_topk plan (posting-"
    "list-pruned joins), vector side is the brute-force scan with "
    "hoisted norms, ranked on 4-decimal cosine with id tiebreak; the "
    "fuse itself is a topk-sized full-outer join per query",
    tags=("text", "vector", "retrieval", "fusion"),
)
def retrieval_hybrid_text_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk, build_postings, literal_queries, rrf_fuse
    from .text import _BM25_B, _BM25_K1, _BM25_QUERIES, _BM25_TOPK
    from .vectors import dot, norm

    docs = t(spark, sf_dir, "documents")
    postings, doc_stats = build_postings(docs)
    queries = literal_queries(spark, _BM25_QUERIES)
    a = bm25_topk(
        postings, doc_stats, queries, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK
    ).select("query_id", "doc_id", "rank")

    e = t(spark, sf_dir, "embeddings", heavy=True)
    from ..session import local_df

    pq = local_df(
        spark, sorted(_HYBRID_PROBE.items()), "query_id string, probe_id long"
    )
    probes = pq.join(
        e.select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
        ),
        "probe_id",
    ).withColumn("_pn", norm(F.col("probe_vec")))
    sims = (
        e.withColumn("_vn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("probe_vec"), F.col("embedding"))
                / (F.col("_vn") * F.col("_pn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    b = (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "doc_id", "rank")
    )
    return rrf_fuse(a, b, k=60, topk=_BM25_TOPK).orderBy(
        "query_id", "fused_rank"
    )


# ---------------------------------------------------------------------------
# Distribution-drift screen: Pearson chi-square on the event-type mix
# between two time windows (the dataset-shift detector run between
# corpus/feed versions before retraining). Every observed/expected value
# derives from exact bigint counts through a FIXED expression tree, and
# the chi-square total is an ordered fold over the type labels — no
# float aggregation order anywhere, so no rounding is needed at all.
# ---------------------------------------------------------------------------

_DRIFT_CUT = "2024-01-16 00:00:00"


@register(
    "drift_chi2_event_mix",
    oracle=f"""
WITH c AS (
  SELECT event_type,
         CAST(count(*) FILTER (WHERE ts <  TIMESTAMP '{_DRIFT_CUT}')
              AS BIGINT) AS o1,
         CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '{_DRIFT_CUT}')
              AS BIGINT) AS o2
  FROM events GROUP BY event_type
),
tot AS (
  SELECT sum(o1) AS t1, sum(o2) AS t2, sum(o1 + o2) AS t FROM c
),
cells AS (
  SELECT event_type, o1, o2,
         CAST(t1 AS DOUBLE) * (CAST(o1 + o2 AS DOUBLE) / CAST(t AS DOUBLE))
             AS e1,
         CAST(t2 AS DOUBLE) * (CAST(o1 + o2 AS DOUBLE) / CAST(t AS DOUBLE))
             AS e2
  FROM c CROSS JOIN tot
),
contrib AS (
  -- a zero-expected cell (one side of the cut empty) contributes 0 by
  -- the standard chi-square empty-margin convention — pinned on both
  -- engines instead of 0/0 (degenerate sweep, r11; no-op when both
  -- halves have data)
  SELECT event_type, o1, o2, e1, e2,
         (CASE WHEN e1 = 0 THEN 0.0 ELSE
            (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / e1 END)
           + (CASE WHEN e2 = 0 THEN 0.0 ELSE
            (CAST(o2 AS DOUBLE) - e2) * (CAST(o2 AS DOUBLE) - e2) / e2 END)
             AS cell_chi2
  FROM cells
)
SELECT event_type, o1, o2, e1, e2, cell_chi2,
       (SELECT list_sum(list(cell_chi2 ORDER BY event_type)) FROM contrib)
           AS chi2_total
FROM contrib
ORDER BY event_type
""",
    doc="distribution-drift screen: Pearson chi-square of the event-type "
    "mix across a time cut (the dataset-shift detector between feed/"
    "corpus versions): per-type observed bigints, expected cells from "
    "the pooled margin through one fixed expression tree, the total an "
    "ordered fold over type labels — every float identical on both "
    "engines, nothing rounded; two map-side-combined counts, the "
    "5-row statistic table broadcasts",
    tags=("agg", "quality", "drift", "stats"),
)
def drift_chi2_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cut = F.lit(_DRIFT_CUT).cast("timestamp")
    c = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("ts") < cut, 1)).alias("o1"),
        F.count(F.when(F.col("ts") >= cut, 1)).alias("o2"),
    )
    tot = c.agg(
        F.sum("o1").alias("t1"),
        F.sum("o2").alias("t2"),
        F.sum(F.col("o1") + F.col("o2")).alias("t"),
    )
    pooled = (F.col("o1") + F.col("o2")).cast("double") / F.col("t").cast(
        "double"
    )
    cells = c.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "o1",
        "o2",
        (F.col("t1").cast("double") * pooled).alias("e1"),
        (F.col("t2").cast("double") * pooled).alias("e2"),
    )
    d1 = F.col("o1").cast("double") - F.col("e1")
    d2 = F.col("o2").cast("double") - F.col("e2")
    # zero-expected cells contribute 0 (see the oracle's note)
    contrib = cells.withColumn(
        "cell_chi2",
        F.when(F.col("e1") == 0, F.lit(0.0)).otherwise(d1 * d1 / F.col("e1"))
        + F.when(F.col("e2") == 0, F.lit(0.0)).otherwise(
            d2 * d2 / F.col("e2")
        ),
    )
    total = contrib.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "cell_chi2"))),
            F.lit(0.0),
            lambda acc, s: acc + s["cell_chi2"],
        ).alias("chi2_total")
    )
    return (
        contrib.crossJoin(F.broadcast(total))
        .select(
            "event_type", "o1", "o2", "e1", "e2", "cell_chi2", "chi2_total"
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (Achlioptas ±1 signs): the
# embedding-preprocessing step before cheaper ANN / clustering. The sign
# matrix is derived from md5 in PYTHON and embedded as shared literal
# arrays in both plans, each projected coordinate is ONE ordered fold
# (zip_with + aggregate == DuckDB list_dot_product) — bit-identical
# doubles, nothing rounded. The JL distortion bound itself is pytest-
# checked against numpy (tests/test_curation.py).
# ---------------------------------------------------------------------------

_JL_D, _JL_K = 64, 8


def _jl_sign(j: int, i: int) -> float:
    import hashlib

    h = hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) < 8 else -1.0


_JL_SIGNS = [[_jl_sign(j, i) for i in range(_JL_D)] for j in range(_JL_K)]


def _jl_oracle() -> str:
    # embedding is FLOAT[]; cast to DOUBLE[] so DuckDB accumulates the
    # fold in double like Spark's cast-then-aggregate (a float32
    # accumulator differs in the last ~1e-7)
    projs = ",\n       ".join(
        f"list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"CAST({_JL_SIGNS[j]} AS DOUBLE[])) AS p{j}"
        for j in range(_JL_K)
    )
    return f"""
SELECT vec_id,
       {projs}
FROM embeddings
ORDER BY vec_id
"""


@register(
    "vec_random_projection_jl",
    oracle=_jl_oracle(),
    doc="Johnson-Lindenstrauss random projection 64->8 (Achlioptas +-1 "
    "signs, md5-derived in python and shared as literal arrays): each "
    "output coordinate is one ordered zip_with/aggregate fold == "
    "DuckDB list_dot_product — bit-identical, unrounded; the "
    "dimensionality-reduction preprocessing before cheap ANN or "
    "clustering, zero shuffle (pure per-row expressions); the JL "
    "distance-distortion bound is pytest-verified against numpy",
    tags=("vector", "projection", "kernel"),
)
def vec_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .vectors import dot

    e = t(spark, sf_dir, "embeddings", heavy=True)
    cols = [
        dot(
            F.col("embedding"),
            F.array(*[F.lit(s) for s in _JL_SIGNS[j]]),
        ).alias(f"p{j}")
        for j in range(_JL_K)
    ]
    return e.select("vec_id", *cols).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Nucleus (top-p) vocabulary truncation: the smallest count-ordered token
# prefix covering >= 90% of corpus occurrences — tokenizer-vocabulary
# pruning. Inclusion rule in pure integers: keep while the cumulative
# count BEFORE the token is still below 0.9*total (10*cum_before <
# 9*total), so the prefix is minimal and engine-identical.
# ---------------------------------------------------------------------------


@register(
    "vocab_nucleus_topp",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token
),
r AS (
  SELECT token, n,
         CAST(sum(n) OVER (ORDER BY n DESC, token
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(n) OVER () AS BIGINT) AS total,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank
  FROM c
)
SELECT rank, token, n, cum, total
FROM r
WHERE 10 * (cum - n) < 9 * total
ORDER BY rank
""",
    doc="nucleus (top-p, p=0.9) vocabulary truncation: smallest count-"
    "ordered token prefix covering 90 percent of corpus occurrences — "
    "tokenizer-vocabulary pruning; inclusion while 10*cum_before < "
    "9*total keeps everything in exact bigints (no 0.9 float "
    "anywhere); one explode+group-by, then range-partitioned prefix "
    "sums over the vocabulary (no single-task sort even of the vocab)",
    tags=("text", "tokenizer", "sampling"),
)
def vocab_nucleus_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    c = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # vocabulary grows with the corpus: cumulative coverage + rank +
    # grand total via the range-partitioned prefix_sums pattern instead
    # of partition-less windows (r12 de-weak — identical integers, no
    # one-task sort of the vocabulary)
    from ..functions.codecs import prefix_sums

    r = prefix_sums(
        c,
        [F.desc("n"), F.asc("token")],
        ["n"],
        out_cols=["cum"],
        rank_col="_rk",
        total_cols={"n": "total"},
    ).withColumn("rank", F.col("_rk").cast("int"))
    return (
        r.filter(10 * (F.col("cum") - F.col("n")) < 9 * F.col("total"))
        .select("rank", "token", "n", "cum", "total")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Dwell time per location: LOCF occupancy — each fix holds its grid cell
# until the next fix (capped at 2 h so overnight gaps don't credit a
# cell) — then the top cell per entity by total dwell. The stay-duration
# statistic the visit-COUNT metrics (frequent_locations) miss: 100 pings
# in a drive-through != an 8-hour workday. Exact integer microseconds.
# ---------------------------------------------------------------------------

_DWELL_CAP_US = 2 * 3600 * 1_000_000


@register(
    "mobility_dwell_time",
    oracle=f"""
WITH fixes AS (
  SELECT user_id, event_id, ts,
         cast(floor((value % 80.0) / 10.0) AS BIGINT) AS cx,
         cast(floor(((value * 3.7) % 160.0) / 10.0) AS BIGINT) AS cy
  FROM events
),
gaps AS (
  SELECT user_id, cx, cy,
         least(lead(epoch_us(ts)) OVER w - epoch_us(ts),
               {_DWELL_CAP_US}) AS gap_us
  FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
dwell AS (
  SELECT user_id, cx, cy,
         CAST(sum(gap_us) AS BIGINT) AS dwell_us,
         CAST(count(*) AS BIGINT) AS n_fixes
  FROM gaps WHERE gap_us IS NOT NULL
  GROUP BY user_id, cx, cy
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY dwell_us DESC, cx, cy) AS rk
  FROM dwell
)
SELECT user_id, cx, cy, dwell_us, n_fixes
FROM ranked WHERE rk = 1
ORDER BY user_id
""",
    doc="dwell time per location (LOCF occupancy): each fix holds its "
    "grid cell until the next fix, capped at 2 h; top cell per entity "
    "by total dwell — the stay-DURATION statistic visit counts miss "
    "(frequent_locations' complement); exact integer microseconds, "
    "one user-keyed shuffle shared by the lead window, the dwell "
    "aggregate and the rank",
    tags=("mobility", "window", "time"),
)
def mobility_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    fixes = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor((F.col("value") % 80.0) / 10.0).cast("long").alias("cx"),
        F.floor(((F.col("value") * 3.7) % 160.0) / 10.0)
        .cast("long")
        .alias("cy"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = fixes.select(
        "user_id",
        "cx",
        "cy",
        F.least(
            F.lead(epoch_us("ts")).over(w) - epoch_us("ts"),
            F.lit(_DWELL_CAP_US),
        ).alias("gap_us"),
    )
    dwell = (
        gaps.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id", "cx", "cy")
        .agg(
            F.sum("gap_us").alias("dwell_us"),
            F.count(F.lit(1)).alias("n_fixes"),
        )
    )
    rk = Window.partitionBy("user_id").orderBy(
        F.desc("dwell_us"), F.asc("cx"), F.asc("cy")
    )
    return (
        dwell.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("user_id", "cx", "cy", "dwell_us", "n_fixes")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# GPS teleport cleaning: flag physically-impossible steps (implied speed
# over 250 m/s) and report raw vs cleaned track totals per entity — the
# standard pre-analysis filter for noisy positioning feeds. The speed
# test cross-multiplies to pure BIGINTs (step_cm * 1e6 > vmax_cm *
# gap_us), and distances sum as integer centimeters (the
# trajectory_trip_segments hash-robustness idiom).
# ---------------------------------------------------------------------------

_TELEPORT_VMAX_CM_S = 250 * 100


@register(
    "trajectory_teleport_clean",
    oracle=f"""
WITH fixes AS (
  SELECT user_id, event_id, ts,
         value % 80.0          AS lat,
         (value * 3.7) % 160.0 AS lon
  FROM events WHERE user_id < 30
),
stepped AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
         CAST(round(2 * 6371008.8 * asin(sqrt(
             sin(radians(lat - lag(lat) OVER w) / 2) ^ 2
             + cos(radians(lag(lat) OVER w)) * cos(radians(lat))
               * sin(radians(lon - lag(lon) OVER w) / 2) ^ 2)) * 100)
           AS BIGINT) AS step_cm
  FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
  SELECT user_id, gap_us, step_cm,
         (step_cm * 1000000 > {_TELEPORT_VMAX_CM_S} * gap_us) AS teleport
  FROM stepped WHERE gap_us IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_steps,
       CAST(count(*) FILTER (WHERE teleport) AS BIGINT) AS n_teleports,
       CAST(sum(step_cm) AS BIGINT) AS raw_cm,
       CAST(coalesce(sum(step_cm) FILTER (WHERE NOT teleport), 0) AS BIGINT)
         AS clean_cm
FROM flagged
GROUP BY user_id
ORDER BY user_id
""",
    doc="GPS teleport cleaning: steps whose implied speed exceeds 250 "
    "m/s flagged by the pure-bigint cross-multiplication step_cm*1e6 > "
    "vmax_cm*gap_us (no float division, no rounding hazard), raw vs "
    "cleaned per-entity track totals as integer-centimeter sums — the "
    "pre-analysis filter for noisy positioning feeds; one entity-keyed "
    "shuffle shared by the lag window and the aggregate",
    tags=("mobility", "trajectory", "quality"),
)
def trajectory_teleport_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import haversine_m

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    fixes = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = fixes.select(
        "user_id",
        (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("gap_us"),
        F.round(
            haversine_m(
                F.lag("lat").over(w),
                F.lag("lon").over(w),
                F.col("lat"),
                F.col("lon"),
            )
            * 100
        )
        .cast("long")
        .alias("step_cm"),
    )
    flagged = stepped.filter(F.col("gap_us").isNotNull()).withColumn(
        "teleport",
        F.col("step_cm") * 1_000_000
        > F.lit(_TELEPORT_VMAX_CM_S) * F.col("gap_us"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.count(F.when(F.col("teleport"), 1)).alias("n_teleports"),
            F.sum("step_cm").alias("raw_cm"),
            F.coalesce(
                F.sum(F.when(~F.col("teleport"), F.col("step_cm"))),
                F.lit(0),
            ).alias("clean_cm"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Point-in-time (SCD2) dimension join: every purchase picks up the state
# the user was in WHEN IT HAPPENED — the temporal-dimension join behind
# every "as-was" report and leakage-safe feature join (training features
# must reflect the state at event time, not today's). Dim = SCD2
# intervals built from the user's non-purchase events; facts = purchases;
# join = user equi-key + [from, to) containment residual. Exact integer
# microsecond bounds; open intervals close at +infinity via NULL.
# ---------------------------------------------------------------------------


@register(
    "scd2_point_in_time_join",
    oracle="""
WITH states AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events WHERE user_id < 40 AND event_type <> 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
  SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                 THEN 1 ELSE 0 END AS chg
  FROM states
),
grouped AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
),
dim AS (
  SELECT user_id, event_type AS state, grp,
         min(epoch_us(ts)) AS from_us
  FROM grouped GROUP BY user_id, event_type, grp
),
closed AS (
  SELECT user_id, state, from_us,
         lead(from_us) OVER (PARTITION BY user_id
                             ORDER BY from_us, grp) AS to_us
  FROM dim
),
facts AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us
  FROM events WHERE user_id < 40 AND event_type = 'purchase'
)
SELECT f.event_id, f.user_id,
       strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.state AS state_at_purchase,
       c.from_us AS state_since_us
FROM facts f
LEFT JOIN closed c
  ON c.user_id = f.user_id
 AND f.ts_us >= c.from_us
 AND (c.to_us IS NULL OR f.ts_us < c.to_us)
ORDER BY f.event_id
""",
    doc="point-in-time SCD2 dimension join (the as-was / leakage-safe "
    "feature join): purchases pick up the state interval containing "
    "their timestamp — dim built by the scd2_state_intervals island "
    "construction over non-purchase events, join = user equi-key + "
    "[from, to) containment residual on exact integer microseconds; "
    "each fact matches at most one interval by construction, open "
    "intervals close at +infinity via NULL",
    tags=("join", "scd", "time"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    states = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = states.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "grp",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    dim = grouped.groupBy(
        "user_id", F.col("event_type").alias("state"), "grp"
    ).agg(F.min(epoch_us("ts")).alias("from_us"))
    w_close = Window.partitionBy("user_id").orderBy("from_us", "grp")
    closed = dim.select(
        "user_id",
        "state",
        "from_us",
        F.lead("from_us").over(w_close).alias("to_us"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", epoch_us("ts").alias("ts_us")
    )
    joined = facts.join(
        closed,
        (facts.user_id == closed.user_id)
        & (F.col("ts_us") >= F.col("from_us"))
        & (F.col("to_us").isNull() | (F.col("ts_us") < F.col("to_us"))),
        "left",
    )
    return joined.select(
        "event_id",
        facts.user_id.alias("user_id"),
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.col("state").alias("state_at_purchase"),
        F.col("from_us").alias("state_since_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Collocation mining by lift: adjacent token pairs whose co-occurrence
# beats the independence expectation — the phrase-vocabulary induction
# signal (PMI's argument without the log, so no transcendental function
# crosses engines). Counts are exact bigints; lift = (n_ab * N) /
# (n_a * n_b) is one multiply + one divide on exact operands —
# bit-identical; ranking uses exact-integer cross-multiplication, never
# the float.
# ---------------------------------------------------------------------------

_COLL_MIN_COUNT = 5
_COLL_TOPK = 20


@register(
    "text_collocation_lift",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
  FROM documents
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY w
),
tot AS (SELECT sum(n) AS big_n FROM uni),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS n_ab
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY w1, w2
),
scored AS (
  SELECT p.w1, p.w2, p.n_ab, u1.n AS n_a, u2.n AS n_b, t.big_n,
         CAST(p.n_ab * t.big_n AS DOUBLE) / CAST(u1.n * u2.n AS DOUBLE)
             AS lift
  FROM pairs p
  JOIN uni u1 ON u1.w = p.w1
  JOIN uni u2 ON u2.w = p.w2
  CROSS JOIN tot t
  WHERE p.n_ab >= {_COLL_MIN_COUNT}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      ORDER BY n_ab * big_n * 1000000 / (n_a * n_b) DESC, w1, w2
  ) AS INT) AS rank
  FROM scored
)
SELECT rank, w1, w2, n_ab, n_a, n_b, lift
FROM ranked WHERE rank <= {_COLL_TOPK}
ORDER BY rank
""",
    doc="collocation mining by lift (PMI without the log — no "
    "transcendental crosses engines): adjacent-pair counts vs the "
    "unigram independence expectation, lift = n_ab*N/(n_a*n_b) as one "
    "multiply+divide on exact bigints (bit-identical double), ranking "
    "by the INTEGER-scaled cross-multiplied score so order never "
    "consults a float; min-count floor prunes the pair table before "
    "the joins — the phrase-vocabulary induction signal feeding BPE/"
    "phrase retrieval",
    tags=("text", "tokenizer", "stats"),
)
def text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import positional_postings

    docs = t(spark, sf_dir, "documents")
    tok = positional_postings(docs).select(
        "doc_id", F.col("term").alias("w"), "pos"
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    tot = uni.agg(F.sum("n").alias("big_n"))
    a = tok.select("doc_id", F.col("w").alias("w1"), "pos")
    b = tok.select(
        "doc_id", F.col("w").alias("w2"), (F.col("pos") - 1).alias("pos")
    )
    pairs = (
        a.join(b, ["doc_id", "pos"])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _COLL_MIN_COUNT)
    )
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n").alias("n_a"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n").alias("n_b"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
    )
    lift = (F.col("n_ab") * F.col("big_n")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    score_int = (
        F.col("n_ab") * F.col("big_n") * F.lit(1_000_000)
    ) / (F.col("n_a") * F.col("n_b"))
    # top-k FIRST (TakeOrderedAndProject — no global sort, no
    # partition-less window over the SF-proportional pair table; r12
    # de-weak), then rank the bounded k rows: identical to filtering
    # rank <= k on a global rank over the same unique ordering
    top = (
        scored.withColumn("lift", lift)
        .orderBy(F.desc(score_int), F.asc("w1"), F.asc("w2"))
        .limit(_COLL_TOPK)
    )
    ranked = top.withColumn(
        "rank",
        F.row_number().over(  # post-limit: <= _COLL_TOPK rows, bounded
            Window.orderBy(F.desc(score_int), F.asc("w1"), F.asc("w2"))
        ),
    )
    return (
        ranked
        .select("rank", "w1", "w2", "n_ab", "n_a", "n_b", "lift")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Winsorized robust statistics: clip each group's values at its exact
# p5/p95 ORDER STATISTICS (ranks, not interpolation — so the bounds are
# integers from the data) and report the clipped mean next to the raw
# one — the outlier-robust summary. All sums are bigint; each mean is
# ONE division of exact operands, bit-identical, nothing rounded.
# ---------------------------------------------------------------------------


@register(
    "robust_winsorized_stats",
    oracle="""
WITH c AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem
),
r AS (
  SELECT flag, cents,
         CAST(row_number() OVER (PARTITION BY flag
                                 ORDER BY cents, l_orderkey, l_linenumber)
              AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n
  FROM c
),
bounds AS (
  SELECT flag,
         min(CASE WHEN 20 * rk >= n THEN cents END) AS lo,
         min(CASE WHEN 20 * rk >= 19 * n THEN cents END) AS hi
  FROM r GROUP BY flag
),
clipped AS (
  SELECT r.flag, r.n, b.lo, b.hi, r.cents,
         least(greatest(r.cents, b.lo), b.hi) AS w
  FROM r JOIN bounds b USING (flag)
)
SELECT flag, min(n) AS n, min(lo) AS lo_cents, min(hi) AS hi_cents,
       CAST(sum(cents) AS DOUBLE) / min(n) AS raw_mean_cents,
       CAST(sum(w) AS DOUBLE) / min(n) AS winsor_mean_cents,
       CAST(count(CASE WHEN w <> cents THEN 1 END) AS BIGINT) AS n_clipped
FROM clipped GROUP BY flag
ORDER BY flag
""",
    doc="winsorized robust statistics per return flag: clip at the exact "
    "p5/p95 ORDER STATISTICS (the first rank with 20*rk >= n / >= 19n "
    "— integer ranks, no interpolation, so the bounds are data values) "
    "and report clipped vs raw means, each ONE division of exact "
    "bigint operands (bit-identical, unrounded); one per-flag sort "
    "shared by the rank window, the count window and the bound scan — "
    "the outlier-robust summary raw means corrupt",
    tags=("agg", "window", "stats", "quality"),
)
def robust_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    w_rank = Window.partitionBy("flag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    r = li.withColumn(
        "rk", F.row_number().over(w_rank).cast("long")
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("flag")))
    bounds = r.groupBy("flag").agg(
        F.min(F.when(20 * F.col("rk") >= F.col("n"), F.col("cents"))).alias(
            "lo"
        ),
        F.min(
            F.when(20 * F.col("rk") >= 19 * F.col("n"), F.col("cents"))
        ).alias("hi"),
    )
    clipped = r.join(F.broadcast(bounds), "flag").withColumn(
        "w", F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    )
    return (
        clipped.groupBy("flag")
        .agg(
            F.min("n").alias("n"),
            F.min("lo").alias("lo_cents"),
            F.min("hi").alias("hi_cents"),
            (F.sum("cents").cast("double") / F.min("n")).alias(
                "raw_mean_cents"
            ),
            (F.sum("w").cast("double") / F.min("n")).alias(
                "winsor_mean_cents"
            ),
            F.count(F.when(F.col("w") != F.col("cents"), 1)).alias(
                "n_clipped"
            ),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# fastText-style linear quality classifier INFERENCE (operators/
# classifier.py): hashed unigram+bigram features, broadcast integer
# weight vector, exact BIGINT score per document — the trained-classifier
# curation step (GPT-3/PaLM/CCNet quality filters) as one linear
# relational pass. The gate's weights are the deterministic md5-derived
# stand-in (synthetic_hash_weights), so the DuckDB twin replays the
# ENTIRE model application value-for-value.
# ---------------------------------------------------------------------------

_FT_BUCKETS = 4096
_FT_SCALE = 1000


@register(
    "fasttext_quality_inference",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), uni AS (
  SELECT doc_id, unnest(ts) AS gram FROM tok
), bi AS (
  SELECT doc_id, ts[i] || '_' || ts[i+1] AS gram
  FROM tok, LATERAL unnest(generate_series(1, len(ts) - 1)) AS t(i)
), g AS (
  SELECT doc_id, gram FROM uni UNION ALL SELECT doc_id, gram FROM bi
), f AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('ft' || gram), 1, 8) AS BIGINT)
             % {_FT_BUCKETS} AS bucket
  FROM g
), wt AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('ftw' || CAST(bucket AS VARCHAR)), 1, 8)
              AS BIGINT) % {2 * _FT_SCALE + 1} - {_FT_SCALE} AS w
  FROM f
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_features,
       CAST(sum(w) AS BIGINT) AS score_scaled,
       sum(w) > 0 AS is_positive
FROM wt GROUP BY doc_id ORDER BY doc_id
""",
    doc="fastText-style linear classifier inference (operators/"
    "classifier.py — the trained-quality-filter curation step): every "
    "doc explodes to hashed unigram+bigram buckets (md5 % 4096), a "
    "broadcast (bucket, weight) table joins in, and the doc's score is "
    "the exact BIGINT sum of integer weights; one linear pass, weight "
    "table never shuffles, no UDF anywhere — the oracle replays the "
    "whole model application cell-for-cell",
    tags=("text", "classifier", "curation"),
)
def fasttext_quality_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import (
        linear_classifier_scores,
        synthetic_hash_weights,
    )

    # heavy: the gram explode multiplies rows ~100x, so parallelism must
    # come from BEFORE the explode — a small single-split scan pins the
    # whole hash+score pass to one core (measured 3.1s -> 0.8s at sf0.1;
    # at production scale the scan has many splits and the loader's size
    # gate makes the rebalance a no-op).
    docs = t(spark, sf_dir, "documents", heavy=True)
    weights = synthetic_hash_weights(
        spark, n_buckets=_FT_BUCKETS, scale=_FT_SCALE, salt="ftw"
    )
    return linear_classifier_scores(
        docs,
        weights,
        n_buckets=_FT_BUCKETS,
        word_ngrams=2,
        salt="ft",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round 9: driver verdicts for the remaining applyInPandasWithState
# streams (streaming/stateful.py — EWMA, Misra-Gries, A-Res were
# pytest-only; CUSUM's gate lives in plans/advanced.py). Shared shape:
# stream the test rows through the stateful operator as three file-source
# micro-batches into a parquet sink, read the sink back, and compare to a
# batch/SQL oracle. Order-sensitive streams (EWMA) get seq-RANGE slices;
# order-free ones (MG with covering counters, A-Res) get modulo slices.
# ---------------------------------------------------------------------------


def _gate_dirs(sf_dir: str, name: str) -> tuple[str, str, str]:
    import os
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_gates",
        f"{name}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    return (
        os.path.join(base, "src"),
        os.path.join(base, "out"),
        os.path.join(base, "ckpt"),
    )


_EW_WINDOW = 16


@register(
    "streaming_ewma_maintainer",
    oracle="""
WITH x AS (
  SELECT CAST(user_id AS VARCHAR) AS entity, event_id AS seq,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT entity, seq,
       {terms} AS ewma_scaled
FROM x
WINDOW w AS (PARTITION BY entity ORDER BY seq)
ORDER BY entity, seq
""".replace(
        "{terms}",
        " + ".join(
            f"coalesce(lag(cents, {j}) OVER w, 0) * {1 << (15 - j)}"
            for j in range(_EW_WINDOW)
        ),
    ),
    doc="the streaming truncated-EWMA smoother gets its own driver "
    "verdict (streaming/stateful.streaming_ewma — engine-side keyed "
    "state = the last 16 cents per entity): events stream in as three "
    "seq-range micro-batches, every per-row emission lands in the "
    "exactly-once parquet sink, and the FULL streamed series must be "
    "bit-identical to the batch 16-lag window unroll the oracle "
    "computes — power-of-two weights keep every value exact BIGINT, so "
    "one lost state cell, misordered row or double-applied batch flips "
    "a value; the truncation IS what makes the smoother streamable "
    "(bounded state, unlike the untruncated recursion)",
    tags=("streaming", "stateful", "smoothing", "write"),
)
def streaming_ewma_maintainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import streaming_ewma

    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_ewma")
    ev = t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("entity"),
        F.col("event_id").alias("seq"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hi = ev.agg(F.max("seq")).first()[0]  # one scalar — bounded collect
    if hi is None:
        # empty source: no seq range to slice into batches (degenerate)
        return spark.createDataFrame(
            [], "entity string, seq long, ewma_scaled long"
        )
    cut1, cut2 = hi // 3, 2 * hi // 3
    for lo_excl, hi_incl in ((-1, cut1), (cut1, cut2), (cut2, hi)):
        ev.filter(
            (F.col("seq") > lo_excl) & (F.col("seq") <= hi_incl)
        ).coalesce(1).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema("entity string, seq long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sq = (
        streaming_ewma(stream, window=_EW_WINDOW)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.read.parquet(out).select(
        "entity", "seq", "ewma_scaled"
    ).orderBy("entity", "seq")


@register(
    "streaming_heavy_hitters_topk",
    # identical oracle to text_token_topk(_sketch): with 64 counters per
    # shard and the ~31-token synthetic vocabulary no MG decrement ever
    # fires, so the streamed candidate set covers every token and the
    # exact recount's top-20 must EQUAL the exact top-20 (the decrement
    # regime is pinned by the planted-skew pytest; see
    # text_token_topk_sketch's note on why a near-uniform corpus cannot
    # exercise it value-checkably)
    oracle="""
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) GROUP BY token ORDER BY n DESC, token LIMIT 20
""",
    doc="the streaming Misra-Gries heavy-hitter stream gets its own "
    "driver verdict (streaming/stateful.streaming_heavy_hitters — "
    "token-space SHARDED keyed state, bounded at n_counters per shard "
    "forever): the token stream arrives as three micro-batches, each "
    "shard re-emits its live counter summary per batch, the gate takes "
    "each shard's FINAL summary (max n_seen), recounts the surviving "
    "candidates exactly against the full corpus, and the recounted "
    "top-20 must equal the exact top-20 — the streamed form of the "
    "text_token_topk_sketch recipe (sketch proposes, recount disposes)",
    tags=("streaming", "stateful", "sketch", "write"),
)
def streaming_heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import streaming_heavy_hitters
    from .text import tokens

    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_mg")
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    for m in range(3):
        toks.filter(F.col("doc_id") % 3 == m).select("token").coalesce(
            1
        ).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sq = (
        streaming_heavy_hitters(stream, n_counters=64, n_shards=8)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    emissions = spark.read.parquet(out)
    w_last = Window.partitionBy("shard").orderBy(F.desc("n_seen"))
    candidates = (
        emissions.withColumn("_rk", F.dense_rank().over(w_last))
        .filter(F.col("_rk") == 1)  # each shard's final summary
        .select("token")
        .distinct()
    )
    # exact recount of the candidates over the full stream, then top-k —
    # the MG guarantee makes this equal the global exact top-k
    return (
        toks.join(candidates, "token", "leftsemi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@register(
    "streaming_ares_reservoir",
    oracle="""
WITH sized AS (
  SELECT source, doc_id,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), keyed AS (
  SELECT source, doc_id,
         round(ln((CAST('0x' || substr(md5('ares' || cast(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) + 1) / 4294967296.0)
               / cast(n_tokens AS DOUBLE), 10) AS ares_key
  FROM sized
)
SELECT source, doc_id, ares_key, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY ares_key DESC, doc_id) AS rk
  FROM keyed
) WHERE rk <= 3 ORDER BY source, rk
""",
    doc="the streaming weighted reservoir gets its own driver verdict "
    "(streaming/stateful.streaming_weighted_sample — A-Res with the "
    "DETERMINISTIC md5 draw, state = top-k (id, key) pairs per group "
    "forever): docs stream in as three modulo micro-batches, each "
    "emission is the group's reservoir-so-far, and because a final-"
    "reservoir member stays in the reservoir from its arrival onward, "
    "the top-k over the UNION of emissions is the final reservoir — "
    "which must equal the batch weighted_sample (sample_weighted_ares's "
    "oracle) exactly, under any arrival order",
    tags=("streaming", "stateful", "sampling", "write"),
)
def streaming_ares_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import streaming_weighted_sample

    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_ares")
    d = t(spark, sf_dir, "documents")
    n_tokens = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    sized = d.select(
        F.col("source").alias("group"),
        "doc_id",
        n_tokens.cast("long").alias("weight"),
    )
    for m in range(3):
        sized.filter(F.col("doc_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema("group string, doc_id long, weight long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sq = (
        streaming_weighted_sample(stream, k=3, salt="ares")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    emissions = spark.read.parquet(out).select(
        "group", "doc_id", "ares_key"
    ).distinct()
    w = Window.partitionBy("group").orderBy(F.desc("ares_key"), F.asc("doc_id"))
    return (
        emissions.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(F.col("group").alias("source"), "doc_id", "ares_key", "rk")
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join (streaming/joins.py — previously pytest-
# only): purchases and clicks arrive as two INDEPENDENT watermarked file
# streams; Spark buffers both sides in keyed state (StreamingSymmetricHash
# Join) and the watermark + the 12h join bound evict state the moment the
# other side can no longer match. ts-RANGE slices keep each stream's event
# time moving forward, so the generous watermark never evicts a row whose
# cross-batch partner is still coming — the inner-join output over the
# drained streams must therefore equal the batch interval join exactly
# (integer event ids only: hash-robust by construction).
# ---------------------------------------------------------------------------


@register(
    "stream_stream_interval_join",
    oracle="""
SELECT p.user_id, p.event_id AS purchase_event, c.event_id AS click_event
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 12 HOUR
ORDER BY p.user_id, purchase_event, click_event
""",
    doc="stream-stream inner interval join gets its own driver verdict "
    "(streaming/joins.interval_join_streams): purchase and click events "
    "stream in as two 3-micro-batch file sources (ts-range slices), the "
    "symmetric hash join buffers both sides in watermark-bounded keyed "
    "state, and every (purchase, click-within-12h) pair must land in "
    "the sink exactly once — the batch join is the oracle, so a "
    "premature state eviction, a dropped cross-batch match or a "
    "double emission flips a row",
    tags=("streaming", "join", "time", "write"),
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import interval_join_streams

    src_l, out, ckpt = _gate_dirs(sf_dir, "stream_ss_join")
    src_r = src_l + "_right"

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("l_ts"),
        F.col("event_id").alias("purchase_event"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"),
        F.col("event_id").alias("click_event"),
    )
    # ts-range slices: both streams' watermarks advance monotonically,
    # so state eviction (watermark + 12h bound) always trails any
    # still-possible cross-batch match
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    if hi is None:
        # empty source: no ts range to slice, no pair can exist
        return spark.createDataFrame(
            [], "user_id long, purchase_event long, click_event long"
        )
    cut1 = lo + (hi - lo) / 3
    cut2 = lo + 2 * (hi - lo) / 3
    for side, src in ((purchases, src_l), (clicks, src_r)):
        ts_col = "l_ts" if src is src_l else "r_ts"
        for a, b in ((None, cut1), (cut1, cut2), (cut2, None)):
            sl = side
            if a is not None:
                sl = sl.filter(F.col(ts_col) > a)
            if b is not None:
                sl = sl.filter(F.col(ts_col) <= b)
            sl.coalesce(1).write.mode("append").parquet(src)

    left = (
        spark.readStream.schema(
            "user_id long, l_ts timestamp, purchase_event long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_l)
    )
    right = (
        spark.readStream.schema(
            "user_id long, r_ts timestamp, click_event long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_r)
    )
    joined = interval_join_streams(
        left, right, key="user_id", within="12 hours", watermark="48 hours"
    )
    sq = (
        joined.select("user_id", "purchase_event", "click_event")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.read.parquet(out).orderBy(
        "user_id", "purchase_event", "click_event"
    )


# ---------------------------------------------------------------------------
# Streaming LSH candidate pairs (streaming/stateful.streaming_lsh_
# candidates — previously pytest-only): signatures/band keys are the SAME
# pure expressions as the batch path, the state is per-bucket membership,
# and a pair is emitted the moment the second member of a bucket arrives.
# The union of emissions over any arrival order equals the batch candidate
# set, with n_bands recoverable as the count of distinct emitting bands —
# so the gate shares dedup_minhash_lsh_candidates' oracle verbatim.
# ---------------------------------------------------------------------------


@register(
    "streaming_lsh_dedup_candidates",
    oracle=None,  # bound below to the batch twin's oracle (shared verbatim)
    doc="the streaming LSH near-duplicate detector gets its own driver "
    "verdict (streaming/stateful.streaming_lsh_candidates — keyed state "
    "= per-(band, bucket) membership): documents stream in as three "
    "modulo micro-batches, each new co-bucketed doc emits one candidate "
    "pair per predecessor exactly once, and the per-pair distinct-band "
    "count over ALL emissions must equal the batch LSH candidate table "
    "(dedup_minhash_lsh_candidates' oracle, shared verbatim) — dedup-as-"
    "data-arrives rather than as a batch sweep",
    tags=("streaming", "stateful", "dedup", "minhash", "write"),
)
def streaming_lsh_dedup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import streaming_lsh_candidates

    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_lsh")
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    for m in range(3):
        d.filter(F.col("doc_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    # same geometry as the batch gate: 4 sliced hashes, 2 bands, 3-shingles
    sq = (
        streaming_lsh_candidates(
            stream, n_hashes=4, bands=2, shingle_n=3
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("band_idx").alias("n_bands"))
        .orderBy("doc_a", "doc_b")
    )


# share the batch twin's oracle verbatim (single source of truth for the
# minhash->band->pair SQL)
from . import REGISTRY as _REG  # noqa: E402

_REG["streaming_lsh_dedup_candidates"].oracle = _REG[
    "dedup_minhash_lsh_candidates"
].oracle


# ---------------------------------------------------------------------------
# Native watermarked streaming aggregation (W2's TRUE streaming form):
# groupBy(window(ts, 1h)) in APPEND mode only emits a window once the
# watermark proves it complete — the core Structured Streaming contract
# the foreachBatch maintainers sidestep. The gate pins that contract:
# in-order ts-range slices (so no row is ever late past the 1h watermark),
# then two far-future sentinel rows advance the watermark past every real
# window (append mode finalizes a window on the FOLLOWING batch's
# watermark, hence two sentinels), and the emitted windows must equal the
# batch hourly rollup exactly.
# ---------------------------------------------------------------------------


@register(
    "streaming_native_window_counts",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
""",
    doc="native watermarked tumbling-window aggregation under a driver "
    "verdict: events stream in as three ts-range micro-batches through "
    "groupBy(window(ts, '1 hour'), event_type).count() with a 1h "
    "watermark in APPEND mode (state = open windows only, evicted at "
    "finalization — the native streaming operator, not a foreachBatch "
    "maintainer); two sentinel rows push the watermark past every real "
    "window so all of them finalize, and the emitted set must equal the "
    "batch hourly rollup cell-for-cell — one late-dropped row, one "
    "unfinalized window or one double emission flips the table",
    tags=("streaming", "window", "time", "write"),
)
def streaming_native_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_native_win")
    ev = t(spark, sf_dir, "events").select("ts", "event_type")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    if hi is None:
        # empty source: nothing to window (degenerate sweep, r11)
        return spark.createDataFrame(
            [], "window_start string, event_type string, n long"
        )
    cut1 = lo + (hi - lo) / 3
    cut2 = lo + 2 * (hi - lo) / 3
    slices = [
        ev.filter(F.col("ts") <= cut1),
        ev.filter((F.col("ts") > cut1) & (F.col("ts") <= cut2)),
        ev.filter(F.col("ts") > cut2),
    ]
    for sl in slices:
        sl.coalesce(1).write.mode("append").parquet(src_dir)
    # two sentinel batches: batch N's emissions use the watermark from
    # batch N-1's max event time, so the FIRST sentinel finalizes all
    # but the freshest real windows and the SECOND finalizes the rest
    from ..session import local_df

    for days in (30, 60):
        local_df(
            spark,
            [(hi + __import__("datetime").timedelta(days=days), "__sentinel__")],
            "ts timestamp, event_type string",
        ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    sq = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            F.date_format("ws", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Native streaming deduplication: dropDuplicates on a stream keeps the
# seen-key set in the state store, so a key is emitted exactly once
# across ALL micro-batches — exactly-once ingest semantics without a
# maintainer. The gate plants every event TWICE in different micro-
# batches; production streams bound the state with
# dropDuplicatesWithinWatermark (keys expire after the lateness horizon),
# which this gate deliberately does not use so the cross-batch guarantee
# itself is what's pinned.
# ---------------------------------------------------------------------------


@register(
    "streaming_dedup_exactly_once",
    oracle="""
SELECT event_id, user_id, event_type FROM events ORDER BY event_id
""",
    doc="native streaming deduplication under a driver verdict: every "
    "event is planted TWICE in different micro-batches (copy A in batch "
    "id%3, copy B in batch (id+1)%3) and dropDuplicates('event_id') on "
    "the stream must emit each event EXACTLY once across the whole "
    "run — the seen-key state store is the operator; the oracle is the "
    "plain distinct table, so a forgotten key (double emission) or an "
    "overzealous filter (lost event) flips a row",
    tags=("streaming", "dedup", "write"),
)
def streaming_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_dedup")
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    for m in range(3):
        copy_a = ev.filter(F.col("event_id") % 3 == m)
        copy_b = ev.filter((F.col("event_id") + 1) % 3 == m)
        copy_a.unionByName(copy_b).coalesce(1).write.mode("append").parquet(
            src_dir
        )
    stream = (
        spark.readStream.schema("event_id long, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sq = (
        stream.dropDuplicates(["event_id"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.read.parquet(out).orderBy("event_id")


# ---------------------------------------------------------------------------
# Watermark LATE-DATA semantics — the half of the watermark contract
# streaming_native_window_counts does NOT exercise: rows that arrive
# AFTER the watermark passed their window must be DROPPED (their state
# was evicted at finalization; re-opening would double-emit). The gate
# holds back a deterministic quarter of the events (event_id % 4 == 3),
# streams the on-time rows, advances the watermark past every real
# window with a far-future sentinel, then delivers the held-back rows —
# every one of them now late beyond the 1h watermark, so the emitted
# hourly rollup must equal the batch recompute over the ON-TIME rows
# only. A late row that leaks into a count, or an on-time row dropped
# with it, flips a cell. Oracle = the same lateness cut in SQL
# (WHERE event_id % 4 <> 3).
# ---------------------------------------------------------------------------


@register(
    "streaming_late_data_window",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
       event_type, count(*) AS n
FROM events WHERE event_id % 4 <> 3
GROUP BY 1, 2 ORDER BY window_start, event_type
""",
    doc="watermark late-data semantics under a driver verdict: a "
    "deterministic quarter of the events (event_id % 4 == 3) is held "
    "back until a sentinel batch has advanced the 1h watermark past "
    "every real window, so Structured Streaming must DROP each of them "
    "(state already evicted at finalization) — the emitted hourly "
    "windows equal the batch rollup over on-time rows only, with the "
    "same lateness cut on the oracle side; the drop-not-reopen half of "
    "the watermark contract streaming_native_window_counts leaves "
    "unexercised",
    tags=("streaming", "window", "time", "write"),
)
def streaming_late_data_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    from ..session import local_df

    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_late")
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    hi = ev.agg(F.max("ts")).first()[0]
    if hi is None:
        # empty source: no windows, nothing held back (degenerate sweep)
        return spark.createDataFrame(
            [], "window_start string, event_type string, n long"
        )

    # The FileStreamSource batches by file MODIFICATION TIME; four fast
    # consecutive writes can collide at mtime granularity and reorder
    # (the late file arriving before the sentinel silently un-lates
    # every held-back row). Stamp each batch's part files with strictly
    # increasing mtimes so arrival order is pinned, not raced.
    import glob as _glob
    import os as _os
    import time as _time

    _seen: set[str] = set()
    _base = _time.time() - 3600.0

    def _stamp(batch_idx: int) -> None:
        for f in _glob.glob(_os.path.join(src_dir, "*.parquet")):
            if f not in _seen:
                _seen.add(f)
                mt = _base + batch_idx * 60.0
                _os.utime(f, (mt, mt))

    # batch 1: every on-time row
    ev.filter(F.col("event_id") % 4 != 3).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    _stamp(1)
    # batches 2+3: TWO far-future sentinels before the late rows. The
    # input-side late filter for micro-batch N uses the watermark
    # derived from batches <= N-2 (one batch behind the emission
    # watermark — measured on this Spark, see the gate's unit test), so
    # a single sentinel would leave the late batch filtered by the
    # ON-TIME watermark and let held-back rows in the freshest hour
    # leak through as re-opened state.
    for i, days in ((2, 30), (3, 30)):
        local_df(
            spark,
            [
                (
                    -i,
                    hi + datetime.timedelta(days=days, hours=2 * (i - 2)),
                    "__sentinel__",
                )
            ],
            "event_id long, ts timestamp, event_type string",
        ).coalesce(1).write.mode("append").parquet(src_dir)
        _stamp(i)
    # batch 4: the held-back rows — the filter watermark is now 30 days
    # past every real window, every one must be dropped
    ev.filter(F.col("event_id") % 4 == 3).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    _stamp(4)
    # batch 5: trailing sentinel — if the drop were broken, the late
    # rows' re-opened windows would flush into the sink here and flip
    # the compare (without it a leak would sit in state, undetected)
    local_df(
        spark,
        [(-9, hi + datetime.timedelta(days=60), "__sentinel__")],
        "event_id long, ts timestamp, event_type string",
    ).coalesce(1).write.mode("append").parquet(src_dir)
    _stamp(5)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    sq = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            F.date_format("ws", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Native streaming SESSION windows — the third native stateful contract
# (after streaming_native_window_counts and streaming_dedup_exactly_once):
# session_window(ts, 30m) on a watermarked stream keeps one open session
# per user in the state store and MERGES sessions across micro-batches
# when a later batch lands inside the gap. A session only emits once the
# watermark passes its close (last event + gap), so the state is bounded
# by open sessions. The gate streams ts-range slices (in-order, nothing
# late past the 1h watermark), a user's session can genuinely straddle
# slice cuts (the merge path is exercised, not just the happy path),
# and two far-future sentinel batches finalize every real session. The
# emitted set must equal the batch gap-island sessionization
# cell-for-cell — the oracle is shared verbatim with the batch
# session_window_native gate.
# ---------------------------------------------------------------------------


@register(
    "streaming_session_native",
    oracle=None,  # bound to session_window_native's oracle below
    doc="native streaming session windows under a driver verdict: events "
    "stream in as three ts-range micro-batches through "
    "groupBy(user_id, session_window(ts, '30 min')) with a 1h watermark "
    "in APPEND mode; the state store merges sessions that straddle "
    "batch cuts and emits each exactly once when the watermark closes "
    "it; two sentinel batches finalize the tail, and the streamed "
    "session table must equal the batch gap-island sessionization "
    "cell-for-cell (oracle shared with session_window_native)",
    tags=("streaming", "session", "window", "write"),
)
def streaming_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_session")
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    if hi is None:
        # empty source: no sessions can open (degenerate sweep, r11)
        return spark.createDataFrame(
            [],
            "user_id long, session_start string, session_last string,"
            " n_events long",
        )
    cut1 = lo + (hi - lo) / 3
    cut2 = lo + 2 * (hi - lo) / 3
    slices = [
        ev.filter(F.col("ts") <= cut1),
        ev.filter((F.col("ts") > cut1) & (F.col("ts") <= cut2)),
        ev.filter(F.col("ts") > cut2),
    ]
    for sl in slices:
        sl.coalesce(1).write.mode("append").parquet(src_dir)
    from ..session import local_df

    for days in (30, 60):
        local_df(
            spark,
            [(-1, hi + __import__("datetime").timedelta(days=days))],
            "user_id long, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "mn", "mx", "n_events")
    )
    sq = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.date_format("mn", TS_FMT_SPARK).alias("session_start"),
            F.date_format("mx", TS_FMT_SPARK).alias("session_last"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


_REG["streaming_session_native"].oracle = _REG["session_window_native"].oracle


# ---------------------------------------------------------------------------
# Classifier calibration table (reliability diagram) — the eval step
# that follows fasttext_quality_inference in a real curation pipeline:
# bin documents by score, compare the bin's predicted-positive share
# to an observed label rate. The label here is data-derived (doc longer
# than 60 tokens) so the oracle replays it; the gate pins the BINNING
# and RATE mechanics (fixed-width integer score bins, exact BIGINT
# counts, one division at the end per rate).
# Scale: reuses the inference plan (one explode + broadcast weights),
# then a single bounded groupBy on the bin id.
# ---------------------------------------------------------------------------


@register(
    "classifier_calibration_bins",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), uni AS (
  SELECT doc_id, unnest(ts) AS gram FROM tok
), bi AS (
  SELECT doc_id, ts[i] || '_' || ts[i+1] AS gram
  FROM tok, LATERAL unnest(generate_series(1, len(ts) - 1)) AS t(i)
), g AS (
  SELECT doc_id, gram FROM uni UNION ALL SELECT doc_id, gram FROM bi
), f AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('ft' || gram), 1, 8) AS BIGINT)
             % {_FT_BUCKETS} AS bucket
  FROM g
), wt AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('ftw' || CAST(bucket AS VARCHAR)), 1, 8)
              AS BIGINT) % {2 * _FT_SCALE + 1} - {_FT_SCALE} AS w
  FROM f
), scored AS (
  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score FROM wt GROUP BY doc_id
), labeled AS (
  SELECT s.doc_id, s.score,
         CASE WHEN len(string_split(d.text, ' ')) > 60 THEN 1 ELSE 0 END
           AS label
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT CAST(floor(score / 1000.0) AS INTEGER) AS score_bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(label) AS BIGINT) AS n_pos,
       sum(label) / count(*) AS pos_rate,
       CAST(min(score) AS BIGINT) AS min_score,
       CAST(max(score) AS BIGINT) AS max_score
FROM labeled GROUP BY 1 ORDER BY score_bin
""",
    doc="classifier calibration / reliability table: documents binned by "
    "fixed-width integer score bins of the fastText-style inference "
    "scores, observed long-doc label rate per bin (exact BIGINT counts, "
    "one division per rate) — the eval artifact a quality-filter "
    "deployment reads before picking a threshold",
    tags=("text", "classifier", "curation"),
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import (
        linear_classifier_scores,
        synthetic_hash_weights,
    )

    # heavy: the gram explode multiplies rows ~100x, so parallelism must
    # come from BEFORE the explode — a small single-split scan pins the
    # whole hash+score pass to one core (measured 3.1s -> 0.8s at sf0.1;
    # at production scale the scan has many splits and the loader's size
    # gate makes the rebalance a no-op).
    docs = t(spark, sf_dir, "documents", heavy=True)
    weights = synthetic_hash_weights(
        spark, n_buckets=_FT_BUCKETS, scale=_FT_SCALE, salt="ftw"
    )
    scored = linear_classifier_scores(
        docs, weights, n_buckets=_FT_BUCKETS, word_ngrams=2, salt="ft"
    ).select("doc_id", F.col("score_scaled").alias("score"))
    labeled = scored.join(
        docs.select(
            "doc_id",
            (F.size(F.split("text", " ")) > 60).cast("int").alias("label"),
        ),
        "doc_id",
    )
    return (
        labeled.groupBy(
            F.floor(F.col("score") / F.lit(1000.0))
            .cast("int")
            .alias("score_bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("label").alias("n_pos"),
            (F.sum("label") / F.count(F.lit(1))).alias("pos_rate"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("score_bin")
    )


# ---------------------------------------------------------------------------
# Streaming IVM maintainer under a driver verdict — the last foreachBatch
# path that was pytest-only: a materialized orders⋈lineitem view is built
# on HALF the orders, the other half streams in as three file-source
# micro-batches through stream_to_materialized_join (delta rule per
# epoch, two-sided idempotent replay protection, nonce-mixed run
# identity), and the MAINTAINED view's aggregate must equal the one-shot
# batch join the oracle computes. A double-applied epoch, a dropped
# batch, or a delta-rule error flips a cell.
# Scale: per epoch cost ∝ |batch| × match rate, never view size.
# ---------------------------------------------------------------------------


@register(
    "streaming_ivm_join_maintainer",
    oracle="""
SELECT o.o_orderstatus,
       count(*) AS n_rows,
       count(DISTINCT o.o_orderkey) AS n_orders,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS ext_cents,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
""",
    doc="streaming incremental view maintenance under a driver verdict: "
    "the materialized join view is built on even orderkeys, odd "
    "orderkeys stream in as three micro-batches through the delta-rule "
    "foreachBatch maintainer (two-sided idempotent replay protection), "
    "and the maintained view's aggregate must equal the one-shot batch "
    "join cell-for-cell",
    tags=("streaming", "ivm", "join", "write"),
)
def streaming_ivm_join_maintainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivm import MaterializedJoin
    from ..streaming.ivm_stream import stream_to_materialized_join

    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_ivm")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderkey").alias("o_rid"),
        "o_orderstatus",
        "o_orderkey",
    )
    li = t(spark, sf_dir, "lineitem", heavy=True).select(
        F.col("l_orderkey").alias("k"),
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
    ).coalesce(8)
    mj = MaterializedJoin(out, on="k", left_row_id="o_rid")
    mj.build(o.filter(F.col("k") % 2 == 0).coalesce(4), li)
    odd = o.filter(F.col("k") % 2 == 1)
    for m in range(3):
        odd.filter(F.col("k") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema(odd.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream_to_materialized_join(stream, mj, ckpt, row_id_col="o_rid").awaitTermination()
    return (
        mj.view(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "ext_cents"
            ),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Streaming shard export under a driver verdict — the terminal pipeline
# stage (streaming/shard_stream.py) was pytest-only: documents stream in
# as three micro-batches through stream_to_shards (idempotent append
# against the persisted manifest, touched-shard-only rewrites), and the
# PERSISTED manifest must equal the one-shot batch packing cell-for-cell.
# Packing is order-sensitive (md5(doc_id) order after the source's fill
# level), so the micro-batches are md5-RANGE slices — the seq-range
# discipline the other order-sensitive streaming gates use — which makes
# sequential appends reproduce the global packing exactly.
# ---------------------------------------------------------------------------


@register(
    "streaming_shard_export",
    oracle=None,  # bound to pack_shard_manifest's oracle below
    doc="streaming training-shard export under a driver verdict: three "
    "md5-range micro-batches through stream_to_shards (512-token "
    "shards), then the PERSISTED manifest (shard, counts, id range, "
    "content md5) must equal the batch packing oracle cell-for-cell — "
    "a double-placed doc, a lost append, or an understated fill level "
    "flips a row (oracle shared verbatim with pack_shard_manifest)",
    tags=("streaming", "packing", "text", "write"),
)
def streaming_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.shard_stream import stream_to_shards

    src_dir, out, ckpt = _gate_dirs(sf_dir, "stream_shards")
    d = t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    if d.isEmpty():
        # empty corpus: no shard is ever flushed and no manifest is
        # written (degenerate sweep, r11)
        return spark.createDataFrame(
            [],
            "shard string, n_docs long, n_tokens long, min_doc_id long,"
            " max_doc_id long, content_md5 string",
        )
    h1 = F.md5(F.col("doc_id").cast("string")).substr(1, 1)
    cuts = [
        h1 < "5",
        (h1 >= "5") & (h1 < "a"),
        h1 >= "a",
    ]
    for cond in cuts:
        d.filter(cond).coalesce(1).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema("source string, doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream_to_shards(stream, out, ckpt, shard_tokens=512).awaitTermination()
    return (
        spark.read.parquet(f"{out}/manifest.parquet")
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            "min_doc_id",
            "max_doc_id",
            "content_md5",
        )
        .orderBy("shard")
    )


_REG["streaming_shard_export"].oracle = _REG["pack_shard_manifest"].oracle


# ---------------------------------------------------------------------------
# Round-9 continuation: deterministic multiplier bootstrap (operators/
# bootstrap.py) — resampling CIs at table scale without an RNG. The
# md5-derived mean-1 integer multipliers make every replicate exactly
# replayable cross-engine; weighted sums stay BIGINT; the CI bounds are
# order statistics of the replicate means, so nothing float is ever
# aggregated. One pass over the data for all 32 replicates (explode ->
# map-side-combinable groupBy(rep)).
# ---------------------------------------------------------------------------

_BOOT_REPS = 32
_BOOT_LO_RANK, _BOOT_HI_RANK = 4, 29


@register(
    "bootstrap_ci_mean",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), reps AS (SELECT unnest(range(1, {_BOOT_REPS + 1})) AS rep),
w AS (
  SELECT rep, cents,
         CAST('0x' || substr(md5('boot' || CAST(rep AS VARCHAR) || '_'
                                 || CAST(o_orderkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 3 AS wt
  FROM o CROSS JOIN reps
), m AS (
  -- zero-weight replicates (possible only on tiny inputs) carry NULL
  -- means; the rank order pins NULLS FIRST to match Spark's ASC default
  SELECT rep,
         CASE WHEN CAST(sum(wt) AS BIGINT) = 0 THEN NULL
              ELSE CAST(CAST(sum(wt * cents) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(wt) AS BIGINT) AS DOUBLE) END AS mean
  FROM w GROUP BY rep
), r AS (
  SELECT mean,
         row_number() OVER (ORDER BY mean NULLS FIRST, rep) AS rn FROM m
)
SELECT CAST(count(*) AS BIGINT) AS n_reps,
       round((SELECT CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) FROM o), 6)
         AS est_mean_cents,
       round(min(CASE WHEN rn = {_BOOT_LO_RANK} THEN mean END), 6)
         AS boot_lo_cents,
       round(min(CASE WHEN rn = {_BOOT_HI_RANK} THEN mean END), 6)
         AS boot_hi_cents
FROM r
""",
    doc="deterministic multiplier bootstrap CI for the mean order value "
    "(operators/bootstrap.py): 32 replicates in ONE data pass — every "
    "row draws a mean-1 integer multiplier in {0,1,2} from "
    "md5(rep,key), replicate means are one bigint/bigint division "
    "each, the 10%/90% bounds are ORDER STATISTICS (rank 4/29 of 32, "
    "rep-id tiebreak) of those means — no RNG state, no float "
    "aggregation, the oracle replays the exact resample; the "
    "uncertainty-quantification step a data-quality dashboard needs "
    "beside every point estimate",
    tags=("stats", "sampling", "bootstrap"),
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bootstrap import bootstrap_ci_mean as boot

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return boot(
        o, "o_orderkey", "cents",
        reps=_BOOT_REPS, lo_rank=_BOOT_LO_RANK, hi_rank=_BOOT_HI_RANK,
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: nonparametric two-sample tests (operators/
# nonparametric.py) — the continuous-distribution complements to the
# categorical chi-square drift gate. Both statistics are rationals with
# known denominators, so everything is BIGINT until one final division:
# KS multiplies the CDF gap through by n1*n2; Mann-Whitney uses integer
# doubled midranks (2s + c - 1). The only corpus-sized shuffle is the
# per-value collapse; the running-sum window rides DISTINCT values.
# ---------------------------------------------------------------------------


@register(
    "drift_ks_value_shift",
    oracle="""
WITH x AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS g1
  FROM events
), c AS (
  SELECT v, CAST(sum(g1) AS BIGINT) AS c1,
         CAST(sum(1 - g1) AS BIGINT) AS c2
  FROM x GROUP BY v
), cum AS (
  SELECT CAST(sum(c1) OVER w AS BIGINT) AS f1,
         CAST(sum(c2) OVER w AS BIGINT) AS f2
  FROM c
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), n AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c
)
SELECT n.n1, n.n2,
       CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS BIGINT) AS d_scaled,
       CASE WHEN n.n1 * n.n2 = 0 THEN NULL
            ELSE round(CAST(CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS BIGINT)
                            AS DOUBLE)
                       / CAST(n.n1 * n.n2 AS DOUBLE), 6) END AS d
FROM cum CROSS JOIN n GROUP BY n.n1, n.n2
""",
    # D/AUC are undefined when either sample is empty — both engines pin
    # NULL (degenerate sweep, r11); no-op whenever both sides have data
    doc="two-sample Kolmogorov-Smirnov drift test (operators/"
    "nonparametric.ks_two_sample): did the event-value distribution "
    "shift between the first and second half of the month? D = "
    "max|F1-F2| multiplied through by n1*n2 so the scan for the max "
    "CDF gap is pure BIGINT (one division at the end); one per-value "
    "collapse shuffle + a distinct-value running-sum window — the "
    "continuous complement to the chi-square mix gate",
    tags=("stats", "drift", "nonparametric"),
)
def drift_ks_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.nonparametric import ks_two_sample

    ev = t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"), "ts"
    )
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return ks_two_sample(ev, "cents", F.col("ts") < cut)


@register(
    "rank_auc_mann_whitney",
    oracle="""
WITH x AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('click', 'purchase')
), c AS (
  SELECT v, CAST(sum(g1) AS BIGINT) AS c1,
         CAST(sum(1 - g1) AS BIGINT) AS c2,
         CAST(count(*) AS BIGINT) AS cnt
  FROM x GROUP BY v
), r AS (
  SELECT c1,
         2 * (coalesce(sum(cnt) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
           + cnt - 1 AS rank2
  FROM c
), n AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c
), s AS (
  SELECT CAST(sum(c1 * rank2) AS BIGINT) AS r1s2 FROM r
)
SELECT n1, n2,
       r1s2 - n1 * (n1 + 1) AS u1_scaled2,
       2 * n1 * n2 - (r1s2 - n1 * (n1 + 1)) AS u2_scaled2,
       CASE WHEN n1 * n2 = 0 THEN NULL
            ELSE round(CAST(r1s2 - n1 * (n1 + 1) AS DOUBLE)
                       / CAST(2 * n1 * n2 AS DOUBLE), 6) END AS auc
FROM s CROSS JOIN n
""",
    # AUC undefined when either group is empty — see drift_ks_value_shift
    doc="Mann-Whitney U / AUC with midrank ties (operators/"
    "nonparametric.mann_whitney_u): does the purchase value "
    "distribution stochastically dominate clicks? Doubled midranks "
    "(2s + c - 1) keep every rank sum BIGINT; AUC = 2U1/(2 n1 n2) = "
    "P(X1>X2) + P(X1=X2)/2 — the statistic every ranking eval "
    "normalizes to, computed exactly with one final division",
    tags=("stats", "ranking", "nonparametric"),
)
def rank_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.nonparametric import mann_whitney_u

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_type",
    )
    return mann_whitney_u(ev, "cents", F.col("event_type") == "purchase")


# ---------------------------------------------------------------------------
# Round-9 continuation: leave-one-out target encoding — the standard
# leakage-safe categorical feature for gradient-boosted / linear
# models: encode category c on row i as the mean target of all OTHER
# rows in c, enc_i = (sum_c - y_i) / (n_c - 1). The naive mean leaks
# the row's own label; LOO is the one-line fix every feature pipeline
# ships (Micci-Barreca 2001's empirical-Bayes encoder is the smoothed
# cousin). Brands with a single row are excluded (encoder undefined).
# Exactness: targets are exact integer cents, so sum_c and n_c are
# BIGINT; each row's encoding is ONE division of two exact integers
# (bit-identical IEEE on both engines); the report aggregates by
# SELECTION (min/max + their argmin rows), never by summing doubles.
# Scale: one broadcast join of per-category aggregates (category dim is
# tiny) against the fact table — zero extra shuffles beyond the
# category rollup; the encoding itself is a map-side expression.
# ---------------------------------------------------------------------------


@register(
    "target_encoding_loo",
    oracle="""
WITH facts AS (
  SELECT p.p_brand AS brand,
         CAST(round(l.l_quantity * 100) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), agg AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sum_y
  FROM facts GROUP BY brand
), enc AS (
  SELECT f.brand, f.y,
         CAST(a.sum_y - f.y AS DOUBLE) / CAST(a.n - 1 AS DOUBLE) AS loo
  FROM facts f JOIN agg a ON a.brand = f.brand
  WHERE a.n > 1
)
SELECT brand,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(min(loo), 6) AS min_enc,
       round(max(loo), 6) AS max_enc,
       CAST(min(y) AS BIGINT) AS min_target_cents,
       CAST(max(y) AS BIGINT) AS max_target_cents
FROM enc GROUP BY brand ORDER BY brand
""",
    doc="leave-one-out target encoding of p_brand against quantity "
    "cents: enc_i = (sum_c - y_i)/(n_c - 1) — leakage-safe, one "
    "integer-exact division per row after a broadcast join of the "
    "category rollup; the report is selection-only (min/max encoding "
    "and target per brand), so no float summation order exists",
    tags=("mining", "join"),
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    facts = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("y"),
    )
    agg = facts.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sum_y")
    )
    enc = (
        facts.join(F.broadcast(agg), "brand")
        .filter(F.col("n") > 1)
        .select(
            "brand",
            "y",
            (
                (F.col("sum_y") - F.col("y")).cast("double")
                / (F.col("n") - 1).cast("double")
            ).alias("loo"),
        )
    )
    return (
        enc.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("loo"), 6).alias("min_enc"),
            F.round(F.max("loo"), 6).alias("max_enc"),
            F.min("y").alias("min_target_cents"),
            F.max("y").alias("max_target_cents"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: quantile normalization across sources — map each
# source's n_chars distribution onto the GLOBAL distribution (the
# rank-based feature normalization genomics calls quantile
# normalization and ML pipelines use to make per-source features
# comparable before mixing corpora). Pure rank algebra: a row at
# within-source rank r (of n_s) takes the global value at rank
# ((r-1) * N) div n_s + 1 — integers end to end, and the normalized
# values are the original BIGINT n_chars, so even the per-source SUM
# is exact.
# Scale: the global reference rank is the two-pass distributed rank
# (range-partitioned rank + broadcast cumulative range counts — the
# surrogate_keys pattern), NOT a partition-less window, so no task ever
# sorts the whole table (the r11 verdict's scale-killer finding); one
# per-source window (partitioned); the rank join is an equi-join on a
# dense integer key.
# ---------------------------------------------------------------------------


@register(
    "quantile_normalization",
    oracle="""
WITH g AS (
  SELECT n_chars AS g_val,
         row_number() OVER (ORDER BY n_chars, doc_id) AS g_rank
  FROM documents
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all FROM documents
), s AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS s_rank,
         count(*) OVER (PARTITION BY source) AS n_s
  FROM documents
), mapped AS (
  SELECT s.source,
         g.g_val AS norm_val
  FROM s JOIN g
    ON g.g_rank = ((s.s_rank - 1) * (SELECT n_all FROM n)) // s.n_s + 1
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(norm_val) AS BIGINT) AS sum_norm,
       CAST(min(norm_val) AS BIGINT) AS min_norm,
       CAST(max(norm_val) AS BIGINT) AS max_norm
FROM mapped GROUP BY source ORDER BY source
""",
    doc="quantile normalization of n_chars across sources: each row at "
    "within-source rank r maps to the global value at rank "
    "((r-1)*N) div n_s + 1 — rank algebra over exact integers, the "
    "normalized values stay BIGINT so the per-source sum is exact; "
    "one global sort + one per-source window + a dense-integer rank "
    "equi-join",
    tags=("stats", "mining", "text"),
)
def quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    # N stays IN-PLAN: a 1-row count aggregate broadcast-cross-joined
    # onto the per-source rank rows (no eager driver .count())
    n_df = d.agg(F.count(F.lit(1)).alias("n_all"))
    from ..functions.codecs import surrogate_keys

    # identical numbering to row_number() OVER (ORDER BY n_chars, doc_id)
    # — the ordering is unique by doc_id — without the one-task sort
    g = (
        surrogate_keys(
            d.select("n_chars", "doc_id"),
            ["n_chars", "doc_id"],
            out_col="g_rank",
        )
        .select(
            F.col("n_chars").alias("g_val"),
            F.col("g_rank").cast("long").alias("g_rank"),
        )
    )
    # per-source rank + per-source count WITHOUT Window.partitionBy
    # (source): source cardinality is small, so that window is the r12
    # scale-killer divided by a constant — each partition sorts ~n/|src|
    # rows on one task (r12 verdict item 1). grouped_surrogate_keys
    # range-partitions on (source, n_chars, doc_id) instead; identical
    # numbering, no data-proportional window partition anywhere.
    from ..functions.codecs import grouped_surrogate_keys

    s = grouped_surrogate_keys(
        d.select("doc_id", "source", "n_chars"),
        "source",
        ["n_chars", "doc_id"],
        out_col="s_rank",
        count_col="n_s",
    ).crossJoin(F.broadcast(n_df)).withColumn(
        "tgt_rank", F.expr("((s_rank - 1) * n_all) div n_s + 1")
    )
    mapped = s.join(g, F.col("tgt_rank") == F.col("g_rank")).withColumnRenamed("g_val", "norm_val")
    return (
        mapped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("norm_val").alias("sum_norm"),
            F.min("norm_val").alias("min_norm"),
            F.max("norm_val").alias("max_norm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: CSV source fidelity — the one mainstream
# format the gate registry did not yet exercise end-to-end. The gate
# WRITES the events slice to CSV (explicit schema, microsecond
# timestamp format, no inference anywhere) and re-reads it through the
# engine's CSV source; the oracle computes the same rollup from the
# original parquet, so any loss in the text round-trip — truncated
# microseconds, double mangling, quoting/escape damage on the free-text
# props column — flips a cell. This is the reference's ingestion
# contract (SURVEY §2.1 scans) applied to CSV.
# Exactness: the compared rollup is BIGINT counts + exact cents + µs
# min/max; doubles cross text via shortest-round-trip repr (lossless
# by construction).
# Scale: a CSV scan is splittable line-wise; the explicit schema keeps
# inference (a full extra pass) out of the plan.
# ---------------------------------------------------------------------------


@register(
    "csv_roundtrip_scan",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS max_us,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="CSV source fidelity: write events to CSV (explicit schema, "
    "microsecond timestampFormat, header, no inference), re-read "
    "through the CSV source, and the rollup must equal the parquet "
    "oracle cell-for-cell — truncated µs, double mangling or "
    "quote/escape damage flips a cell; line-splittable scan, "
    "schema-on-read without the inference pass",
    tags=("scan", "write", "quality"),
)
def csv_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, out, _ = _gate_dirs(sf_dir, "csv_roundtrip")
    ev = t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(4)
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", fmt)
        .csv(out)
    )
    back = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double"
        )
        .option("header", "true")
        .option("timestampFormat", fmt)
        .csv(out)
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.min(epoch_us("ts")).alias("min_us"),
            F.max(epoch_us("ts")).alias("max_us"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: JSONL source fidelity — newline-delimited JSON
# is the lingua franca of training-data interchange; the gate writes
# the events slice as JSONL (explicit schema on re-read, microsecond
# timestamp format, no inference) and the per-day rollup of the
# re-read must equal the parquet oracle. Complements csv_roundtrip_scan
# and the reference's GeoJSON snapshot scan (SURVEY §2.1 S1) with the
# flat-JSONL case.
# Exactness: compared cells are BIGINT counts, exact cents and µs
# extrema; doubles cross the text boundary via shortest-round-trip
# repr.
# Scale: JSONL splits line-wise like CSV; explicit schema keeps the
# inference pass out of the plan.
# ---------------------------------------------------------------------------


@register(
    "jsonl_roundtrip_scan",
    oracle="""
SELECT epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
FROM events GROUP BY day ORDER BY day
""",
    doc="JSONL source fidelity: write events as newline-delimited JSON "
    "(microsecond timestampFormat), re-read with an explicit schema "
    "(no inference pass), per-day rollup must equal the parquet oracle "
    "cell-for-cell — the flat-JSONL sibling of the GeoJSON snapshot "
    "scan and csv_roundtrip_scan; line-splittable",
    tags=("scan", "write", "quality"),
)
def jsonl_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, out, _ = _gate_dirs(sf_dir, "jsonl_roundtrip")
    ev = t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(4)
        .write.mode("overwrite")
        .option("timestampFormat", fmt)
        .json(out)
    )
    back = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double"
        )
        .option("timestampFormat", fmt)
        .json(out)
    )
    return (
        back.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.max(epoch_us("ts")).alias("max_us"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: ORC source fidelity — the second columnar
# format Spark ships natively. Same contract as the CSV/JSONL gates:
# write, re-read, and the rollup must equal the parquet oracle — a
# column-type mangling (timestamp precision, double payload) flips a
# cell. Keyed by user bucket so the rollup exercises a different
# grouping than the other round-trip gates.
# Scale: ORC is a splittable columnar format with predicate pushdown,
# interchangeable with parquet in every store of this engine.
# ---------------------------------------------------------------------------


@register(
    "orc_roundtrip_scan",
    oracle="""
SELECT user_id % 10 AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
FROM events GROUP BY bucket ORDER BY bucket
""",
    doc="ORC source fidelity: write events to ORC, re-read, per-user-"
    "bucket rollup must equal the parquet oracle cell-for-cell "
    "(timestamp precision and double payloads survive the columnar "
    "round-trip); splittable columnar scan with pushdown, "
    "interchangeable with parquet across the engine's stores",
    tags=("scan", "write", "quality"),
)
def orc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, out, _ = _gate_dirs(sf_dir, "orc_roundtrip")
    ev = t(spark, sf_dir, "events")
    (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(4)
        .write.mode("overwrite")
        .orc(out)
    )
    back = spark.read.orc(out)
    return (
        back.groupBy((F.col("user_id") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.min(epoch_us("ts")).alias("min_us"),
            F.max(epoch_us("ts")).alias("max_us"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: hive-partitioned write + pruned read — the
# layout decision every lake makes first: write facts partitioned by
# day (directory-per-value), then a day-ranged query must read ONLY
# the matching directories. The gate writes events partitioned by the
# derived day column, re-reads with a day filter, and the rollup must
# equal the parquet oracle computed WITH the same filter; the pytest
# twin (tests/test_analytics_gates7.py) additionally pins
# PartitionFilters in the physical plan so the pruning itself — not
# just the answer — is verified.
# Scale: partition pruning is THE 100-TB lever — a day-ranged query
# over years of data touches only the asked-for directories; the
# partition column must be low-cardinality (days, not user ids) to
# avoid small-file explosion, which is exactly the layout here.
# ---------------------------------------------------------------------------


@register(
    "partitioned_write_prune",
    oracle="""
WITH d AS (
  SELECT epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS day,
         event_type, value
  FROM events
)
SELECT day, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM d WHERE day >= 19725 AND day <= 19727
GROUP BY day, event_type ORDER BY day, event_type
""",
    doc="hive-partitioned write + pruned read: events written "
    "partitionBy(day), re-read with a 3-day filter (directory pruning, "
    "pinned in-plan by the pytest twin), rollup equals the filtered "
    "parquet oracle — the first layout lever of a 100-TB lake; "
    "low-cardinality partition column by construction",
    tags=("scan", "write", "layout"),
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, out, _ = _gate_dirs(sf_dir, "part_prune")
    ev = t(spark, sf_dir, "events")
    (
        ev.select(
            "event_type",
            "value",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out)
    )
    back = (
        # DECLARED read schema (partition column last, as laid out): the
        # pruned read never depends on footer/directory inference, so an
        # empty write (no part files) still reads back, and the
        # partition column keeps its written BIGINT type instead of
        # small-int directory inference
        spark.read.schema("event_type string, value double, day long")
        .parquet(out)
        .filter((F.col("day") >= 19725) & (F.col("day") <= 19727))
    )
    return (
        back.groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# Round-10 depth: column cardinality / null / width profile — the first
# thing an ingestion pipeline computes for every new table (dictionary-
# encodability, join-key viability, null health). One scan computes all
# metrics as a single aggregation, then unpivots to one row per column;
# the DuckDB twin is the per-column UNION ALL spelled out.
# Exactness: BIGINT counts; doubles profile via exact cents; width =
# sum(length) for strings, NULL for non-strings.
# Scale: one map-side-combinable aggregation (count distinct per column
# is the only shuffle; at extreme cardinality swap in approx_count_
# distinct — the rollup_distinct_sketch gate is that path's twin).
# ---------------------------------------------------------------------------


@register(
    "column_cardinality_profile",
    oracle="""
SELECT 'event_id' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN event_id IS NULL THEN 1 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(NULL AS BIGINT) AS total_chars
FROM events
UNION ALL
SELECT 'event_type',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN event_type IS NULL THEN 1 END) AS BIGINT),
       CAST(count(DISTINCT event_type) AS BIGINT),
       CAST(sum(length(event_type)) AS BIGINT)
FROM events
UNION ALL
SELECT 'props',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN props IS NULL THEN 1 END) AS BIGINT),
       CAST(count(DISTINCT props) AS BIGINT),
       CAST(sum(length(props)) AS BIGINT)
FROM events
UNION ALL
SELECT 'user_id',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM events
UNION ALL
SELECT 'value_cents',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN value IS NULL THEN 1 END) AS BIGINT),
       CAST(count(DISTINCT CAST(round(value * 100) AS BIGINT)) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM events
ORDER BY col_name
""",
    doc="per-column ingestion profile of the events table (rows, nulls, "
    "exact NDV, total string width) in ONE scan: a single aggregation "
    "computes every metric, then an inline unpivot emits one row per "
    "column — dictionary-encodability and join-key viability at a "
    "glance; BIGINT counts, cents for the double column, the sketch "
    "twin for extreme-NDV corpora is rollup_distinct_sketch",
    tags=("quality", "scan"),
)
def column_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("event_id").isNull(), 1)).alias("id_null"),
        F.count_distinct(F.col("event_id")).alias("id_ndv"),
        F.count(F.when(F.col("event_type").isNull(), 1)).alias("type_null"),
        F.count_distinct(F.col("event_type")).alias("type_ndv"),
        F.sum(F.length("event_type")).alias("type_chars"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("props_null"),
        F.count_distinct(F.col("props")).alias("props_ndv"),
        F.sum(F.length("props")).alias("props_chars"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("user_null"),
        F.count_distinct(F.col("user_id")).alias("user_ndv"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("value_null"),
        F.count_distinct(
            F.round(F.col("value") * 100).cast("long")
        ).alias("value_ndv"),
    )
    null_chars = F.lit(None).cast("long")
    rows = F.array(
        F.struct(
            F.lit("event_id").alias("col_name"),
            F.col("id_null").alias("n_null"),
            F.col("id_ndv").alias("n_distinct"),
            null_chars.alias("total_chars"),
        ),
        F.struct(
            F.lit("event_type").alias("col_name"),
            F.col("type_null").alias("n_null"),
            F.col("type_ndv").alias("n_distinct"),
            F.col("type_chars").alias("total_chars"),
        ),
        F.struct(
            F.lit("props").alias("col_name"),
            F.col("props_null").alias("n_null"),
            F.col("props_ndv").alias("n_distinct"),
            F.col("props_chars").alias("total_chars"),
        ),
        F.struct(
            F.lit("user_id").alias("col_name"),
            F.col("user_null").alias("n_null"),
            F.col("user_ndv").alias("n_distinct"),
            null_chars.alias("total_chars"),
        ),
        F.struct(
            F.lit("value_cents").alias("col_name"),
            F.col("value_null").alias("n_null"),
            F.col("value_ndv").alias("n_distinct"),
            null_chars.alias("total_chars"),
        ),
    )
    return (
        agg.select("n_rows", F.explode(rows).alias("r"))
        .select(
            F.col("r.col_name").alias("col_name"),
            "n_rows",
            F.col("r.n_null").alias("n_null"),
            F.col("r.n_distinct").alias("n_distinct"),
            F.col("r.total_chars").alias("total_chars"),
        )
        .orderBy("col_name")
    )
