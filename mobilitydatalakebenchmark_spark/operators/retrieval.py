"""Inverted-index text retrieval: postings build + BM25 ranked search.

The reference's document layer stores and reconstructs documents (SURVEY
§2.1 S9-S12); it never *searches* them. A corpus pipeline needs ranked
retrieval — for eval-set contamination probes, near-duplicate triage, and
"show me training docs matching X" debugging — so this module adds the
classic IR primitives as pure DataFrame plans:

* ``build_postings`` — the inverted index as data: one explode + one
  (doc_id, term) group-by. At scale this is THE index layout: partitioned
  by term, a query touches only its terms' postings, never the corpus.
* ``bm25_topk`` — Robertson/Spärck-Jones BM25 (the Okapi formulation,
  k1/b defaults 1.2/0.75) over the postings of the query's terms only.

Determinism discipline (the repo's hash-robustness rule): every input to
the score is an exact integer (tf, dl, df, N, sum_dl) so both engines
start from identical values; the float score is computed with ONE fixed
parenthesization; the per-document sum over query terms is an ORDERED
fold (terms sorted, left fold from 0.0 — the vectors.py list_sum ↔
F.aggregate pattern), never a commutative float aggregate; and ranking
compares the score ROUNDED to 4 decimals (ties broken by doc_id), with
the rounding margin auditable by tools/margin_probe.py.

Scale: the only corpus-sized shuffle is the postings group-by (build
time, amortized). Query time joins |query terms| posting lists; df and
corpus stats are single-row/broadcast joins; the rank window partitions
by query over candidate rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import local_df


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", sep: str = " "
) -> tuple[DataFrame, DataFrame]:
    """Return ``(postings, doc_stats)``: the inverted index rows
    ``(term, doc_id, tf, dl)`` and per-document lengths ``(doc_id, dl)``.

    ``dl`` is denormalized INTO the postings (computed at explode time,
    carried through the group-by as ``first``) so query-time scoring
    never joins back to a corpus-sized side — the one plan shape that
    stays cheap when the corpus is 100 TB and the query matches a few
    posting lists."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), sep)).alias("dl"),
        F.explode(F.split(F.col(text_col), sep)).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    doc_stats = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), sep)).alias("dl"),
    )
    return postings, doc_stats


def bm25_topk(
    postings: DataFrame,
    doc_stats: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Rank documents for each query by BM25 over the inverted index.

    ``queries`` has columns ``(query_id, term)`` — one row per query term.
    Returns ``(query_id, rank, doc_id, score)`` with ``score`` rounded to
    4 decimals and ``rank`` computed on the rounded score (doc_id
    tiebreak), ``rank <= topk``.

    Score per (query, doc): sum over matched terms of::

        ln(1 + (N - df + 0.5) / (df + 0.5))
          * tf * (k1+1) / (tf + k1 * ((1-b) + b * (dl*N / sum_dl)))

    folded in term order from 0.0, so the result is independent of join
    and aggregation order.
    """
    # corpus constants as a single broadcastable row — exact integers
    corpus = doc_stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # document frequency of the query's terms only (semi-join prunes the
    # index scan to |query terms| posting lists)
    qterms = queries.select("term").distinct()
    # hits feeds BOTH the df build (a broadcast, i.e. its own job) and
    # the scoring join — localCheckpoint so the postings group-by runs
    # once, not per consumer (the repo's multi-consumer discipline;
    # blocks are not fault-tolerant, the right trade for bounded jobs)
    hits = postings.join(F.broadcast(qterms), "term").localCheckpoint(eager=False)
    df_tbl = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        hits.join(F.broadcast(queries), "term")
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    dl_norm = (F.col("dl") * F.col("n_docs")).cast("double") / F.col("sum_dl").cast(
        "double"
    )
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl_norm
    )
    term_score = idf * (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / denom
    per_term = scored.select(
        "query_id", "doc_id", "term", term_score.alias("term_score")
    )
    # ordered fold: sort by term, then left-fold from 0.0 — order-invariant
    folded = per_term.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "term_score"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term_score"],
        ).alias("raw_score")
    )
    ranked = folded.withColumn("score", F.round("raw_score", 4)).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= topk).select(
        "query_id", "rank", "doc_id", "score"
    )


def literal_queries(spark: SparkSession, queries: dict[str, str]) -> DataFrame:
    """Build the (query_id, term) DataFrame from literal query strings."""
    rows = [
        (qid, term)
        for qid, text in sorted(queries.items())
        for term in dict.fromkeys(text.split())
    ]
    # local_df: the legacy list local-relation executes ~10-30x slower
    # per action (r13); query tables re-execute once per consuming action
    return local_df(spark, rows, "query_id string, term string")


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", sep: str = " "
) -> DataFrame:
    """Positional inverted index rows ``(term, doc_id, pos)`` (pos 0-based).

    The phrase-query layout: same single explode as ``build_postings`` but
    keeping token positions instead of collapsing to tf. At scale the index
    is written partitioned by term, so a phrase query reads only its own
    terms' posting lists."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "term"),
    ).select("term", "doc_id", "pos")


def literal_phrases(spark: SparkSession, phrases: dict[str, str]) -> DataFrame:
    """``(query_id, offset, term, plen)`` rows from literal phrase strings —
    one row per phrase token, ``offset`` its 0-based position in the phrase,
    ``plen`` the phrase length (denormalized so matching never joins a
    second phrase-metadata table)."""
    rows = []
    for qid, text in sorted(phrases.items()):
        toks = text.split()
        rows += [(qid, i, term, len(toks)) for i, term in enumerate(toks)]
    return local_df(
        spark, rows, "query_id string, offset int, term string, plen int"
    )


def phrase_match(postings_pos: DataFrame, phrases: DataFrame) -> DataFrame:
    """Exact phrase occurrences over the positional index.

    The classic set-based formulation (one join, any phrase length): each
    matched (posting, phrase-token) pair proposes the anchor position
    ``pos - offset`` where the phrase would have to start; an anchor at
    which ALL ``plen`` distinct offsets matched is one occurrence. Repeated
    phrase tokens (e.g. "table table") fall out naturally — both offsets
    must independently match at the anchor.

    Returns ``(query_id, doc_id, n_hits)`` with ``n_hits >= 1``. Integer
    arithmetic throughout — bit-identical on any engine. Scale: the join
    touches only the phrase terms' posting lists (broadcast phrase side);
    the anchor group-by shuffles candidate rows only, never the corpus.
    """
    cand = postings_pos.join(F.broadcast(phrases), "term").select(
        "query_id",
        "doc_id",
        (F.col("pos") - F.col("offset")).alias("anchor"),
        "offset",
        "plen",
    )
    hits = (
        cand.filter(F.col("anchor") >= 0)
        .groupBy("query_id", "doc_id", "anchor")
        .agg(
            F.countDistinct("offset").alias("n_off"),
            F.first("plen").alias("plen"),
        )
        .filter(F.col("n_off") == F.col("plen"))
    )
    return hits.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )


def overlap_topk(
    postings: DataFrame,
    queries: DataFrame,
    topk: int = 10,
) -> DataFrame:
    """Rank documents by distinct-query-term overlap (the lexical-recall
    ranker RRF typically fuses with a scored ranker): more matched terms
    first, then SHORTER documents (tighter match), then doc_id. Every
    ranking key is an exact integer, so the order is engine-identical
    without any rounding. Returns ``(query_id, rank, doc_id)``."""
    hits = postings.join(F.broadcast(queries), "term")
    per_doc = hits.groupBy("query_id", "doc_id").agg(
        F.countDistinct("term").alias("n_matched"), F.first("dl").alias("dl")
    )
    ranked = per_doc.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("n_matched"), F.asc("dl"), F.asc("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= topk).select("query_id", "rank", "doc_id")


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings (Cormack & Clarke 2009):
    ``score = 1/(k + rank_a) + 1/(k + rank_b)``, missing ranks contribute 0.

    Inputs carry ``(query_id, doc_id, rank)``. Determinism: each reciprocal
    is one IEEE division of exact-integer operands and the two-term sum has
    a FIXED left-to-right order — bit-identical doubles on any engine, so
    the fused score needs no rounding; ties break by doc_id. Scale: the
    fuse is a full-outer join of two topk-sized tables per query —
    negligible next to the rankers themselves."""
    a = ranked_a.select("query_id", "doc_id", F.col("rank").alias("rank_a"))
    b = ranked_b.select("query_id", "doc_id", F.col("rank").alias("rank_b"))
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score",
        F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
    )
    out = fused.withColumn(
        "fused_rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("rrf_score"), F.asc("doc_id")
            )
        ),
    )
    return out.filter(F.col("fused_rank") <= topk).select(
        "query_id",
        "fused_rank",
        "doc_id",
        F.coalesce("rank_a", F.lit(0)).alias("rank_a"),
        F.coalesce("rank_b", F.lit(0)).alias("rank_b"),
        "rrf_score",
    )


def dcg_weights_scaled(k: int = 10, scale: int = 1_000_000) -> list[int]:
    """Integer DCG rank weights: round(scale / log2(rank + 1)) for rank
    1..k. Pre-scaling the discount to fixed literals is what lets a DCG
    be an EXACT integer dot product (rel x weight) instead of a float
    sum whose addition order differs per engine — the same deferred-
    division discipline the rest of this repo uses. The tiny quantization
    (|err| <= 0.5/scale per term) is identical on both sides, so it is
    invisible to the gate."""
    import math

    return [round(scale / math.log2(r + 1)) for r in range(1, k + 1)]


def ndcg_at_k(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """nDCG@k per query from a ranked run and graded relevance labels.

    ``ranked``: (query_id, rank, doc_id) — rank 1-based, <= k rows per
    query (bm25_topk output). ``relevance``: (doc_id, rel) integer
    grades. DCG = sum(rel_r * w_r) with the integer weights of
    ``dcg_weights_scaled``; the ideal ordering re-ranks the SAME
    retrieved set by (rel desc, rank asc) — the retrieved-set
    normalization, which needs no corpus-wide relevant-doc scan and is
    the form eval harnesses use for run-to-run comparisons. Output:
    (query_id, dcg_scaled, idcg_scaled, ndcg) with one double division
    per query; ndcg = 0.0 when nothing retrieved is relevant.

    Scale: |queries| x k rows end-to-end; the relevance join is the only
    contact with corpus-sized data and it joins on doc_id equality.
    """
    weights = dcg_weights_scaled(k, scale)

    def w_of(rank_col):
        expr = F.lit(0).cast("long")
        for r, w in enumerate(weights, start=1):
            expr = F.when(rank_col == r, F.lit(w).cast("long")).otherwise(expr)
        return expr

    labeled = ranked.join(relevance, "doc_id").select(
        "query_id", "rank", F.col("rel").cast("long").alias("rel")
    )
    ideal_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("rank"))
    )
    scored = labeled.withColumn("w", w_of(F.col("rank"))).withColumn(
        "iw", w_of(ideal_rank)
    )
    per_q = scored.groupBy("query_id").agg(
        F.sum(F.col("rel") * F.col("w")).alias("dcg_scaled"),
        F.sum(F.col("rel") * F.col("iw")).alias("idcg_scaled"),
    )
    return per_q.withColumn(
        "ndcg",
        F.when(F.col("idcg_scaled") == 0, F.lit(0.0)).otherwise(
            F.round(
                F.col("dcg_scaled").cast("double")
                / F.col("idcg_scaled").cast("double"),
                6,
            )
        ),
    )
