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
    return spark.createDataFrame(rows, "query_id string, term string")
