"""Inverted-index build + BM25 ranking vs a literal Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    literal_queries,
)

DOCS = [
    (0, "spark join window join join"),
    (1, "window scan merge"),
    (2, "spark spark spark window"),
    (3, "merge batch stream stream"),
    (4, "scan"),
    (5, "join window spark merge batch scan stream"),
]


def _bm25_ref(query_terms, k1=1.2, b=0.75):
    """Literal BM25 over DOCS."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    sum_dl = sum(len(t) for t in toks.values())
    scores = {}
    for term in query_terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            dl = len(t)
            denom = tf + k1 * ((1 - b) + b * (dl * n / sum_dl))
            scores[d] = scores.get(d, 0.0) + idf * (tf * (k1 + 1.0)) / denom
    return scores


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, stats = build_postings(df)
    return postings.cache(), stats.cache()


class TestPostings:
    def test_postings_tf_and_dl(self, corpus):
        postings, stats = corpus
        tf = {
            (r["term"], r["doc_id"]): r["tf"] for r in postings.collect()
        }
        assert tf[("join", 0)] == 3
        assert tf[("spark", 2)] == 3
        assert ("scan", 0) not in tf
        dl = {r["doc_id"]: r["dl"] for r in stats.collect()}
        assert dl == {0: 5, 1: 3, 2: 4, 3: 4, 4: 1, 5: 7}


class TestBM25:
    def test_matches_python_reference(self, spark, corpus):
        postings, stats = corpus
        q = literal_queries(spark, {"qa": "spark join", "qb": "stream scan"})
        got = bm25_topk(postings, stats, q, topk=10).collect()
        for qid, terms in (("qa", ["spark", "join"]), ("qb", ["stream", "scan"])):
            ref = _bm25_ref(terms)
            mine = {r["doc_id"]: r["score"] for r in got if r["query_id"] == qid}
            assert set(mine) == set(ref)
            for d, s in ref.items():
                assert mine[d] == pytest.approx(round(s, 4), abs=1e-9)
            # ranking: rounded-score desc, doc_id asc
            order = [r["doc_id"] for r in sorted(
                (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
            )]
            expect = sorted(ref, key=lambda d: (-round(ref[d], 4), d))
            assert order == expect

    def test_unknown_term_ignored_all_unknown_empty(self, spark, corpus):
        postings, stats = corpus
        q = literal_queries(spark, {"q1": "spark zebra", "q2": "zebra qux"})
        got = bm25_topk(postings, stats, q, topk=10)
        byq = {
            r["query_id"] for r in got.collect()
        }
        assert "q1" in byq  # unknown term contributes nothing, query survives
        assert "q2" not in byq  # fully-unknown query retrieves nothing

    def test_topk_truncates(self, spark, corpus):
        postings, stats = corpus
        q = literal_queries(spark, {"q": "window"})
        assert bm25_topk(postings, stats, q, topk=2).count() == 2

    def test_stays_jvm_side(self, spark, corpus):
        postings, stats = corpus
        q = literal_queries(spark, {"q": "spark join"})
        plan = bm25_topk(postings, stats, q)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "green", "dog", "cat"]),
            min_size=1,
            max_size=10,
        ).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    st.lists(
        st.sampled_from(["red", "blue", "dog", "zebra"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_bm25_matches_python_reference_property(spark, texts, qterms):
    """Any corpus, any query: BM25 scores == the literal Python formula
    and ranking follows (rounded score desc, doc_id asc)."""
    import math

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    postings, stats = build_postings(docs)
    q = literal_queries(spark, {"q": " ".join(qterms)})
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in bm25_topk(postings, stats, q, topk=100).collect()
    }

    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    n, sum_dl = len(texts), sum(len(t) for t in toks.values())
    ref: dict[int, float] = {}
    for term in qterms:
        df_ = sum(1 for t in toks.values() if term in t)
        if not df_:
            continue
        idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                dl = len(t)
                denom = tf + 1.2 * (0.25 + 0.75 * (dl * n / sum_dl))
                ref[d] = ref.get(d, 0.0) + idf * (tf * 2.2) / denom
    assert set(got) == set(ref)
    for d, s in ref.items():
        assert got[d][1] == pytest.approx(round(s, 4), abs=1e-9), d
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][0])]
    expect = sorted(ref, key=lambda d: (-round(ref[d], 4), d))
    assert order == expect


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
