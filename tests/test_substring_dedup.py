"""Exact substring-level duplicate spans (operators/dedup.duplicate_spans)
— the ExactSubstr policy: marked-position islands must recover the planted
duplicated runs, within-doc repeats must count, and short docs/spans must
stay invisible."""

from __future__ import annotations

from mobilitydatalakebenchmark_spark.operators.dedup import duplicate_spans

N = 4        # shingle width for tests
MIN_LEN = 6  # minimum span length (tokens)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in df.collect()
    )


def _uw(i, n):  # n unique filler words, disjoint across call sites
    return " ".join(f"u{i}x{j}" for j in range(n))


def test_cross_doc_span_is_found_in_both_docs(spark):
    shared = "the quick brown fox jumps over lazy dogs"  # 8 tokens
    df = _docs(spark, [f"{_uw(0, 6)} {shared}", f"{shared} {_uw(1, 6)}"])
    got = _spans(duplicate_spans(df, shingle_n=N, min_len_tokens=MIN_LEN))
    # doc 0: tokens 7..14; doc 1: tokens 1..8
    assert got == [(0, 7, 14, 8), (1, 1, 8, 8)]


def test_within_doc_repetition_counts(spark):
    run = "alpha beta gamma delta epsilon zeta"  # 6 tokens, repeated twice
    df = _docs(spark, [f"{run} {_uw(2, 5)} {run}"])
    got = _spans(duplicate_spans(df, shingle_n=N, min_len_tokens=MIN_LEN))
    assert got == [(0, 1, 6, 6), (0, 12, 17, 6)]


def test_unique_text_reports_nothing(spark):
    df = _docs(spark, [_uw(3, 20), _uw(4, 20)])
    assert duplicate_spans(df, shingle_n=N, min_len_tokens=MIN_LEN).count() == 0


def test_min_len_cut_drops_short_duplicates(spark):
    shared = "red green blue white"  # exactly one 4-shingle -> 4-token span
    df = _docs(spark, [f"{_uw(5, 8)} {shared}", f"{shared} {_uw(6, 8)}"])
    assert (
        duplicate_spans(df, shingle_n=N, min_len_tokens=5).count() == 0
    )
    got = _spans(duplicate_spans(df, shingle_n=N, min_len_tokens=4))
    assert got == [(0, 9, 12, 4), (1, 1, 4, 4)]


def test_docs_shorter_than_shingle_are_invisible(spark):
    df = _docs(spark, ["tiny doc", "tiny doc"])
    assert duplicate_spans(df, shingle_n=N, min_len_tokens=1).count() == 0


def test_min_occurrences_threshold(spark):
    run = "one two three four five six"
    texts = [f"{run} {_uw(7 + i, 5)}" for i in range(3)]
    df = _docs(spark, texts)
    # present 3x: passes min_occurrences=3, vanishes at 4
    assert duplicate_spans(
        df, shingle_n=N, min_len_tokens=MIN_LEN, min_occurrences=3
    ).count() == 3
    assert duplicate_spans(
        df, shingle_n=N, min_len_tokens=MIN_LEN, min_occurrences=4
    ).count() == 0
