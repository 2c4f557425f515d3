"""Text analysis operators (BASELINE.json north star): language-ID,
quality scoring, token counting, fingerprinting. Pure column expressions;
the scoring tables (stopword markers) are tiny literal arrays folded into
the plan — no side lookups, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal high-frequency marker words per language (public common-word
# lists). Enough signal for a heuristic n-gram/stopword language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "es": ("el", "la", "los", "las", "de", "y", "un", "una", "es", "que"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "bu4", "ren2"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count without materializing the array."""
    return F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish proxy: count word pieces after splitting on whitespace
    AND punctuation/digit boundaries (a cheap BPE stand-in: ~chars/4 floor).
    Deterministic, expression-only."""
    pieces = F.split(F.regexp_replace(text, r"([^\w\s]|\d)", " $1 "), r"\s+")
    n_pieces = F.size(F.filter(pieces, lambda x: x != ""))
    return F.greatest(n_pieces, F.ceil(F.length(text) / 4).cast("int"))


def lang_scores(text: Column) -> list[Column]:
    """Per-language marker hit counts over the token set."""
    toks = F.array_distinct(F.split(F.lower(text), " "))
    cols = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        cols.append(F.size(F.array_intersect(toks, marker_arr)).alias(f"score_{lang}"))
    return cols


def detect_language(text: Column) -> Column:
    """argmax over marker scores; 'und' (undetermined) when all zero.

    Tie-break: the struct comparison in array_max is (score, lang)
    lexicographic, so equal scores resolve to the alphabetically LAST
    language code (zh > fr > es > en > de) — the DuckDB oracle in
    plans/text.text_langid implements the same order."""
    toks = F.array_distinct(F.split(F.lower(text), " "))
    pairs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.array_intersect(toks, marker_arr))
        pairs.append(F.struct(score.alias("s"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*pairs))
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard corpus-quality signals, one pass, no shuffle."""
    text = F.col(text_col)
    n_tok = token_count(text)
    toks = F.split(text, " ")
    n_distinct = F.size(F.array_distinct(toks))
    mean_word_len = (F.length(text) - (n_tok - 1)) / n_tok
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    return df.withColumns(
        {
            "n_chars": F.length(text),
            "n_tokens": n_tok,
            "n_distinct_tokens": n_distinct,
            "lexical_diversity": F.round(n_distinct / n_tok, 4),
            "mean_word_len": F.round(mean_word_len, 4),
            "punct_ratio": F.round(punct / F.greatest(F.length(text), F.lit(1)), 4),
            "quality": F.round(
                F.least(F.lit(1.0), n_tok / 200.0) * (n_distinct / n_tok), 4
            ),
        }
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive content identity: md5 over the sorted distinct
    token set (rolling-hash-class document fingerprint)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " "))
