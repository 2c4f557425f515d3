"""PII detection / redaction over document text — a first-class
training-data-pipeline operator (corpus scrubbing before pretraining).

No reference counterpart (the reference is a mobility store collection);
this extends the engine along the BASELINE.json north star the same way
operators/dedup.py does. Patterns are deliberately written in the common
subset of Java regex (Spark) and RE2 (DuckDB) so the oracle twin runs the
IDENTICAL expressions: no backreferences, no lookaround.

Scale posture: detection and masking are pure per-row column expressions
(regexp_count / regexp_replace) — zero shuffles, whole-stage codegen,
trivially partition-parallel at 100 TB. The per-category corpus rollup is
one map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered dict: masking applies in this order (email first so its digits
# are gone before the phone/IP passes scan the remainder).
PII_PATTERNS: dict[str, str] = {
    # (?i): real-world emails are mixed-case; the flag is in the Java/RE2
    # common subset so the oracle runs the identical pattern
    "email": r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column) -> list[Column]:
    """One count column per category, aliased pii_<name>."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"pii_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def scrub(text: Column) -> Column:
    """Mask every PII span with [<CATEGORY>]. Order matters (see
    PII_PATTERNS); each pass is a full-string global replace."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII profile: the input columns + one count per category +
    has_pii flag."""
    counts = pii_counts(F.col(text_col))
    out = df.select("*", *counts)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"pii_{name}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace PII spans in ``text_col`` (in place unless ``out_col``)."""
    return df.withColumn(out_col or text_col, scrub(F.col(text_col)))
