"""Typed classification of Spark's "store not there yet" read errors.

Every self-describing store in this package (ivm, versioned, shards,
streaming ingest, velocity) needs to distinguish two benign first-read
shapes from a genuinely corrupt store:

* the directory does not exist yet (``PATH_NOT_FOUND``), and
* the directory exists but holds no part files to infer a schema from —
  an EMPTY write leaves zero files (``UNABLE_TO_INFER_SCHEMA``).

Matching these by message substring alone is fragile (a renamed or
localized message silently breaks the fallback, and an unrelated
AnalysisException merely MENTIONING the text would be wrongly treated
as benign — r11 ADVICE). These helpers consult the typed error class
first (``getCondition``/``getErrorClass`` on
``pyspark.errors.AnalysisException``) and keep the substring check only
as the legacy fallback for exceptions that carry no class.
"""

from __future__ import annotations

_INFER_CLASSES = ("UNABLE_TO_INFER_SCHEMA",)
_MISSING_CLASSES = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
_INFER_SUBSTRINGS = ("UNABLE_TO_INFER_SCHEMA", "Unable to infer schema")
_MISSING_SUBSTRINGS = _INFER_SUBSTRINGS + (
    "PATH_NOT_FOUND",
    "Path does not exist",
)


def _error_class(exc: BaseException) -> str | None:
    """The AnalysisException error class, or None when unavailable."""
    try:
        from pyspark.errors import AnalysisException
    except ImportError:  # pragma: no cover - pyspark always present here
        return None
    if not isinstance(exc, AnalysisException):
        return None
    for attr in ("getCondition", "getErrorClass"):  # 4.x name, then legacy
        fn = getattr(exc, attr, None)
        if callable(fn):
            try:
                cls = fn()
            except Exception:
                cls = None
            if cls:
                return cls
    return None


def is_schema_inference_error(exc: BaseException) -> bool:
    """True iff ``exc`` is the empty-dir "no files to infer a schema
    from" analysis error (and nothing else)."""
    cls = _error_class(exc)
    if cls is not None:
        return cls in _INFER_CLASSES
    s = str(exc)
    return any(m in s for m in _INFER_SUBSTRINGS)


def is_missing_store_error(exc: BaseException) -> bool:
    """True iff ``exc`` is a benign first-read shape: the store dir is
    missing entirely, or exists with no part files."""
    cls = _error_class(exc)
    if cls is not None:
        return cls in _MISSING_CLASSES
    s = str(exc)
    return any(m in s for m in _MISSING_SUBSTRINGS)
