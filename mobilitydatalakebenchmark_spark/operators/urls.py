"""URL canonicalization — the crawl-curation dedup key.

Web-scale corpora carry the same page under many raw URL spellings:
scheme/host case, a ``www.`` prefix, an explicit default port, a trailing
slash, tracking query parameters (``utm_*``), and fragments. Canonicalizing
before dedup collapses those variants; the reference has no URL layer at
all (its sources are mobility feeds), so this module is part of the
training-data-pipeline extension alongside ``text_analysis``/``dedup``.

Everything is a pure string/regexp column expression — zero shuffle per
row, JVM-side, and bit-identical on any engine (no floats anywhere) — so a
canonical-key dedup costs exactly one hash aggregate at any corpus size.

Canonical form (RFC 3986 normalizations plus the standard tracker strip):
``lower(scheme)://lower(host -www.)[:port unless scheme default]``
``path-without-trailing-slash?query-without-utm_*`` — fragment dropped,
empty query drops its ``?``, a bare path stays ``''`` (host-only URLs
compare equal with and without the lone ``/``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z]+)://"
_HOSTPORT_RE = r"^[A-Za-z]+://([^/?#]+)"
_PATH_RE = r"^[A-Za-z]+://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_parts(url: Column) -> dict[str, Column]:
    """Split a URL into scheme/host/port/path/query columns (fragment is
    never extracted — canonicalization drops it). Missing parts are ``''``
    on both Spark and DuckDB (their regexp_extract no-match convention)."""
    hostport = F.regexp_extract(url, _HOSTPORT_RE, 1)
    return {
        "scheme": F.lower(F.regexp_extract(url, _SCHEME_RE, 1)),
        "host": F.lower(F.regexp_extract(hostport, r"^([^:]+)", 1)),
        "port": F.regexp_extract(hostport, r":([0-9]+)$", 1),
        "path": F.regexp_extract(url, _PATH_RE, 1),
        "query": F.regexp_extract(url, _QUERY_RE, 1),
    }


def canonical_url(url: Column) -> Column:
    """The canonical spelling of ``url`` as a single column expression."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    default_port = F.when(p["scheme"] == "http", F.lit("80")).otherwise(
        F.when(p["scheme"] == "https", F.lit("443")).otherwise(F.lit(""))
    )
    port = F.when(
        (p["port"] == "") | (p["port"] == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    # strip ALL trailing slashes (a single-slash strip would not be
    # idempotent on '//' paths — found by the hypothesis property);
    # a bare "/" path canonicalizes to ""
    path = F.regexp_replace(p["path"], r"/+$", "")
    clean_q = F.array_join(
        F.filter(
            F.split(p["query"], "&"),
            lambda kv: ~kv.startswith("utm_") & (kv != ""),
        ),
        "&",
    )
    query = F.when(clean_q == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), clean_q)
    )
    return F.concat(p["scheme"], F.lit("://"), host, port, path, query)


def canonical_url_sql(url_expr: str) -> str:
    """The DuckDB twin of :func:`canonical_url` — same regexes, same
    normalization steps — for oracle SQL construction."""
    hostport = f"regexp_extract({url_expr}, '{_HOSTPORT_RE}', 1)"
    scheme = f"lower(regexp_extract({url_expr}, '{_SCHEME_RE}', 1))"
    host = (
        f"regexp_replace(lower(regexp_extract({hostport}, '^([^:]+)', 1)),"
        " '^www\\.', '')"
    )
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    default_port = (
        f"CASE WHEN {scheme} = 'http' THEN '80'"
        f" WHEN {scheme} = 'https' THEN '443' ELSE '' END"
    )
    port_out = (
        f"CASE WHEN {port} = '' OR {port} = {default_port} THEN ''"
        f" ELSE ':' || {port} END"
    )
    path = (
        f"regexp_replace(regexp_extract({url_expr}, '{_PATH_RE}', 1), '/+$', '')"
    )
    # DuckDB's array_to_string returns NULL (not '') for an empty list —
    # coalesce so query-less URLs don't NULL out the whole concat
    clean_q = (
        f"coalesce(array_to_string(list_filter(string_split("
        f"regexp_extract({url_expr}, '\\?([^#]*)', 1), '&'),"
        " x -> NOT starts_with(x, 'utm_') AND x <> ''), '&'), '')"
    )
    query_out = f"CASE WHEN {clean_q} = '' THEN '' ELSE '?' || {clean_q} END"
    return f"{scheme} || '://' || {host} || {port_out} || {path} || {query_out}"
