"""URL canonicalization for crawl-dedup pipelines.

Beyond-reference operator (SURVEY.md §2 extensions, web-ingest family):
crawl corpora carry millions of raw URL spellings of the same page —
scheme/host case, default ports, tracking parameters, fragment anchors,
query-parameter order, trailing slashes. Deduplicating by CANONICAL URL
is the first (and cheapest) dedup pass every web pipeline runs, before
any content hashing: it needs no document bytes at all.

The canonical form produced here:

1. scheme and host lowercased (path and query stay case-sensitive —
   RFC 3986 §6.2.2.1 only licenses case normalization for those two);
2. default port stripped (``:443`` for https, ``:80`` for http);
3. fragment dropped (never sent to the server);
4. tracking parameters removed (``utm_*``, ``ref``, ``fbclid``,
   ``gclid`` — the ubiquitous analytics decorations);
5. remaining query parameters sorted bytewise;
6. trailing slashes stripped from non-root paths, empty path -> ``/``;
7. the ``?`` dropped when no parameters survive.

Everything is built from ``regexp_extract`` / ``split`` / higher-order
array functions — a pure narrow projection that whole-stage-codegens
into the scan, so at 100 TB the canonicalization itself costs nothing
beyond the read; the dedup that follows is one hash aggregation on the
canonical string.

Determinism / oracle parity: the patterns below use no constructs that
differ between Java regex (Spark) and RE2 (DuckDB) — character classes,
anchors, and literal alternations only; array sort is bytewise in both
engines for ASCII-safe URL text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters dropped during canonicalization: name= prefixes
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` (see module docstring for the rules).

    Non-URL strings (no ``scheme://``) canonicalize to the empty
    string — callers filter or bucket those separately.
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.when(scheme == "https", F.regexp_replace(host, ":443$", "")).otherwise(
        F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).otherwise(host)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
        )
    )


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB SQL mirror of :func:`canonicalize_url` (oracle side)."""
    scheme = f"LOWER(REGEXP_EXTRACT({expr}, '{_SCHEME_RE}', 1))"
    host_raw = f"LOWER(REGEXP_EXTRACT({expr}, '{_HOST_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'https' THEN REGEXP_REPLACE({host_raw}, ':443$', '')"
        f" WHEN {scheme} = 'http' THEN REGEXP_REPLACE({host_raw}, ':80$', '')"
        f" ELSE {host_raw} END"
    )
    path_stripped = (
        f"REGEXP_REPLACE(REGEXP_EXTRACT({expr}, '{_PATH_RE}', 1), '/+$', '')"
    )
    path = f"CASE WHEN {path_stripped} = '' THEN '/' ELSE {path_stripped} END"
    query = f"REGEXP_EXTRACT({expr}, '\\?([^#]*)', 1)"
    params = (
        f"LIST_SORT(LIST_FILTER(STRING_SPLIT({query}, '&'), "
        f"p -> p <> '' AND NOT REGEXP_MATCHES(p, '{TRACKING_PARAM_RE}')))"
    )
    qs = f"ARRAY_TO_STRING({params}, '&')"
    return (
        f"CASE WHEN {scheme} = '' THEN '' ELSE "
        f"{scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END) END"
    )
