"""DataFusion-dialect -> Spark SQL transpile pass (SURVEY §4.2 item 2).

The reference accepts DataFusion 45 SQL verbatim (the server imposes no
restriction: lib/src/context/session.rs:658-673). Spark SQL covers almost
all of it; this module patches the residual dialect edges at the API
boundary so reference queries run unmodified:

- ``table@namespace`` relations: found for lazy JDBC registration
  (reference table_register.rs:19-75) and backtick-quoted so Spark's
  parser accepts the ``@`` (SURVEY hard-parts note);
- ``date_bin(INTERVAL, ts[, origin])`` -> epoch-floor arithmetic;
- function-name aliases with identical argument order.

This is a string-level pass (no sqlglot in the container); it is
deliberately conservative: identifiers inside string literals are
protected before rewriting.
"""

from __future__ import annotations

import re

# function aliases with the SAME argument order/semantics
_FN_ALIASES = {
    "approx_distinct": "approx_count_distinct",
    "approx_percentile_cont": "percentile_approx",
    "to_unixtime": "unix_timestamp",
    "to_hex": "hex",
    "strpos": "instr",
    "random": "rand",
    "arrow_typeof": "typeof",
    "list_contains": "array_contains",
    "array_to_string": "array_join",
}

# DataFusion/Postgres ``regexp_match(s, p)`` returns the FIRST match's
# capture groups (NULL when no match) — not Spark's regexp_extract_all
# (ALL matches of one group). Registered as a SQL scalar function per
# session instead of a string rewrite. Documented limit: patterns must
# have >=1 capture group (group 1 is returned), matching the common
# Postgres usage; group-less patterns raise from regexp_extract.
SESSION_SQL_FUNCTIONS: tuple[str, ...] = (
    """
    CREATE OR REPLACE TEMPORARY FUNCTION regexp_match(s STRING, p STRING)
    RETURNS ARRAY<STRING>
    RETURN CASE WHEN s RLIKE p THEN array(regexp_extract(s, p, 1)) END
    """,
)


def register_session_functions(spark) -> None:
    """Install dialect-shim SQL functions into a SparkSession (idempotent)."""
    for ddl in SESSION_SQL_FUNCTIONS:
        spark.sql(ddl)

_TABLE_AT_NS = re.compile(r"(?<![\w`.])(\w+)@(\w+)(?![\w`])")

_INTERVAL_SECONDS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
    "week": 604800,
    "weeks": 604800,
}

_DATE_BIN = re.compile(
    r"date_bin\s*\(\s*interval\s+'(\d+)\s*(\w+)'\s*,"
    r"\s*([^,()]+(?:\([^()]*\))?[^,()]*)\s*"
    r"(?:,\s*([^()]+(?:\([^()]*\)[^()]*)*))?\)",
    re.IGNORECASE,
)


def _protect_strings(sql: str) -> tuple[str, list[str]]:
    literals: list[str] = []

    def stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    return re.sub(r"'(?:[^']|'')*'", stash, sql), literals


def _restore_strings(sql: str, literals: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], sql)


def find_table_at_namespace(sql: str) -> list[tuple[str, str]]:
    """All ``table@namespace`` relations in the query (dedup, in order).
    Reference scans the AST (table_register.rs:40); this is the regex
    equivalent over a string with literals masked out."""
    masked, _ = _protect_strings(sql)
    seen: list[tuple[str, str]] = []
    for m in _TABLE_AT_NS.finditer(masked):
        pair = (m.group(1), m.group(2))
        if pair not in seen:
            seen.append(pair)
    return seen


def quote_table_at_namespace(sql: str) -> str:
    masked, lits = _protect_strings(sql)
    masked = _TABLE_AT_NS.sub(r"`\1@\2`", masked)
    return _restore_strings(masked, lits)


def rewrite_date_bin(sql: str) -> str:
    """``date_bin(INTERVAL '5 minutes', ts[, origin])`` ->
    epoch-floor arithmetic. The optional third argument shifts the bucket
    boundaries: ``floor((ts - origin) / width) * width + origin``
    (DataFusion's default origin is the epoch, so the two-arg form omits
    the shift)."""

    def repl(m: re.Match) -> str:
        n, unit, expr = int(m.group(1)), m.group(2).lower(), m.group(3).strip()
        origin = (m.group(4) or "").strip()
        secs = _INTERVAL_SECONDS.get(unit)
        if secs is None:
            return m.group(0)
        width = n * secs
        if origin:
            o = f"unix_timestamp({origin})"
            return (
                f"timestamp_seconds(floor((unix_timestamp({expr}) - {o})"
                f" / {width}) * {width} + {o})"
            )
        return (
            f"timestamp_seconds(floor(unix_timestamp({expr}) / {width}) * {width})"
        )

    return _DATE_BIN.sub(repl, sql)


def rewrite_function_aliases(sql: str) -> str:
    masked, lits = _protect_strings(sql)
    for src, dst in _FN_ALIASES.items():
        masked = re.sub(rf"\b{src}\s*\(", f"{dst}(", masked, flags=re.IGNORECASE)
    return _restore_strings(masked, lits)


class UnsupportedDialectFeature(ValueError):
    """DataFusion-dialect feature with no Spark analog (SURVEY §2.B gaps).
    Raised eagerly with a clear message instead of letting Spark's parser
    produce an opaque failure."""


_GROUPS_FRAME = re.compile(r"\bGROUPS\s+BETWEEN\b|\bGROUPS\s+(\d+|UNBOUNDED)\s+PRECEDING\b", re.IGNORECASE)

# A GROUPS frame whose endpoints are UNBOUNDED PRECEDING / CURRENT ROW /
# UNBOUNDED FOLLOWING is value-identical to the same RANGE frame: RANGE
# CURRENT ROW already includes every peer (tie) of the current row, which
# is exactly what GROUPS CURRENT ROW means. Only offset GROUPS frames
# (``GROUPS n PRECEDING``) have no Spark equivalent.
_GROUPS_REWRITABLE = re.compile(
    r"\bGROUPS\s+(BETWEEN\s+(?:UNBOUNDED\s+PRECEDING|CURRENT\s+ROW)\s+AND\s+"
    r"(?:UNBOUNDED\s+FOLLOWING|CURRENT\s+ROW)|UNBOUNDED\s+PRECEDING)\b",
    re.IGNORECASE,
)


def rewrite_groups_frames(sql: str) -> str:
    """Rewrite the unbounded/current-row GROUPS frames to RANGE."""
    masked, lits = _protect_strings(sql)
    masked = _GROUPS_REWRITABLE.sub(lambda m: f"RANGE {m.group(1)}", masked)
    return _restore_strings(masked, lits)


def check_unsupported(sql: str) -> None:
    masked, _ = _protect_strings(sql)
    if _GROUPS_FRAME.search(masked):
        raise UnsupportedDialectFeature(
            "offset GROUPS window frames are not supported by Spark SQL; "
            "only UNBOUNDED PRECEDING / CURRENT ROW GROUPS frames are "
            "rewritable (to RANGE) — use RANGE or ROWS frames"
        )


def transpile(sql: str) -> str:
    """Full DataFusion->Spark pre-pass applied before ``spark.sql``."""
    out = rewrite_groups_frames(sql)
    check_unsupported(out)
    out = rewrite_date_bin(out)
    out = rewrite_function_aliases(out)
    out = quote_table_at_namespace(out)
    return out
