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
    "regexp_match": "regexp_extract_all",
}

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
    r"date_bin\s*\(\s*interval\s+'(\d+)\s*(\w+)'\s*,\s*([^,()]+(?:\([^()]*\))?[^,()]*)\s*(?:,[^)]*)?\)",
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
    """``date_bin(INTERVAL '5 minutes', ts)`` ->
    ``timestamp_seconds(floor(unix_timestamp(ts)/300)*300)``."""

    def repl(m: re.Match) -> str:
        n, unit, expr = int(m.group(1)), m.group(2).lower(), m.group(3).strip()
        secs = _INTERVAL_SECONDS.get(unit)
        if secs is None:
            return m.group(0)
        width = n * secs
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


_GROUPS_FRAME = re.compile(r"\bGROUPS\s+BETWEEN\b|\bGROUPS\s+\d+\s+PRECEDING\b", re.IGNORECASE)


def check_unsupported(sql: str) -> None:
    masked, _ = _protect_strings(sql)
    if _GROUPS_FRAME.search(masked):
        raise UnsupportedDialectFeature(
            "GROUPS window frames are not supported by Spark SQL; "
            "rewrite with RANGE or ROWS frames"
        )


def transpile(sql: str) -> str:
    """Full DataFusion->Spark pre-pass applied before ``spark.sql``."""
    check_unsupported(sql)
    out = rewrite_date_bin(sql)
    out = rewrite_function_aliases(out)
    out = quote_table_at_namespace(out)
    return out
