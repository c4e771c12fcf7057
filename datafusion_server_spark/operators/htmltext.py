"""HTML -> text extraction (CommonCrawl-style curation step).

Beyond-reference operator family: the first stage of a web-scale
training-data pipeline is turning crawled HTML into visible text
(cf. CCNet / RefinedWeb / FineWeb preprocessing). The whole chain is
JVM-side ``regexp_replace``/``regexp_extract`` expressions inside
whole-stage codegen — a narrow, shuffle-free map at any corpus size;
no Python crossing.

Engine-parity notes (the oracle runs the same chain under DuckDB's
RE2 while Spark compiles Java regex):

- inline flags ``(?is)`` and non-greedy ``.*?`` behave identically in
  both engines for these patterns;
- ``\\s`` is AVOIDED deliberately: Java's ``\\s`` includes ``\\x0B``
  (vertical tab), RE2's does not — the whitespace collapse uses the
  explicit class ``[ \\t\\r\\n]`` instead;
- DuckDB's ``regexp_replace`` replaces only the first match unless the
  ``'g'`` option is passed — the oracle SQL must always pass it.

Entity unescape covers the named entities the synthesizer emits; the
``&amp;`` rewrite runs LAST so ``&amp;lt;``-style double escapes (not
produced here) would not be double-decoded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (entity, replacement) — &amp; deliberately last
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_STYLE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"<[^>]+>"
_WS = r"[ \t\r\n]+"


def html_text_col(html: Column) -> Column:
    """Visible-text extraction as a single codegen expression chain:
    drop script/style payloads and comments, replace every remaining
    tag with a space, unescape named entities, collapse whitespace."""
    c = F.regexp_replace(html, _SCRIPT, " ")
    c = F.regexp_replace(c, _STYLE, " ")
    c = F.regexp_replace(c, _COMMENT, " ")
    c = F.regexp_replace(c, _TAG, " ")
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, _WS, " "))


def html_title_col(html: Column) -> Column:
    """First ``<title>`` payload, entity-unescaped and trimmed."""
    c = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, _WS, " "))


def html_links_col(html: Column) -> Column:
    """Array of raw (un-unescaped) ``href`` attribute values, in
    document order."""
    return F.regexp_extract_all(html, F.lit(r'href="([^"]*)"'), 1)


def extract_text(df: DataFrame, html_col: str, out_col: str = "clean_text") -> DataFrame:
    return df.withColumn(out_col, html_text_col(F.col(html_col)))


def extract_meta(df: DataFrame, html_col: str) -> DataFrame:
    """Title + link inventory per document."""
    links = html_links_col(F.col(html_col))
    return df.withColumn("title", html_title_col(F.col(html_col))).withColumn(
        "n_links", F.size(links).cast("bigint")
    ).withColumn(
        # try_element_at, not element_at: a page with no links must
        # yield NULL, not an ANSI out-of-bounds error
        "first_link",
        F.try_element_at(links, F.lit(1)),
    ).withColumn("links_joined", F.array_join(links, "|"))


def link_domain_col(href: Column) -> Column:
    """Authority (host) of an absolute http(s) href; empty string for
    relative links. The UT1/blocklist-gating key of a crawl pipeline."""
    return F.regexp_extract(href, r"^https?://([^/?#]+)", 1)
