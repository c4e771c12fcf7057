"""HTML-extraction queries (operators.htmltext).

The fixture corpus is plain text, so — exactly like the multimodal
family — each query SYNTHESIZES a deterministic HTML wrapper around
every document (same ``||`` concatenation on both engines), then runs
the REAL extraction chain on it. The oracle is a genuine engine-parity
check of the interesting part: Spark compiles the patterns with Java
regex, DuckDB with RE2, and the chain is written to behave identically
under both (see ``operators/htmltext.py`` parity notes). The
``roundtrip_ok`` column additionally proves the extraction recovers
the known visible text of the synthesized page for every document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import htmltext
from datafusion_server_spark.operators.htmltext import ENTITIES
from datafusion_server_spark.queries import df_query

# synthesis template: literal strings interleaved with the doc-id and
# the document text (markers resolved per engine below)
ID, TEXT = object(), object()

_PARTS: tuple = (
    "<html><head><title>Doc ", ID, " &amp; friends</title>",
    '<style type="text/css">body { margin: 0; }</style>',
    '<script type="text/javascript">var s = "<p>hidden</p>"; '
    'if (1 < 2) { s = "&amp;"; }</script>',
    "</head><body><!-- boilerplate ", ID, " -->",
    '<h1 id="h">Title &lt;', ID, "&gt;</h1>",
    '<p class="body">', TEXT, "</p>",
    '<a href="https://example.com/doc/', ID, '?ref=1&amp;x=2">Read &quot;more&quot;</a> ',
    '<a href="/rel/', ID, '">next</a><br/></body></html>',
)
# the visible text the chain must recover
_EXPECTED: tuple = (
    "Doc ", ID, " & friends Title <", ID, "> ", TEXT, ' Read "more" next',
)


def _spark_concat(parts: tuple) -> Column:
    cols = []
    for p in parts:
        if p is ID:
            cols.append(F.col("doc_id").cast("string"))
        elif p is TEXT:
            cols.append(F.col("text"))
        else:
            cols.append(F.lit(p))
    return F.concat(*cols)


def _sql_concat(parts: tuple) -> str:
    out = []
    for p in parts:
        if p is ID:
            out.append("CAST(doc_id AS VARCHAR)")
        elif p is TEXT:
            out.append("text")
        else:
            out.append("'" + p.replace("'", "''") + "'")
    return " || ".join(out)


def _sql_unescape(expr: str) -> str:
    for ent, ch in ENTITIES:
        out = ch.replace("'", "''")
        expr = f"REPLACE({expr}, '{ent}', '{out}')"
    return expr


def _sql_text(expr: str) -> str:
    for pat in (
        r"(?is)<script[^>]*>.*?</script>",
        r"(?is)<style[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
        r"<[^>]+>",
    ):
        expr = f"REGEXP_REPLACE({expr}, '{pat}', ' ', 'g')"
    return f"TRIM(REGEXP_REPLACE({_sql_unescape(expr)}, '[ \\t\\r\\n]+', ' ', 'g'))"


_TEXT_ORACLE = f"""
WITH h AS (SELECT doc_id, text, {_sql_concat(_PARTS)} AS html FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {_sql_text("html")} AS clean_text,
       ({_sql_text("html")} = {_sql_concat(_EXPECTED)}) AS roundtrip_ok
FROM h
"""


@df_query("html_extract_text", _TEXT_ORACLE)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    wrapped = docs.withColumn("html", _spark_concat(_PARTS))
    out = htmltext.extract_text(wrapped, "html")
    return out.select(
        "doc_id",
        "clean_text",
        (F.col("clean_text") == _spark_concat(_EXPECTED)).alias("roundtrip_ok"),
    )


def _sql_title(expr: str) -> str:
    raw = f"REGEXP_EXTRACT({expr}, '(?is)<title[^>]*>(.*?)</title>', 1)"
    return f"TRIM(REGEXP_REPLACE({_sql_unescape(raw)}, '[ \\t\\r\\n]+', ' ', 'g'))"


_META_ORACLE = f"""
WITH h AS (SELECT doc_id, text, {_sql_concat(_PARTS)} AS html FROM documents),
m AS (SELECT doc_id, html,
             REGEXP_EXTRACT_ALL(html, 'href="([^"]*)"', 1) AS links
      FROM h)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {_sql_title("html")} AS title,
       CAST(LEN(links) AS BIGINT) AS n_links,
       links[1] AS first_link,
       ARRAY_TO_STRING(links, '|') AS links_joined
FROM m
"""


@df_query("html_extract_meta", _META_ORACLE)
def html_extract_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    wrapped = docs.withColumn("html", _spark_concat(_PARTS))
    return htmltext.extract_meta(wrapped, "html").select(
        "doc_id", "title", "n_links", "first_link", "links_joined"
    )
