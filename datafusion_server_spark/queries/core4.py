"""Round-9 extension queries: URL-canonicalization dedup, CUSUM
changepoints, linear multi-touch attribution, label-propagation
communities, Kaplan-Meier survival, matryoshka truncated-dim recall.

Beyond-reference analytics (SURVEY.md §2 extensions) following the
house determinism rules: float sums become per-term scaled-BIGINT
sums, argmaxes carry explicit tie-breaks, sequential float folds run
in an identical order on both engines, and raw doubles are repr-round
paired (``rrepr``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import urltools
from datafusion_server_spark.queries import df_query, rrepr

# --- web_url_canonicalize -------------------------------------------------
# The fixture corpus has no URL column, so (exactly like the html /
# multimodal families) each document SYNTHESIZES three deterministic raw
# spellings of its page URL — uppercase host + default port + utm +
# trailing slash, fragment anchor, reordered params — via the same
# concatenation on both engines; the query under test is the
# canonicalize -> group-by-canonical dedup that collapses them.
_PAGE_KEY = "doc_id % 97"  # many docs share a page -> real collapse


def _variants_sql() -> str:
    k = f"CAST({_PAGE_KEY} AS VARCHAR)"
    d = "CAST(doc_id AS VARCHAR)"
    z = "CAST(doc_id % 5 AS VARCHAR)"
    return (
        f"['HTTPS://' || UPPER(source) || '.Example.ORG:443/articles/' || {k}"
        f"   || '/?id=' || {k} || '&utm_source=feed',"
        f" 'https://' || source || '.example.org/articles/' || {k}"
        f"   || '?id=' || {k} || '#frag-' || {d},"
        f" 'https://' || source || '.example.org/articles/' || {k}"
        f"   || '?z=' || {z} || '&id=' || {k} || '&ref=rss']"
    )


def _variants_spark() -> F.Column:
    k = (F.col("doc_id") % 97).cast("string")
    d = F.col("doc_id").cast("string")
    z = (F.col("doc_id") % 5).cast("string")
    return F.array(
        F.concat(
            F.lit("HTTPS://"), F.upper(F.col("source")),
            F.lit(".Example.ORG:443/articles/"), k,
            F.lit("/?id="), k, F.lit("&utm_source=feed"),
        ),
        F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.org/articles/"), k,
            F.lit("?id="), k, F.lit("#frag-"), d,
        ),
        F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.org/articles/"), k,
            F.lit("?z="), z, F.lit("&id="), k, F.lit("&ref=rss"),
        ),
    )


_URL_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, UNNEST({_variants_sql()}) AS url FROM documents),
canon AS (
  SELECT doc_id, url, {urltools.canonicalize_url_sql("url")} AS canonical_url
  FROM raw)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_forms,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM canon GROUP BY canonical_url
"""


@df_query("web_url_canonicalize", _URL_ORACLE)
def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup inventory: canonicalize every raw URL
    spelling (case/port/fragment/tracking-param/param-order/trailing-
    slash normalization, operators/urltools.py) and group by the
    canonical form. The canonicalization is a pure narrow projection
    (codegen into the scan — zero shuffle cost at 100 TB); the dedup is
    ONE hash aggregation keyed by the canonical string, the first-pass
    URL dedup every crawl pipeline runs before touching content bytes.
    """
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "source")
    raw = docs.select(
        "doc_id", F.explode(_variants_spark()).alias("url")
    )
    canon = raw.select(
        "doc_id", "url", urltools.canonicalize_url(F.col("url")).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.countDistinct("url").cast("bigint").alias("n_forms"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
