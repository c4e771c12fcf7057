"""Text-analysis query inventory: Spark side = operators.text; oracle =
DuckDB SQL with identical exact-count arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark import tables
from datafusion_server_spark.operators import text
from datafusion_server_spark.queries import df_query


def _in_list(langs: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in langs)


@df_query(
    "text_token_stats",
    """
    SELECT CAST(doc_id AS BIGINT) AS id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_words,
           CAST(CEIL(CAST(LENGTH(text) AS DOUBLE) / 4) AS BIGINT) AS n_tokens_est,
           ROUND(CAST(LENGTH(text) - (LEN(STRING_SPLIT(text, ' ')) - 1) AS DOUBLE)
                 / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 6) AS avg_word_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


_QUALITY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, text, STRING_SPLIT(text, ' ') AS words FROM documents),
stats AS (
  SELECT doc_id,
         CAST(LEN(words) AS BIGINT) AS n_words,
         CAST(LEN(LIST_FILTER(words, x -> x IN ({_in_list(text.LANG_STOPWORDS["en"])}))) AS BIGINT) AS n_stop,
         CAST(LEN(LIST_DISTINCT(words)) AS BIGINT) AS n_unique,
         LENGTH(text) >= 100 AND LENGTH(text) <= 20000 AS len_ok
  FROM w)
SELECT CAST(doc_id AS BIGINT) AS id,
       ROUND(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS stopword_ratio,
       ROUND(CAST(n_unique AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS unique_ratio,
       len_ok,
       ROUND(CAST(CASE WHEN CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.01 THEN 0.4 ELSE 0.0 END
             + CASE WHEN CAST(n_unique AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.3 THEN 0.3 ELSE 0.0 END
             + CASE WHEN len_ok THEN 0.3 ELSE 0.0 END AS DOUBLE), 2) AS quality
FROM stats
"""


@df_query("text_quality_score", _QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


_VOTE_EXPRS = ",\n         ".join(
    f"CAST(LEN(LIST_FILTER(words, x -> x IN ({_in_list(stops)}))) AS BIGINT) AS vote_{lang}"
    for lang, stops in text.LANG_STOPWORDS.items()
)
_VOTE_ROWS = " UNION ALL ".join(
    f"SELECT id, '{lang}' AS lang, vote_{lang} AS vote FROM votes"
    for lang in text.LANG_STOPWORDS
)

_LANG_ORACLE = f"""
WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents),
votes AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         {_VOTE_EXPRS}
  FROM w),
unpivoted AS ({_VOTE_ROWS}),
pred AS (
  SELECT id, lang AS predicted_lang
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY vote DESC, lang DESC) AS rn
        FROM unpivoted) t
  WHERE rn = 1)
SELECT v.id, p.predicted_lang,
       {", ".join(f"v.vote_{lang}" for lang in text.LANG_STOPWORDS)}
FROM votes v JOIN pred p ON p.id = v.id
"""


@df_query("text_language_id", _LANG_ORACLE)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


_WINNOW_ORACLE = """
WITH words AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
bg AS (SELECT doc_id,
              UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 1),
                                    i -> w[i] || ' ' || w[i+1])) AS bgram,
              UNNEST(GENERATE_SERIES(1, LEN(w) - 1)) AS i
       FROM words),
hashed AS (SELECT doc_id, i, md5(bgram) AS h FROM bg)
SELECT DISTINCT CAST(doc_id AS BIGINT) AS id,
       MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fingerprint
FROM hashed
"""


@df_query("text_winnowing_fingerprints", _WINNOW_ORACLE)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.winnowing_fingerprints(
        tables.load(spark, sf_dir, "documents"), "text", "doc_id", window=5
    )


@df_query(
    "text_fingerprints",
    """
    SELECT CAST(doc_id AS BIGINT) AS id,
           md5(LOWER(text)) AS fp_full,
           md5(SUBSTR(LOWER(text), 1, 256)) AS fp_prefix,
           CAST(FLOOR(LENGTH(LOWER(text)) / 100) * 100 AS BIGINT) AS len_bucket
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(tables.load(spark, sf_dir, "documents"), "text", "doc_id")
