"""BPE tokenizer-training queries (operators.bpe).

Oracle (round-5 upgrade) = genuine independent DuckDB SQL: the merge
count is fixed, so the training loop is UNROLLED into a CTE chain, and
the greedy left-to-right merge application — the part that looks
un-SQL-able — is a ``LIST_REDUCE`` fold over each word's symbol list
with the accumulator encoded as a CHR(31)-joined string ("last symbol
== left" is exactly ``acc = left OR ends_with(acc, SEP || left)``
because symbols never contain the separator; the fixtures are verified
separator-free). Per iteration: adjacency pair counts weighted by word
frequency, best pair by (freq DESC, left, right) — byte order matches
Python tuple comparison on ASCII — then the fold applies it; an
exhausted pair table leaves segmentations unchanged via LEFT JOIN +
CASE, mirroring the operator's sentinel no-op. Base and per-iteration
vocab CTEs are MATERIALIZED (DuckDB inlines CTEs by default)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import bpe
from datafusion_server_spark.queries import df_query

N_MERGES = 12

_SEP = "CHR(31)"


def _bpe_ctes(n_merges: int = N_MERGES) -> str:
    parts = [
        f"""
tokw AS (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
vocab0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wc,
         ARRAY_TO_STRING(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(word)), i -> word[i]), {_SEP}) AS seg
  FROM tokw WHERE word <> '' GROUP BY word)"""
    ]
    for t in range(n_merges):
        parts.append(
            f"""
pl{t} AS (SELECT v.wc, v.l[i.i] AS a, v.l[i.i + 1] AS b
          FROM (SELECT wc, STRING_SPLIT(seg, {_SEP}) AS l FROM vocab{t}) v,
               UNNEST(GENERATE_SERIES(1, LEN(v.l) - 1)) AS i(i)),
pc{t} AS (SELECT a, b, CAST(SUM(wc) AS BIGINT) AS cnt FROM pl{t} GROUP BY a, b),
best{t} AS (SELECT CAST({t} AS BIGINT) AS rank, a, b, cnt FROM pc{t}
            ORDER BY cnt DESC, a, b LIMIT 1),
vocab{t + 1} AS MATERIALIZED (
  SELECT v.word, v.wc,
         CASE WHEN b.a IS NULL THEN v.seg
              ELSE LIST_REDUCE(STRING_SPLIT(v.seg, {_SEP}),
                     (acc, s) -> CASE WHEN (acc = b.a OR ENDS_WITH(acc, {_SEP} || b.a)) AND s = b.b
                                      THEN acc || s
                                      ELSE acc || {_SEP} || s END)
         END AS seg
  FROM vocab{t} v LEFT JOIN best{t} b ON TRUE)"""
        )
    return ",".join(parts)


_MERGES_UNION = "\nUNION ALL\n".join(f"SELECT * FROM best{t}" for t in range(N_MERGES))

_BPE_MERGES_ORACLE = f"""
WITH {_bpe_ctes()}
SELECT rank, CAST(a AS VARCHAR) AS "left", CAST(b AS VARCHAR) AS "right", cnt AS freq
FROM ({_MERGES_UNION})
"""

_BPE_COUNTS_ORACLE = f"""
WITH {_bpe_ctes()},
dw AS (SELECT CAST(doc_id AS BIGINT) AS id, UNNEST(string_split(text, ' ')) AS word FROM documents),
dwf AS (SELECT id, word FROM dw WHERE word <> '')
SELECT d.id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(LEN(STRING_SPLIT(v.seg, {_SEP}))) AS BIGINT) AS n_bpe_tokens
FROM dwf d JOIN vocab{N_MERGES} v ON v.word = d.word
GROUP BY d.id
"""


@df_query("bpe_train_merges", _BPE_MERGES_ORACLE)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    _, merges = bpe.bpe_train(docs, "text", N_MERGES)
    return merges


@df_query("bpe_token_counts", _BPE_COUNTS_ORACLE)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    vocab, _ = bpe.bpe_train(docs, "text", N_MERGES)
    return bpe.bpe_token_counts(docs, "text", "doc_id", vocab)
