"""Conversation (SFT/instruction-data) queries over synthesized
multi-turn transcripts (operators/chat.py) with exact DuckDB oracles.

Fixture: each document becomes one conversation — its words split into
up to 6 turns of 8 words, roles alternating user/assistant — built
IDENTICALLY on both engines (the html-wrapper precedent), so the oracle
independently re-derives every flattened turn, prompt digest, and
loss-mask offset from the raw text. The Spark side additionally
round-trips the transcript through the ShareGPT JSON wire format
(to_json -> parse_sharegpt's from_json), so the parse path is verified
against content that never went through JSON on the oracle side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import chat
from datafusion_server_spark.queries import df_query

_TURN_WORDS = 8
_MAX_TURNS = 6


def _conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (conv_id, turns) via the ShareGPT JSON round-trip.

    r14 (optimization, guide §1.2): one selectExpr SQL string replaces
    the nested-lambda Column chain (454 -> ~10 py4j round-trips), and
    the turn content is computed DIRECTLY per k — the old Column form
    could only bind the inner lambda via
    ``element_at(transform(seq, turn), k+1)``, which materialized all
    ``_MAX_TURNS`` turns once per outer element (36 slice evaluations
    per row instead of 6). Values identical (element_at(transform(s, f),
    k+1) == f(s[k]) for s = 0.._MAX_TURNS-1); oracle unchanged."""
    docs = tables.load(spark, sf_dir, "documents")
    turns = (
        f"FILTER(TRANSFORM(SEQUENCE(0, {_MAX_TURNS - 1}), k -> STRUCT("
        "CASE WHEN k % 2 = 0 THEN 'user' ELSE 'assistant' END AS `from`, "
        "CONCAT_WS(' ', SLICE(FILTER(SPLIT(text, ' '), w -> w != ''), "
        f"k * {_TURN_WORDS} + 1, {_TURN_WORDS})) AS value)), "
        "t -> t.value != '')"
    )
    wire = docs.selectExpr("doc_id AS cid", f"TO_JSON({turns}) AS payload")
    return chat.parse_sharegpt(wire, "payload", "cid")


# shared oracle CTE: per-doc turns re-derived straight from text
_TURNS_CTE = f"""
w AS (SELECT CAST(doc_id AS BIGINT) AS conv_id,
             LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS words
      FROM documents),
turns AS (
  SELECT conv_id,
         CAST(t.k AS BIGINT) AS k,
         CASE WHEN t.k % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         ARRAY_TO_STRING(words[t.k * {_TURN_WORDS} + 1 : (t.k + 1) * {_TURN_WORDS}], ' ') AS content
  FROM w, UNNEST(range(0, {_MAX_TURNS})) AS t(k)
  WHERE LEN(words) > t.k * {_TURN_WORDS}),
idx AS (
  SELECT conv_id, role, content,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY k) - 1 AS BIGINT) AS turn_idx
  FROM turns)
"""

_FLATTEN_ORACLE = f"""
WITH {_TURNS_CTE}
SELECT conv_id, turn_idx, role,
       CAST(LEN(LIST_FILTER(STRING_SPLIT(content, ' '), x -> x <> '')) AS BIGINT) AS n_words,
       CAST(LENGTH(content) AS BIGINT) AS n_chars,
       md5(content) AS content_md5
FROM idx
"""


@df_query("chat_flatten_turns", _FLATTEN_ORACLE)
def chat_flatten_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn flattening of the transcript corpus (one narrow
    posexplode) — the first step of every SFT data pipeline."""
    flat = chat.flatten_turns(_conversations(spark, sf_dir))
    return flat.select(
        "conv_id",
        "turn_idx",
        "role",
        "n_words",
        "n_chars",
        F.md5("content").alias("content_md5"),
    )


_PAIRS_ORACLE = f"""
WITH {_TURNS_CTE},
rend AS (
  SELECT conv_id, turn_idx, role, content,
         role || ': ' || content AS rendered
  FROM idx),
ctx AS (
  SELECT conv_id, turn_idx, role, content,
         COALESCE(ARRAY_TO_STRING(
             LIST(rendered) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CHR(10)), '') AS prompt,
         CAST(COUNT(*) OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS n_context_turns
  FROM rend)
SELECT conv_id, turn_idx, n_context_turns,
       CAST(LENGTH(prompt) AS BIGINT) AS prompt_chars,
       md5(prompt) AS prompt_md5,
       md5(content) AS response_md5
FROM ctx WHERE role = 'assistant'
"""


@df_query("chat_prompt_response_pairs", _PAIRS_ORACLE)
def chat_prompt_response_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One training example per assistant turn: rendered prior-turn
    prompt (digest + length — rows stay narrow) and the response."""
    pairs = chat.prompt_response_pairs(_conversations(spark, sf_dir))
    return pairs.select(
        "conv_id",
        "turn_idx",
        "n_context_turns",
        "prompt_chars",
        "prompt_md5",
        F.md5("response").alias("response_md5"),
    )


_MASK_ORACLE = f"""
WITH {_TURNS_CTE},
lens AS (
  SELECT conv_id, turn_idx, role,
         CAST(LENGTH(role) + 2 AS BIGINT) AS head,
         CAST(LENGTH(content) AS BIGINT) AS clen
  FROM idx),
off AS (
  SELECT conv_id, turn_idx, role, head, clen,
         COALESCE(SUM(head + clen) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) + turn_idx AS o
  FROM lens)
SELECT conv_id, turn_idx,
       CAST(o + head AS BIGINT) AS span_start,
       CAST(o + head + clen AS BIGINT) AS span_end
FROM off WHERE role = 'assistant'
"""


@df_query("chat_loss_mask_spans", _MASK_ORACLE)
def chat_loss_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask character spans of the assistant turns within the
    serialized conversation — the boundaries an SFT tokenizer trains
    on (assistant tokens only)."""
    return chat.loss_mask_spans(_conversations(spark, sf_dir))


# echo detection: distinct response bigrams already present in prior
# context turns — the parroting-response SFT quality gate.
_ECHO_N = 2

_ECHO_ORACLE = f"""
WITH {_TURNS_CTE},
tw AS (
  SELECT conv_id, turn_idx, role,
         LIST_FILTER(STRING_SPLIT(content, ' '), x -> x <> '') AS w
  FROM idx),
grams AS (
  SELECT DISTINCT conv_id, turn_idx, role,
         ARRAY_TO_STRING(w[t.p : t.p + {_ECHO_N - 1}], ' ') AS gram
  FROM tw, UNNEST(range(1, GREATEST(LEN(w) - {_ECHO_N - 1}, 0) + 1)) AS t(p)),
resp AS (SELECT conv_id, turn_idx, gram FROM grams WHERE role = 'assistant'),
flags AS (
  SELECT r.conv_id, r.turn_idx,
         CASE WHEN EXISTS (SELECT 1 FROM grams c
                           WHERE c.conv_id = r.conv_id AND c.gram = r.gram
                             AND c.turn_idx < r.turn_idx)
              THEN 1 ELSE 0 END AS hit
  FROM resp r)
SELECT conv_id, turn_idx,
       CAST(COUNT(*) AS BIGINT) AS n_resp_grams,
       CAST(SUM(hit) AS BIGINT) AS n_echoed,
       ROUND(CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS echo_rate
FROM flags GROUP BY conv_id, turn_idx
"""


@df_query("chat_response_echo_rate", _ECHO_ORACLE)
def chat_response_echo_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-response echo rate: the share of a response's distinct
    bigrams already present in earlier turns — high values flag
    parroting responses before SFT."""
    return chat.response_echo_rate(_conversations(spark, sf_dir), n=_ECHO_N)
