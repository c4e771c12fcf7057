"""Unigram-LM tokenizer queries (operators.unigram).

Oracle = the WHOLE EM loop unrolled into DuckDB CTEs: candidate
enumeration, add-one log-probs, per-position Viterbi DP tables with
(score DESC, split ASC) argmax, backpointer walk, usage re-estimation —
iteration by iteration, position by position. The same
fixed-iteration-count contract that unrolls k-means/GD/PageRank/BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark import tables
from datafusion_server_spark.operators import unigram
from datafusion_server_spark.operators.unigram import EM_ITERS, LMAX, MAX_PIECE
from datafusion_server_spark.queries import df_query, rrepr


def _lp(cnt: str, tot: str, v: str) -> str:
    return rrepr(
        f"LN(CAST(({cnt}) + 1 AS DOUBLE)) - LN(CAST(({tot}) + ({v}) AS DOUBLE))", 8
    )


_BASE = f"""
uw AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq, CAST(LEN(word) AS INT) AS wl
  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' AND LEN(word) <= {LMAX} GROUP BY word),
cand AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c FROM (
    SELECT UNNEST(flatten(list_transform(generate_series(1, wl),
             s -> list_transform(generate_series(1, LEAST({MAX_PIECE}, wl - s + 1)),
                    l -> SUBSTR(word, s, l))))) AS piece,
           freq
    FROM uw) GROUP BY piece),
cst AS (SELECT CAST(SUM(c) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v FROM cand),
ulp0 AS MATERIALIZED (SELECT piece, {_lp('c', 's.t', 's.v')} AS lp FROM cand, cst s)
"""


def _viterbi_ctes(tag: str, lp_table: str) -> str:
    """One Viterbi pass: ud{tag}_0..ud{tag}_{LMAX} DP tables + the
    udall{tag} backpointer union + the ur{tag}_k walk-back chain."""
    parts = [
        f"ud{tag}_0 AS (SELECT word, freq, wl, CAST(0.0 AS DOUBLE) AS score FROM uw)"
    ]
    for j in range(1, LMAX + 1):
        branches = []
        for i in range(max(0, j - MAX_PIECE), j):
            sub = f"SUBSTR(d.word, {i + 1}, {j - i})"
            branches.append(
                f"""SELECT d.word, d.freq, d.wl, d.score + p.lp AS score,
       {i} AS bi, {sub} AS piece
FROM ud{tag}_{i} d JOIN {lp_table} p ON p.piece = {sub}
WHERE d.wl >= {j}"""
            )
        union = "\nUNION ALL\n".join(branches)
        parts.append(
            f"""ud{tag}_{j} AS (
  SELECT word, freq, wl, score, bi, piece FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY word
                                 ORDER BY score DESC, bi ASC) AS rn
    FROM ({union})) WHERE rn = 1)"""
        )
    dall = " UNION ALL ".join(
        f"SELECT {j} AS j, word, freq, wl, score, bi, piece FROM ud{tag}_{j}"
        for j in range(1, LMAX + 1)
    )
    parts.append(f"udall{tag} AS MATERIALIZED ({dall})")
    parts.append(f"ur{tag}_0 AS (SELECT word, freq, wl AS pos FROM uw)")
    for k in range(1, LMAX + 1):
        parts.append(
            f"""ur{tag}_{k} AS (
  SELECT r.word, r.freq, {k} AS k, d.piece, d.bi AS pos
  FROM ur{tag}_{k - 1} r JOIN udall{tag} d ON d.word = r.word AND d.j = r.pos
  WHERE r.pos > 0)"""
        )
    return ",\n".join(parts)


def _em_ctes(iters: int = EM_ITERS) -> tuple[str, str]:
    """Returns (cte_text, final_lp_table)."""
    parts = [_BASE.strip()]
    prev = "ulp0"
    for t in range(1, iters + 1):
        parts.append(_viterbi_ctes(f"e{t}", prev))
        emits = " UNION ALL ".join(
            f"SELECT piece, freq FROM ure{t}_{k}" for k in range(1, LMAX + 1)
        )
        parts.append(
            f"""uusage{t} AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS u
  FROM ({emits}) GROUP BY piece),
ujoin{t} AS (SELECT c.piece, CAST(COALESCE(u.u, 0) AS BIGINT) AS u
  FROM cand c LEFT JOIN uusage{t} u ON u.piece = c.piece),
ust{t} AS (SELECT CAST(SUM(u) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v FROM ujoin{t}),
ulp{t} AS MATERIALIZED (SELECT j.piece, j.u, {_lp('j.u', 's.t', 's.v')} AS lp
  FROM ujoin{t} j, ust{t} s)"""
        )
        prev = f"ulp{t}"
    return ",\n".join(parts), prev


_EM_CTES, _FINAL_LP = _em_ctes()

_VOCAB_ORACLE = f"""
WITH {_EM_CTES}
SELECT piece, CAST(u AS BIGINT) AS n_uses, CAST(lp AS DOUBLE) AS logprob
FROM {_FINAL_LP}
"""


@df_query("unigram_vocab_em", _VOCAB_ORACLE)
def unigram_vocab_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (SentencePiece-style EM): the full
    candidate table with final Viterbi usage counts and add-one
    log-probs after EM_ITERS iterations."""
    docs = tables.load(spark, sf_dir, "documents")
    return unigram.train_unigram(docs, "text")


_SEG_CTES = _EM_CTES + ",\n" + _viterbi_ctes("f", _FINAL_LP)
_SEG_EMITS = " UNION ALL ".join(
    f"SELECT word, freq, k, piece FROM urf_{k}" for k in range(1, LMAX + 1)
)

_SEGMENT_ORACLE = f"""
WITH {_SEG_CTES},
uasm AS (
  SELECT word, freq, CAST(COUNT(*) AS BIGINT) AS n_pieces,
         STRING_AGG(piece, '|' ORDER BY k DESC) AS pieces
  FROM ({_SEG_EMITS}) GROUP BY word, freq),
unll AS (SELECT word, {rrepr("-(score)", 6)} AS nll FROM udallf WHERE j = wl)
SELECT a.word, CAST(a.freq AS BIGINT) AS freq, a.n_pieces, a.pieces,
       CAST(n.nll AS DOUBLE) AS nll
FROM uasm a JOIN unll n ON n.word = a.word
"""


@df_query("unigram_segment_words", _SEGMENT_ORACLE)
def unigram_segment_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi segmentation of every training word under the EM-trained
    unigram LM: reading-order piece sequence + negative log likelihood."""
    docs = tables.load(spark, sf_dir, "documents")
    model = unigram.train_unigram(docs, "text")
    return unigram.segment_words(docs, "text", model)


# per-document subword token accounting under the trained unigram LM:
# join the word-level segmentation table back onto the corpus token
# stream — the tokenizer-aware length/cost statistics a training
# pipeline batches and bills by. Adds ONE corpus-touching explode and
# one broadcast join beyond the (vocab-bounded) trainer.
_DOC_TOKENS_ORACLE = f"""
WITH {_SEG_CTES},
uasm AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_pieces
  FROM ({_SEG_EMITS}) GROUP BY word, freq),
toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
toks2 AS (SELECT doc_id, word FROM toks WHERE word <> '' AND LEN(word) <= {LMAX})
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(a.n_pieces) AS BIGINT) AS n_subwords,
       {rrepr("CAST(SUM(a.n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 6)} AS fertility
FROM toks2 t JOIN uasm a ON a.word = t.word
GROUP BY t.doc_id
"""


@df_query("unigram_doc_tokens", _DOC_TOKENS_ORACLE)
def unigram_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware document accounting: per-doc word count, subword
    count under the EM-trained unigram model, and fertility
    (subwords/word) — the number a data pipeline uses to budget
    sequence packing and training cost."""
    from pyspark.sql import functions as F

    docs = tables.load(spark, sf_dir, "documents")
    model = unigram.train_unigram(docs, "text")
    seg = unigram.segment_words(docs, "text", model).select("word", "n_pieces")
    toks = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= LMAX))
    )
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_subwords"),
            F.round(
                F.sum("n_pieces").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("fertility"),
        )
    )
