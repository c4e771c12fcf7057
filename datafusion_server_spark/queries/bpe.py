"""BPE tokenizer-training queries (operators.bpe).

Oracle = sequential Python replay emitted as VALUES (the clustering
precedent): the operator is integer-count + binary-string-order
deterministic, so the replay reproduces the merge table and every
segmentation exactly while sharing zero Spark code."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import bpe
from datafusion_server_spark.queries import df_query

N_MERGES = 12


def _replay_bpe(sf_dir: str, n_merges: int = N_MERGES):
    from collections import Counter

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        int(i): [w for w in (t or "").split(" ") if w]
        for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    }
    wc = Counter(w for ws in docs.values() for w in ws)
    vocab = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (left, right), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, freq))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return docs, vocab, merges


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_merges_values_oracle(sf_dir: str) -> str:
    _, _, merges = _replay_bpe(sf_dir)
    rows = ", ".join(
        f"({r}, {_q(l)}, {_q(rt)}, {f})" for r, l, rt, f in merges
    )
    return f"""
    SELECT CAST(rank AS BIGINT) AS rank, CAST(left_sym AS VARCHAR) AS "left",
           CAST(right_sym AS VARCHAR) AS "right", CAST(freq AS BIGINT) AS freq
    FROM (VALUES {rows}) AS t(rank, left_sym, right_sym, freq)
    """


@df_query("bpe_train_merges", _bpe_merges_values_oracle)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    _, merges = bpe.bpe_train(docs, "text", N_MERGES)
    return merges


def _bpe_counts_values_oracle(sf_dir: str) -> str:
    docs, vocab, _ = _replay_bpe(sf_dir)
    rows = ", ".join(
        f"({i}, {len(ws)}, {sum(len(vocab[w]) for w in ws)})"
        for i, ws in sorted(docs.items())
        if ws
    )
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_bpe AS BIGINT) AS n_bpe_tokens
    FROM (VALUES {rows}) AS t(doc_id, n_words, n_bpe)
    """


@df_query("bpe_token_counts", _bpe_counts_values_oracle)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    vocab, _ = bpe.bpe_train(docs, "text", N_MERGES)
    return bpe.bpe_token_counts(docs, "text", "doc_id", vocab)
