"""Distributed BPE merge training over a document corpus.

Beyond-reference operator: learn byte-pair-encoding merges (Sennrich et
al. 2016) with DataFrame ops only — the tokenizer-training step of an
LLM data pipeline, here character-level within whitespace words.

The scale insight is the classic one: train on the frequency-WEIGHTED
VOCABULARY, not the token stream. One corpus pass builds (word, count);
every Lloyd-style merge iteration after that touches only the
vocab-sized table — pair counting, best-pair selection, and merge
application all run on |vocab| rows regardless of corpus size. At
100 TB the vocab is millions of rows (still cluster-scale, still tiny
vs the corpus), and the final token counts come from ONE broadcast join
of the corpus word stream against the trained vocab segmentation.

Per iteration:
- pair counts: in-row zip of each word's symbol array with its tail,
  exploded, summed with the word count as weight (map-side combined,
  output bounded by the live pair alphabet);
- best pair: total order (freq DESC, left ASC, right ASC) -> ONE row,
  broadcast back into the plan (never collected); a sentinel row with
  freq=-1 keeps the pipeline total when pairs are exhausted — the
  sentinel's empty `left` can never match a symbol, so application
  becomes a no-op and exhausted ranks are filtered from the output;
- merge application: a left-to-right non-overlapping fold over each
  symbol array (aggregate with array accumulator) — replaces every
  (left, right) adjacency exactly as sequential BPE does;
- the vocab localCheckpoints per iteration (vocab-sized, not
  corpus-sized) to stop N-deep lineage nesting.

Determinism: integer counts and binary string ordering only — no float
math anywhere — so a sequential Python replay reproduces the merge
table and every segmentation exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_server_spark.operators.scale import ensure_fanout_parallelism


def _apply_merge(syms: Column, left: Column, right: Column) -> Column:
    """Left-to-right non-overlapping replacement of each (left, right)
    adjacency with the concatenated symbol. ``F.get`` (0-based, null
    out-of-bounds) keeps the fold ANSI-safe on the empty accumulator."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.get(acc, F.size(acc) - 1) == left)
            & (s == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(left, right))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wc, syms): frequency-weighted vocabulary with character
    symbol arrays — the one corpus pass."""
    words = ensure_fanout_parallelism(
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
        .select("word", "wc", F.split(F.col("word"), "").alias("syms"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = vocab.filter(F.size("syms") >= 2).select(
        "wc",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("wc").cast("bigint").alias("freq")
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (vocab, merges):
    vocab (word, wc, syms) holds the final segmentation of every corpus
    word; merges (rank, left, right, freq) the learned table in merge
    order (exhausted ranks omitted)."""
    spark = df.sparkSession
    vocab = word_vocab(df, text_col).localCheckpoint()
    sentinel = spark.createDataFrame(
        [("", "", -1)], "left string, right string, freq long"
    )
    merge_rows = []
    for rank in range(n_merges):
        best = (
            _pair_counts(vocab)
            .unionByName(sentinel)
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .localCheckpoint()
        )
        merge_rows.append(best.withColumn("rank", F.lit(rank).cast("bigint")))
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                "word",
                "wc",
                _apply_merge(
                    F.col("syms"), F.col("left"), F.col("right")
                ).alias("syms"),
            )
            .localCheckpoint()
        )
    merges = merge_rows[0]
    for m in merge_rows[1:]:
        merges = merges.unionByName(m)
    return vocab, merges.filter(F.col("freq") > 0).select(
        "rank", "left", "right", "freq"
    )


def bpe_token_counts(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): tokenize by ONE broadcast join of
    the corpus word stream against the trained vocab's segmentation —
    applying N merges per word again would be N folds; the vocab already
    holds the result. Unseen words fall back to character count."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")
    seg = vocab.select("word", F.size("syms").cast("bigint").alias("__n_sub"))
    return (
        words.join(F.broadcast(seg), "word", "left")
        .select(
            "id",
            F.coalesce(F.col("__n_sub"), F.length("word").cast("bigint")).alias(
                "__n"
            ),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__n").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def bpe_apply_merges(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize NEW documents with a FROZEN merge table — the inference
    side of the trainer (train once on the corpus, apply to every later
    batch). Merges apply in rank order, each as one left-to-right fold
    over the word's symbol array; unseen words segment down to whatever
    the merge table reaches (character level at worst) — standard BPE
    behavior. Output: (id, word_idx, word, syms array<string>,
    n_sub BIGINT).

    The merge list is a driver-side literal (the trained table is
    n_merges rows — collect it or pass it from config); the application
    itself is a narrow map: |merges| chained folds inside one projection,
    no shuffle, no joins."""
    syms = F.split(F.col("word"), "")
    for left, right in merges:
        syms = _apply_merge(syms, F.lit(left), F.lit(right))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("word_idx", "word"),
        )
        .filter(F.col("word") != "")
        .select(
            "id",
            F.col("word_idx").cast("bigint").alias("word_idx"),
            "word",
            syms.alias("syms"),
        )
        .withColumn("n_sub", F.size("syms").cast("bigint"))
    )
