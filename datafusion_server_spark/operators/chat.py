"""Conversation (instruction-tuning) data operators: parse, flatten,
prompt/response pairing, and loss-mask span computation for multi-turn
chat corpora — the SFT-data leg of a training pipeline (ShareGPT-style
transcripts in, per-turn training rows out).

Spark-first shapes: conversations are rows holding an
``array<struct<role, content>>`` column; parsing from the JSON wire
format is ONE ``from_json`` (codegen, no Python); every per-turn
derivation is a narrow explode plus conversation-keyed windows
(``partitionBy(conv_id)`` — bounded by the turn count of one
conversation, never corpus-wide). No UDFs anywhere.

Scale notes (100 TB of transcripts): conversations are independent, so
every operator here is embarrassingly parallel over conv_id; the only
shuffle is the one explode-groupBy/window keyed by conv_id, and AQE
skew-split handles the pathological mega-conversation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ShareGPT wire schema: [{"from": "...", "value": "..."}, ...]
SHAREGPT_SCHEMA = "array<struct<from:string,value:string>>"


def parse_sharegpt(df: DataFrame, json_col: str, id_col: str) -> DataFrame:
    """Parse ShareGPT-style JSON transcripts into the canonical
    (conv_id, turns array<struct<role, content>>) shape with ONE
    codegen ``from_json``. Unparseable rows yield NULL turns (visible
    downstream, never dropped silently)."""
    parsed = F.from_json(F.col(json_col), SHAREGPT_SCHEMA)
    return df.select(
        F.col(id_col).alias("conv_id"),
        F.transform(
            parsed,
            lambda t: F.struct(
                t["from"].alias("role"), t["value"].alias("content")
            ),
        ).alias("turns"),
    )


def flatten_turns(conv: DataFrame) -> DataFrame:
    """One row per turn: (conv_id, turn_idx 0-based, role, content,
    n_words, n_chars). A narrow posexplode — no shuffle."""
    return conv.select(
        "conv_id", F.posexplode("turns").alias("turn_idx", "t")
    ).select(
        "conv_id",
        F.col("turn_idx").cast("bigint").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.content").alias("content"),
        F.size(F.filter(F.split("t.content", " "), lambda w: w != ""))
        .cast("bigint")
        .alias("n_words"),
        F.length("t.content").cast("bigint").alias("n_chars"),
    )


def prompt_response_pairs(
    conv: DataFrame, assistant_role: str = "assistant"
) -> DataFrame:
    """One training example per ASSISTANT turn: the prompt is every
    prior turn rendered ``{role}: {content}`` and joined with newlines
    (the standard SFT serialization); the response is the assistant
    turn's content. Output: (conv_id, turn_idx, n_context_turns,
    prompt_chars, prompt_md5, response) — the prompt travels as a
    digest + length so rows stay narrow (the reconstruction is
    deterministic from the transcript).

    Plan: one posexplode + one conv-keyed window (collect_list of the
    rendered prior turns — bounded by the conversation's own length)."""
    flat = conv.select(
        "conv_id", F.posexplode("turns").alias("turn_idx", "t")
    ).select(
        "conv_id",
        F.col("turn_idx").cast("bigint").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.content").alias("content"),
        F.concat(F.col("t.role"), F.lit(": "), F.col("t.content")).alias(
            "__rendered"
        ),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_prompt = flat.withColumn(
        "__prompt", F.array_join(F.collect_list("__rendered").over(w), "\n")
    ).withColumn("__nctx", F.count(F.lit(1)).over(w).cast("bigint"))
    return with_prompt.filter(F.col("role") == assistant_role).select(
        "conv_id",
        "turn_idx",
        F.col("__nctx").alias("n_context_turns"),
        F.length("__prompt").cast("bigint").alias("prompt_chars"),
        F.md5("__prompt").alias("prompt_md5"),
        F.col("content").alias("response"),
    )


def loss_mask_spans(
    conv: DataFrame, assistant_role: str = "assistant"
) -> DataFrame:
    """Character spans of the ASSISTANT content within the fully
    serialized conversation (turns rendered ``{role}: {content}``
    joined by newlines) — the loss-mask boundaries an SFT tokenizer
    applies so the model trains only on assistant tokens. Output:
    (conv_id, turn_idx, span_start, span_end) 0-based, end exclusive.

    Plan: one posexplode + one conv-keyed cumulative window over the
    rendered lengths."""
    flat = conv.select(
        "conv_id", F.posexplode("turns").alias("turn_idx", "t")
    ).select(
        "conv_id",
        F.col("turn_idx").cast("bigint").alias("turn_idx"),
        F.col("t.role").alias("role"),
        (F.length("t.role") + F.lit(2)).cast("bigint").alias("__head"),
        F.length("t.content").cast("bigint").alias("__clen"),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # offset of this turn's rendered text = sum of prior rendered
    # lengths + one newline separator per prior turn
    prior = F.coalesce(
        F.sum(F.col("__head") + F.col("__clen")).over(w), F.lit(0).cast("bigint")
    ) + F.col("turn_idx")
    return (
        flat.withColumn("__off", prior)
        .filter(F.col("role") == assistant_role)
        .select(
            "conv_id",
            "turn_idx",
            (F.col("__off") + F.col("__head")).cast("bigint").alias("span_start"),
            (F.col("__off") + F.col("__head") + F.col("__clen"))
            .cast("bigint")
            .alias("span_end"),
        )
    )


def response_echo_rate(
    conv: DataFrame, assistant_role: str = "assistant", n: int = 2
) -> DataFrame:
    """Echo detection for SFT data: the fraction of each assistant
    response's distinct word n-grams already present in the PRIOR
    context turns — responses that mostly parrot the prompt are
    low-value training examples (the standard instruction-data quality
    gate). Output: (conv_id, turn_idx, n_resp_grams, n_echoed,
    echo_rate round 6).

    Plan: one posexplode to turns, one n-gram explode, one
    (conv, gram)-keyed self-join restricted to earlier turns, one
    distinct + count — all keyed by conversation, fan-out bounded by a
    single conversation's size."""
    flat = conv.select(
        "conv_id", F.posexplode("turns").alias("turn_idx", "t")
    ).select(
        "conv_id",
        F.col("turn_idx").cast("bigint").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.content").alias("content"),
    )
    words = F.filter(F.split("content", " "), lambda w: w != "")
    m = F.greatest(F.size(words) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(words, j + 1, m) for j in range(n)])
    grams = flat.select(
        "conv_id",
        "turn_idx",
        "role",
        F.explode(
            F.array_distinct(
                F.transform(
                    zipped,
                    lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]),
                )
            )
        ).alias("gram"),
    )
    resp = grams.filter(F.col("role") == assistant_role).select(
        "conv_id", F.col("turn_idx").alias("rt"), "gram"
    )
    # distinct column names on the context side — resp and ctx share a
    # lineage, and Spark's self-join resolution needs the disambiguation
    ctx = grams.select(
        F.col("conv_id").alias("c_conv"),
        F.col("turn_idx").alias("ct"),
        F.col("gram").alias("cgram"),
    )
    echoed = (
        resp.join(
            ctx,
            (F.col("conv_id") == F.col("c_conv"))
            & (F.col("gram") == F.col("cgram"))
            & (F.col("ct") < F.col("rt")),
            "left_semi",
        )
        .groupBy("conv_id", "rt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_echoed"))
    )
    totals = resp.groupBy("conv_id", "rt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_resp_grams")
    )
    return (
        totals.join(echoed, ["conv_id", "rt"], "left")
        .select(
            "conv_id",
            F.col("rt").alias("turn_idx"),
            "n_resp_grams",
            F.coalesce("n_echoed", F.lit(0)).cast("bigint").alias("n_echoed"),
            F.round(
                F.coalesce("n_echoed", F.lit(0)).cast("double")
                / F.col("n_resp_grams").cast("double"),
                6,
            ).alias("echo_rate"),
        )
    )
