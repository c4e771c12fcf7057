"""Conversation-operator tests (operators/chat.py): parse robustness,
span-offset exactness against a Python rendering, degenerate shapes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from datafusion_server_spark.operators import chat


def _wire(spark, rows):
    return spark.createDataFrame(rows, "cid long, payload string")


def _conv(turns):
    return json.dumps([{"from": r, "value": v} for r, v in turns])


def test_parse_and_flatten_roundtrip(spark):
    rows = [
        (1, _conv([("user", "hi there"), ("assistant", "hello"), ("user", "bye")])),
        (2, _conv([("user", "solo")])),
    ]
    conv = chat.parse_sharegpt(_wire(spark, rows), "payload", "cid")
    flat = {(r["conv_id"], r["turn_idx"]): r for r in chat.flatten_turns(conv).collect()}
    assert flat[(1, 0)]["role"] == "user" and flat[(1, 0)]["n_words"] == 2
    assert flat[(1, 1)]["content"] == "hello" and flat[(1, 1)]["n_chars"] == 5
    assert (2, 0) in flat and len(flat) == 4


def test_unparseable_json_yields_null_turns_not_a_crash(spark):
    conv = chat.parse_sharegpt(
        _wire(spark, [(1, "{not json"), (2, _conv([("user", "ok")]))]),
        "payload",
        "cid",
    )
    rows = {r["conv_id"]: r["turns"] for r in conv.collect()}
    assert rows[1] is None and rows[2] is not None
    # downstream flatten simply drops the NULL transcript
    assert chat.flatten_turns(conv).count() == 1


def test_loss_mask_spans_match_python_rendering(spark):
    turns = [
        ("user", "what is two plus two"),
        ("assistant", "four"),
        ("user", "and three"),
        ("assistant", "five, obviously"),
    ]
    conv = chat.parse_sharegpt(_wire(spark, [(7, _conv(turns))]), "payload", "cid")
    serialized = "\n".join(f"{r}: {v}" for r, v in turns)
    got = {
        r["turn_idx"]: (r["span_start"], r["span_end"])
        for r in chat.loss_mask_spans(conv).collect()
    }
    for idx, (role, value) in enumerate(turns):
        if role != "assistant":
            continue
        s, e = got[idx]
        assert serialized[s:e] == value, (idx, serialized[s:e])


def test_prompt_response_pairs_prompt_is_prior_context(spark):
    turns = [("user", "q1"), ("assistant", "a1"), ("user", "q2"), ("assistant", "a2")]
    conv = chat.parse_sharegpt(_wire(spark, [(3, _conv(turns))]), "payload", "cid")
    pairs = {r["turn_idx"]: r for r in chat.prompt_response_pairs(conv).collect()}
    import hashlib

    p1 = "user: q1"
    p3 = "user: q1\nassistant: a1\nuser: q2"
    assert pairs[1]["n_context_turns"] == 1
    assert pairs[1]["prompt_md5"] == hashlib.md5(p1.encode()).hexdigest()
    assert pairs[3]["n_context_turns"] == 3
    assert pairs[3]["prompt_md5"] == hashlib.md5(p3.encode()).hexdigest()
    assert pairs[3]["response"] == "a2"


def test_response_echo_rate_counts_known_overlap(spark):
    turns = [
        ("user", "the quick brown fox jumps"),
        # bigrams: {"the quick","quick brown","fox runs"} — 2 of 3 echoed
        ("assistant", "the quick brown fox runs"),
        # full parrot of turn 0: every bigram echoed
        ("assistant", "the quick brown fox jumps"),
        # nothing in common
        ("assistant", "entirely novel answer text"),
    ]
    conv = chat.parse_sharegpt(_wire(spark, [(1, _conv(turns))]), "payload", "cid")
    out = {r["turn_idx"]: r for r in chat.response_echo_rate(conv).collect()}
    assert out[1]["n_resp_grams"] == 4  # the/quick, quick/brown, brown/fox, fox/runs
    assert out[1]["n_echoed"] == 3
    assert out[2]["echo_rate"] == 1.0
    assert out[3]["n_echoed"] == 0 and out[3]["echo_rate"] == 0.0
