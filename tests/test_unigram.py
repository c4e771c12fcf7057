"""Independent semantic properties of the unigram-LM tokenizer (on top
of the unrolled-EM oracle parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import unigram


def test_segmentation_concatenation_identity(spark, sf_dir):
    """Every word's pieces concatenate back to the word exactly, and
    the piece count respects the ceil(len/max_piece) lower bound."""
    docs = tables.load(spark, sf_dir, "documents")
    model = unigram.train_unigram(docs, "text")
    rows = unigram.segment_words(docs, "text", model).collect()
    assert rows
    for r in rows:
        assert r["pieces"].replace("|", "") == r["word"]
        assert r["n_pieces"] >= -(-len(r["word"]) // unigram.MAX_PIECE)
        assert r["nll"] > 0.0


def test_compound_splits_at_morpheme_boundary(spark):
    """A rare compound of two dominant units segments at the unit
    boundary — the core unigram-LM behavior BPE shares: frequent
    subunits absorb probability mass and win the Viterbi path."""
    rows = (
        [(i, "rain bow") for i in range(500)]
        + [(1000 + i, "rainbow") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram.train_unigram(docs, "text")
    seg = {
        r["word"]: r["pieces"]
        for r in unigram.segment_words(docs, "text", model).collect()
    }
    assert seg["rain"] == "rain"
    assert seg["bow"] == "bow"
    assert seg["rainbow"] == "rain|bow"


def test_vocab_usage_counts_are_consistent(spark, sf_dir):
    """Used-piece mass equals the total piece slots of the final
    segmentations (each word contributes freq x n_pieces), and unused
    candidates keep strictly lower smoothed logprob than the most-used
    piece."""
    docs = tables.load(spark, sf_dir, "documents")
    model = unigram.train_unigram(docs, "text").cache()
    seg = unigram.segment_words(docs, "text", model)
    lhs = model.agg(F.sum("n_uses")).collect()[0][0]
    rhs = seg.select(
        F.sum(F.col("freq") * F.col("n_pieces")).alias("s")
    ).collect()[0]["s"]
    assert lhs == rhs
    top = model.orderBy(F.desc("n_uses")).first()
    floor = model.filter(F.col("n_uses") == 0).agg(F.max("logprob")).collect()[0][0]
    assert top["logprob"] > floor
