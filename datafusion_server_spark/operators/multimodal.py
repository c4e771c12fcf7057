"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star extension).

The Spark-side design is real — schema, Arrow-batched ``mapInPandas``
decode stage, partition-friendly layout. The actual media decode is
STUBBED (`decode_stub`) because no image/audio libraries exist in this
container: it derives deterministic fake metadata from the bytes, so
plumbing tests are stable. Swap ``decode_stub`` for a real decoder (PIL /
ffmpeg) in production; the Spark plan is unchanged.

At 100 TB: binary payloads stay columnar in parquet, the decode stage is
``mapInPandas`` (Arrow batches, no per-row Python overhead), and metadata
extraction is a narrow transformation — no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("format", StringType(), True),
    ]
)


def decode_stub(payload: bytes | None) -> dict:
    """Deterministic fake decoder. A real implementation would call PIL /
    soundfile / pyav here; the container has none of them (see module
    docstring), so metadata derives from the byte content itself."""
    if payload is None:
        return {"n_bytes": 0, "width": None, "height": None, "format": None}
    n = len(payload)
    return {
        "n_bytes": n,
        "width": (n % 1024) + 1,
        "height": ((n // 7) % 1024) + 1,
        "format": "fake",
    }


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from a text fixture: payload = utf8 bytes.
    Stands in for reading real image/audio parquet at the same shape."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over the binary column."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(decode_stub)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": meta.map(lambda m: m["n_bytes"]),
                    "width": meta.map(lambda m: m["width"]),
                    "height": meta.map(lambda m: m["height"]),
                    "format": meta.map(lambda m: m["format"]),
                }
            )
            yield out

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stage: payload bytes -> embedding vector via an
    Arrow-batched mapInPandas stage. The embedding model is STUBBED with a
    deterministic md5-derived vector (see module docstring) — swap for a
    real vision/audio encoder; the Spark plumbing (batching, schema,
    downstream similarity-search compatibility) is identical."""
    import hashlib

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                digest = hashlib.md5(bytes(payload)).digest()
                feats.append(
                    [(digest[2 * i] * 256 + digest[2 * i + 1]) / 65535.0 - 0.5 for i in range(FEATURE_DIM)]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling plumbing: emit (media_id, frame_no) rows per payload
    — the real version would emit decoded frames. Pure column math, no
    Python."""
    n_frames = (F.length(F.col("payload")) / every_n_bytes + 1).cast("int")
    return media.select(
        "media_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no")
    )
