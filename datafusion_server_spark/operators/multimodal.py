"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star extension).

The decode stage is REAL for container-format headers: PNG / GIF / BMP /
JPEG dimensions and WAV channels/sample-rate/duration parse from the
bytes with pure ``struct`` — no media libraries needed. Pixel/sample
DECODING (and the feature-extraction embedding model) would need PIL /
soundfile / a vision encoder, none of which exist in this container;
those fall back to a clearly-marked deterministic synthesis
(``_synthetic_meta``, md5 features) so fixture pipelines stay stable.
Swap the fallback for a real decoder in production; the Spark plan is
unchanged.

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
        StructField("channels", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

_EMPTY_META = {
    "n_bytes": 0,
    "width": None,
    "height": None,
    "format": None,
    "channels": None,
    "sample_rate": None,
    "duration_ms": None,
}


def _synthetic_meta(payload: bytes) -> dict:
    """Deterministic synthesized metadata for UNRECOGNIZED payloads (the
    text fixtures stand in for media bytes). Clearly not a decode — real
    formats never reach this path."""
    n = len(payload)
    return dict(
        _EMPTY_META,
        n_bytes=n,
        width=(n % 1024) + 1,
        height=((n // 7) % 1024) + 1,
        format="fake",
    )


def decode_media(payload: bytes | None) -> dict:
    """Header decode for common container formats, pure ``struct``:

    - PNG:  IHDR width/height (big-endian u32 at offset 16)
    - GIF:  87a/89a logical-screen width/height (LE u16 at offset 6)
    - BMP:  BITMAPINFOHEADER width/height (LE i32 at offsets 18/22)
    - JPEG: first SOFn marker's height/width (BE u16)
    - WAV:  RIFF chunk walk -> fmt (channels, sample rate) + data size
            -> duration

    Unrecognized bytes fall back to ``_synthetic_meta`` (see module
    docstring)."""
    import struct

    if payload is None:
        return dict(_EMPTY_META)
    b = bytes(payload)
    n = len(b)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and n >= 24:
            w, h = struct.unpack_from(">II", b, 16)
            return dict(_EMPTY_META, n_bytes=n, width=w, height=h, format="png")
        if b[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
            w, h = struct.unpack_from("<HH", b, 6)
            return dict(_EMPTY_META, n_bytes=n, width=w, height=h, format="gif")
        if b[:2] == b"BM" and n >= 26:
            w, h = struct.unpack_from("<ii", b, 18)
            return dict(_EMPTY_META, n_bytes=n, width=w, height=abs(h), format="bmp")
        if b[:2] == b"\xff\xd8":
            # walk JPEG markers to the first start-of-frame
            off = 2
            while off + 9 <= n:
                if b[off] != 0xFF:
                    break
                marker = b[off + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    off += 2
                    continue
                seg_len = struct.unpack_from(">H", b, off + 2)[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack_from(">HH", b, off + 5)
                    return dict(_EMPTY_META, n_bytes=n, width=w, height=h, format="jpeg")
                off += 2 + seg_len
            return dict(_EMPTY_META, n_bytes=n, format="jpeg")
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            off, channels, rate, bits, data_size = 12, None, None, None, None
            while off + 8 <= n:
                cid, size = b[off : off + 4], struct.unpack_from("<I", b, off + 4)[0]
                if cid == b"fmt " and off + 24 <= n:
                    channels, rate = struct.unpack_from("<HI", b, off + 10)
                    bits = struct.unpack_from("<H", b, off + 22)[0]
                elif cid == b"data":
                    data_size = size
                off += 8 + size + (size & 1)
            duration = None
            if channels and rate and bits and data_size is not None:
                duration = int(data_size * 8000 / (channels * rate * bits))
            return dict(
                _EMPTY_META,
                n_bytes=n,
                format="wav",
                channels=channels,
                sample_rate=rate,
                duration_ms=duration,
            )
    except struct.error:
        pass
    return _synthetic_meta(b)


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
            meta = pdf["payload"].map(decode_media)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    **{
                        k: meta.map(lambda m, k=k: m[k])
                        for k in (
                            "n_bytes",
                            "width",
                            "height",
                            "format",
                            "channels",
                            "sample_rate",
                            "duration_ms",
                        )
                    },
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
