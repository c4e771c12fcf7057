"""Extension queries that are not (or not sensibly) SQL-expressible —
registered without an oracle; the driver records a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import multimodal
from datafusion_server_spark.queries import df_query, sql_query


def _multimodal_values_oracle(sf_dir: str) -> str:
    """VALUES oracle for the decode pipeline: the payload synthesis and
    binary decode are deterministic pure-Python functions of each
    document's text, so the expected aggregate is computable DRIVER-SIDE
    (sequentially, no Spark) and emitted as a DuckDB VALUES table. This
    verifies the distributed mapInPandas plumbing end-to-end: partitioned
    Arrow-batched execution must reproduce the sequential reference
    exactly — rows, schema, and values."""
    import pyarrow.parquet as pq

    from datafusion_server_spark.operators.multimodal import (
        _make_bmp,
        _make_wav,
        decode_media,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    groups: dict[tuple, dict] = {}
    for mid, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        seed = (text or "").encode("utf-8")
        kind = int(mid) % 3
        if kind == 0:
            payload, mt = _make_bmp(seed), "image/bmp"
        elif kind == 1:
            payload, mt = _make_wav(seed), "audio/wav"
        else:
            payload, mt = seed, "text/plain"
        meta = decode_media(payload)
        g = groups.setdefault(
            (mt, meta["format"]),
            {"n": 0, "tb": 0, "w": [], "h": [], "vm": None, "vr": None},
        )
        g["n"] += 1
        g["tb"] += meta["n_bytes"]
        if meta["width"] is not None:
            g["w"].append(meta["width"])
        if meta["height"] is not None:
            g["h"].append(meta["height"])
        if meta["value_mean"] is not None:
            g["vm"] = (g["vm"] or 0) + int(round(meta["value_mean"] * 1e6))
            g["vr"] = (g["vr"] or 0) + int(round(meta["value_rms"] * 1e6))

    def lit(v) -> str:
        return "NULL" if v is None else str(v)

    rows = ", ".join(
        f"('{mt}', '{fmt}', {g['n']}, {g['tb']}, "
        f"{lit(min(g['w']) if g['w'] else None)}, "
        f"{lit(max(g['h']) if g['h'] else None)}, {lit(g['vm'])}, {lit(g['vr'])})"
        for (mt, fmt), g in sorted(groups.items())
    )
    return f"""
    SELECT media_type, format,
           CAST(n AS BIGINT) AS n,
           CAST(total_bytes AS BIGINT) AS total_bytes,
           CAST(min_width AS BIGINT) AS min_width,
           CAST(max_height AS BIGINT) AS max_height,
           CAST(sum_value_mean_micro AS BIGINT) AS sum_value_mean_micro,
           CAST(sum_value_rms_micro AS BIGINT) AS sum_value_rms_micro
    FROM (VALUES {rows}) AS t(media_type, format, n, total_bytes, min_width,
                              max_height, sum_value_mean_micro, sum_value_rms_micro)
    """


@df_query("multimodal_decode_pipeline", _multimodal_values_oracle)
def multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline with REAL content decode for the
    uncompressed formats: documents synthesize into genuine BMP/WAV/text
    payloads (pixel/sample values from the text bytes), mapInPandas
    decodes headers AND content — value_mean/value_rms for bmp/wav come
    from actual pixel/sample data, not a stub.

    The content-stat aggregates are EXACT-INTEGER micro-unit sums
    (value_mean is 6-dp by construction, so ``round(v*1e6)`` is lossless)
    — order-independent under any partitioning, hence bit-stable against
    the driver's value hash and the sequential VALUES oracle."""
    docs = tables.load(spark, sf_dir, "documents")
    media = multimodal.synthesize_media_payloads(docs, "text", "doc_id")
    decoded = multimodal.decode_metadata(media)
    return decoded.groupBy("media_type", "format").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.min("width").cast("bigint").alias("min_width"),
        F.max("height").cast("bigint").alias("max_height"),
        F.sum(F.round(F.col("value_mean") * 1e6).cast("bigint")).alias(
            "sum_value_mean_micro"
        ),
        F.sum(F.round(F.col("value_rms") * 1e6).cast("bigint")).alias(
            "sum_value_rms_micro"
        ),
    )


def _feature_search_values_oracle(sf_dir: str) -> str:
    """VALUES oracle for the feature-search pipeline (hash-green since
    late round 4 — previously the last rows-only row besides the HLL
    sketch): payload synthesis, the md5 feature stub, and the cosine
    top-k arithmetic are all deterministic pure functions of the
    documents fixture, so the full result is replayable driver-side.
    Rounding replicates Spark's Round expression exactly
    (BigDecimal.valueOf(double) == Decimal(repr(x)), HALF_UP), and each
    vector element is quantized through float32 first — FEATURE_SCHEMA
    stores ArrayType(FloatType()), and ~0.8% of random pairs round to a
    DIFFERENT 6-dp cosine if the replay keeps float64 precision. NULL
    text yields a NULL payload/feature in the pipeline; both sides drop
    those media rows (undecodable-media hygiene)."""
    import hashlib
    import math
    import struct
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    from datafusion_server_spark.operators.multimodal import FEATURE_DIM

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def f32(x: float) -> float:
        return struct.unpack("f", struct.pack("f", x))[0]

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    vecs: dict[int, list[float]] = {}
    for mid, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        if text is None:
            continue  # NULL payload -> NULL feature -> dropped
        digest = hashlib.md5(text.encode("utf-8")).digest()
        vecs[int(mid)] = [
            f32((digest[2 * i] * 256 + digest[2 * i + 1]) / 65535.0 - 0.5)
            for i in range(FEATURE_DIM)
        ]
    norms = {
        mid: math.sqrt(sum(r0(x * x * 1e12) for x in v) / 1e12)
        for mid, v in vecs.items()
    }
    out = []
    for q in sorted(m for m in vecs if m < 5):
        scored = []
        for c, cv in vecs.items():
            if c == q:
                continue
            dot = sum(r0(a * b * 1e12) for a, b in zip(vecs[q], cv))
            scored.append((r6((dot / 1e12) / (norms[q] * norms[c])), c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, c) in enumerate(scored[:3], start=1):
            out.append(f"({q}, {c}, {cos!r}, {rank})")
    rows = ", ".join(out)
    return f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(cosine AS DOUBLE) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM (VALUES {rows}) AS t(query_id, neighbor_id, cosine, rank)
    """


@df_query("multimodal_feature_search", _feature_search_values_oracle)
def multimodal_feature_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition showcase: binary payloads -> mapInPandas feature
    extraction (stubbed encoder, deterministic md5 vectors) -> cosine
    top-k similarity over the extracted embeddings. Hash-checked against
    a sequential driver-side replay (VALUES oracle) since late round 4."""
    from datafusion_server_spark.operators import similarity

    docs = tables.load(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs, "text", "doc_id")
    feats = (
        multimodal.extract_features(media)
        .withColumnRenamed("feature", "embedding")
        # undecodable media (NULL payload -> NULL feature) drops out
        .filter(F.col("embedding").isNotNull())
    )
    queries_side = feats.filter(F.col("media_id") < 5)
    return similarity.cosine_topk(feats, queries_side, k=3, id_col="media_id")


@df_query(
    "streaming_tumbling_counts",
    """
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 300) * 300) AS TIMESTAMP) AS bucket,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation (readStream ->
    watermark -> window -> memory sink, availableNow trigger), checked
    against the equivalent batch SQL — streaming and batch agree."""
    from datafusion_server_spark.streaming.windows import tumbling_event_counts

    return tumbling_event_counts(spark, f"{sf_dir}/events.parquet")


_SESSION_WINDOW_ORACLE = """
WITH flags AS (
  SELECT user_id, ts,
         -- >= : Spark's session_window is END-EXCLUSIVE (an event at
         -- exactly prev + gap starts a NEW session)
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n
FROM sess GROUP BY user_id, sid
"""


@df_query("streaming_session_window_native", _SESSION_WINDOW_ORACLE)
def streaming_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window streaming aggregation (dynamic gap-closed
    windows, engine-managed state merging) vs the batch gaps-and-islands
    oracle — streaming sessions and SQL sessions agree exactly."""
    from datafusion_server_spark.streaming.windows import session_window_counts

    return session_window_counts(spark, f"{sf_dir}/events.parquet")


@df_query(
    "streaming_stateful_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN EPOCH(ts) - EPOCH(
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events)
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM flagged
    """,
)
def streaming_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState keyed by
    user): per-user gap sessionization with explicit GroupState, checked
    against the batch window-function oracle — streaming state and batch
    SQL agree event-for-event."""
    from datafusion_server_spark.streaming.sessionize import sessionize_stream

    return sessionize_stream(spark, f"{sf_dir}/events.parquet")


@df_query(
    "streaming_dedup_within_watermark",
    """
    SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id, event_type FROM events
    """,
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with watermark-bounded state
    (dropDuplicatesWithinWatermark): the emitted key set must equal batch
    SELECT DISTINCT over the same events — checked value-for-value."""
    from datafusion_server_spark.streaming.dedup import dedup_event_keys

    return dedup_event_keys(spark, f"{sf_dir}/events.parquet")


@df_query(
    "streaming_stream_stream_join",
    """
    SELECT CAST(c.user_id AS BIGINT) AS user_id,
           c.event_id AS click_id, e.event_id AS error_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
    FROM events c JOIN events e
      ON c.user_id = e.user_id
     AND c.event_type = 'click' AND e.event_type = 'error'
     AND e.ts >= c.ts
     AND epoch_us(e.ts) - epoch_us(c.ts) <= 600000000
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (click x error within 10 min, watermarks
    both sides bounding join state): must equal the batch range join
    value-for-value."""
    from datafusion_server_spark.streaming.joins import click_error_join

    return click_error_join(spark, f"{sf_dir}/events.parquet")


# HLL sketch cardinality: values are engine-specific (different sketch
# implementations), so no value-level oracle — rows-only.
sql_query(
    "approx_count_distinct_sketch",
    """
    SELECT l_returnflag,
           CAST(APPROX_COUNT_DISTINCT(l_partkey) AS BIGINT) AS approx_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    oracle=None,
)


@df_query(
    "streaming_file_sink_roundtrip",
    """
    SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
           epoch_us(ts) AS ts_us,
           ROUND(CAST(value AS DOUBLE), 6) AS value
    FROM events WHERE event_type = 'click'
    """,
)
def streaming_file_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parquet file sink (checkpointed, exactly-once) -> batch
    read-back: the written dataset must equal the batch filter
    value-for-value."""
    import os

    from datafusion_server_spark.streaming.sources import file_sink_roundtrip

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        f"stream_sink_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    return file_sink_roundtrip(spark, f"{sf_dir}/events.parquet", out)


_KMV_STREAM_K = 8

_KMV_STREAM_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS bucket,
         md5(CAST(user_id AS VARCHAR)) AS h
  FROM events),
r AS (
  SELECT bucket, h,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h ASC) AS rn
  FROM h),
agg AS (
  SELECT bucket, MAX(h) AS h_k, CAST(COUNT(*) AS BIGINT) AS n_hashes
  FROM r WHERE rn <= {_KMV_STREAM_K} GROUP BY 1)
SELECT CAST(bucket * 3600 AS BIGINT) AS bucket_s,
       ROUND(CASE WHEN n_hashes < {_KMV_STREAM_K} THEN CAST(n_hashes AS DOUBLE)
                  ELSE {float(_KMV_STREAM_K - 1)}
                       / (CAST(('0x' || substr(h_k, 1, 15)) AS BIGINT)
                          / CAST(16.0 ** 15 AS DOUBLE)) END, 6) AS kmv_estimate,
       n_hashes
FROM agg
"""


@df_query("streaming_kmv_window_distinct", _KMV_STREAM_ORACLE)
def streaming_kmv_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable sketch: per-hour KMV distinct-user estimates
    via a stateful applyInPandasWithState operator that emits each hash
    the micro-batch it enters the per-bucket k-min set. Batch-count
    invariant (see streaming/sketches.py), so the batch KMV SQL is an
    exact oracle."""
    from datafusion_server_spark.streaming.sketches import kmv_window_distinct

    return kmv_window_distinct(spark, f"{sf_dir}/events.parquet", k=_KMV_STREAM_K)


# streaming deterministic HLL: registers as ONE engine-native streaming
# max-aggregation, estimate finished batch-side — oracle is the batch
# HLL SQL over the same hour bucketing (register math identical to
# sketch_hll_deterministic, grouped by time bucket instead).
from datafusion_server_spark.operators.sketch import (  # noqa: E402
    _HLL_M as _SHLL_M,
    _HLL_TAIL_BITS as _SHLL_TB,
    HLL_NUMERATOR as _SHLL_NUM,
)

_HLL_STREAM_ORACLE = f"""
WITH h AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT) AS bucket_s,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
  FROM events WHERE user_id IS NOT NULL),
reg AS (
  SELECT bucket_s, h60 >> {_SHLL_TB} AS bucket,
         CAST(MAX(CASE WHEN (h60 & {(1 << _SHLL_TB) - 1}) = 0
                       THEN {_SHLL_TB + 1}
                       ELSE {_SHLL_TB} - LENGTH(BIN(h60 & {(1 << _SHLL_TB) - 1})) + 1
                  END) AS BIGINT) AS m_j
  FROM h GROUP BY bucket_s, bucket),
agg AS (
  SELECT bucket_s,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - m_j)) AS BIGINT) AS s_present,
         CAST(COUNT(*) AS BIGINT) AS present
  FROM reg GROUP BY bucket_s)
SELECT bucket_s,
       CASE WHEN ({_SHLL_NUM!r} / CAST(s_present + ({_SHLL_M} - present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE)) <= {2.5 * _SHLL_M}
                 AND ({_SHLL_M} - present) > 0
            THEN ROUND({float(_SHLL_M)!r} * LN({float(_SHLL_M)!r} / CAST({_SHLL_M} - present AS DOUBLE)), 4)
            ELSE ROUND({_SHLL_NUM!r} / CAST(s_present + ({_SHLL_M} - present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE), 4)
       END AS hll_estimate,
       present AS n_registers
FROM agg
"""


@df_query("streaming_hll_window_distinct", _HLL_STREAM_ORACLE)
def streaming_hll_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deterministic HLL: the register max is associative, so
    the sketch runs as one ordinary streaming aggregation with
    engine-managed state (contrast the KMV row's custom
    applyInPandasWithState) — batching-invariant, exact batch oracle."""
    from datafusion_server_spark.streaming.sketches import hll_window_distinct

    return hll_window_distinct(spark, f"{sf_dir}/events.parquet")


@df_query(
    "streaming_stream_static_enrich",
    """
    WITH dim AS (
      SELECT DISTINCT c_custkey AS user_id,
             'seg' || CAST(c_custkey % 4 AS VARCHAR) AS segment
      FROM customer)
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(e.ts) / 3600) * 3600) AS TIMESTAMP) AS bucket,
           COALESCE(d.segment, 'unknown') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
    FROM events e LEFT JOIN dim d ON d.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def streaming_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (broadcast dim into every
    micro-batch, zero join state) -> windowed aggregation; checked
    against the equivalent batch SQL."""
    from datafusion_server_spark.streaming.joins import stream_static_enrich

    return stream_static_enrich(
        spark, f"{sf_dir}/events.parquet", f"{sf_dir}/customer.parquet"
    )


_TRENDING_ORACLE = """
WITH agg AS (
  SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 300) * 300) AS TIMESTAMP) AS bucket,
         event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT bucket, event_type, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY bucket
                                 ORDER BY n DESC, event_type ASC) AS BIGINT) AS rank
  FROM agg)
SELECT bucket, event_type, n, rank FROM r WHERE rank <= 3
"""


@df_query("streaming_trending_topk", _TRENDING_ORACLE)
def streaming_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window trending event types: Structured Streaming maintains
    the tumbling counts; the finished window table is ranked batch-side
    (top-3 per window, deterministic ties) — the standard streaming
    top-k dashboard shape, checked against the equivalent batch SQL."""
    from datafusion_server_spark.streaming.windows import trending_topk

    return trending_topk(spark, f"{sf_dir}/events.parquet")


# --- WebDataset tar-shard ingest (r6, sources/tar_py.py) --------------------
# Sample payloads are PURE FUNCTIONS of (suffix, doc_id), so the DuckDB
# oracle derives the expected shard CONTENT independently from the
# documents table — reading the synthesized tars back through the
# distributed binaryFile+mapInPandas scan verifies the container parse,
# the contiguous sample grouping, and the Arrow plumbing end-to-end
# with a real SQL oracle (not a replay).
_WDS_SUFFIXES = ("jpg", "txt", "json")

_WDS_JSON = (
    "'{{\"id\": ' || CAST(doc_id AS VARCHAR) || ', \"h\": \"' "
    "|| md5('json:' || CAST(doc_id AS VARCHAR)) || '\"}}'"
)

_WDS_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS key,
       CAST(3 AS BIGINT) AS n_members,
       md5(REPEAT(md5('jpg:' || CAST(doc_id AS VARCHAR)),
                  CAST(doc_id % 3 + 1 AS INT))) AS jpg_md5,
       md5(md5('txt:' || CAST(doc_id AS VARCHAR))) AS txt_md5,
       md5({_WDS_JSON}) AS json_md5,
       CAST(32 * (doc_id % 3 + 1) + 32 + LENGTH({_WDS_JSON}) AS BIGINT)
           AS total_bytes
FROM documents
""".replace("{{", "{").replace("}}", "}")


def _build_webdataset_shards(sf_dir: str) -> str:
    """Driver-side synthesis of deterministic WebDataset shards from the
    documents fixture (stdlib tarfile): 4 tar shards, sample key =
    zero-padded doc_id, members {key}.jpg/.txt/.json stored consecutively
    per the format's contiguity contract."""
    import hashlib
    import io
    import os
    import tarfile
    import tempfile

    import pyarrow.parquet as pq

    ids = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    d = tempfile.mkdtemp(prefix="wds_shards_")
    shards = [
        tarfile.open(os.path.join(d, f"shard-{i:03d}.tar"), "w") for i in range(4)
    ]
    for i in ids:
        i = int(i)
        tf = shards[i % 4]

        def h(s: str) -> str:
            return hashlib.md5(f"{s}:{i}".encode()).hexdigest()

        payloads = {
            "jpg": (h("jpg") * (i % 3 + 1)).encode(),
            "txt": h("txt").encode(),
            "json": ('{"id": %d, "h": "%s"}' % (i, h("json"))).encode(),
        }
        for sfx in _WDS_SUFFIXES:
            data = payloads[sfx]
            info = tarfile.TarInfo(name=f"{i:08d}.{sfx}")
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    for tf in shards:
        tf.close()
    return d


@df_query("multimodal_webdataset_ingest", _WDS_ORACLE)
def multimodal_webdataset_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard ingest: per-shard parallel streaming tar
    parse, adjacent same-key members grouped into one sample row inside
    the task (no shuffle), per-suffix payload digests + byte totals.
    The shape every image-text training pipeline starts from."""
    import os

    from datafusion_server_spark.sources import tar_py

    d = _build_webdataset_shards(sf_dir)
    wds = tar_py.read_webdataset(spark, os.path.join(d, "*.tar"), _WDS_SUFFIXES)
    return wds.select(
        F.col("key").cast("bigint").alias("key"),
        "n_members",
        F.md5("c_jpg").alias("jpg_md5"),
        F.md5("c_txt").alias("txt_md5"),
        F.md5("c_json").alias("json_md5"),
        (F.length("c_jpg") + F.length("c_txt") + F.length("c_json"))
        .cast("bigint")
        .alias("total_bytes"),
    )


# --- streaming CDC upsert (r7) ------------------------------------------------
# The changeset STREAM folds into a maintained snapshot via
# foreachBatch + apply_changeset (the Delta/Hudi MERGE-in-foreachBatch
# pattern). Each fixture key yields at most one change row (the %100
# insert branch wins over its %5 update), so the fold is
# batching-invariant and the batch oracle is exact.
_CDC_STREAM_ORACLE = """
WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s FROM orders),
ch AS (
  SELECT CASE WHEN o_orderkey % 100 = 0 THEN o_orderkey + 100000000 ELSE o_orderkey END AS k,
         CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice ELSE o_totalprice + 10 END AS p,
         CASE WHEN o_orderkey % 100 = 0 THEN 'N' ELSE o_orderstatus END AS s,
         CASE WHEN o_orderkey % 100 = 0 THEN 'I'
              WHEN o_orderkey % 15 = 0 THEN 'D'
              ELSE 'U' END AS op
  FROM orders WHERE o_orderkey % 5 = 0 OR o_orderkey % 100 = 0),
j AS (SELECT b.k AS bk, b.p AS bp, b.s AS bs, c.k AS ck, c.p AS cp, c.s AS cs, c.op
      FROM base b FULL OUTER JOIN ch c ON c.k = b.k)
SELECT CAST(COALESCE(bk, ck) AS BIGINT) AS o_orderkey,
       CAST(CASE WHEN ck IS NOT NULL THEN cp ELSE bp END AS DOUBLE) AS o_totalprice,
       CASE WHEN ck IS NOT NULL THEN cs ELSE bs END AS o_orderstatus
FROM j
WHERE NOT (ck IS NOT NULL AND op = 'D') AND (bk IS NOT NULL OR op = 'I')
"""


@df_query("streaming_cdc_upsert", _CDC_STREAM_ORACLE)
def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert sink: the CDC changeset arrives as a stream and
    folds into the snapshot one micro-batch at a time (foreachBatch +
    apply_changeset, snapshot localCheckpoint-ed between batches);
    the final snapshot must equal the batch apply."""
    from datafusion_server_spark.streaming.cdc import cdc_upsert_stream

    return cdc_upsert_stream(spark, f"{sf_dir}/orders.parquet")
