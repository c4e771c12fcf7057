"""Streaming CDC apply: a changeset STREAM folds into a maintained
snapshot via ``foreachBatch`` + the batch ``apply_changeset`` operator
— the standard Structured Streaming upsert-sink pattern (Delta/Hudi
MERGE inside foreachBatch), with the snapshot carried as a
localCheckpoint-ed DataFrame between micro-batches (the kmeans/
Bradley-Terry driver-state house pattern; state is a DataFrame, never
a driver collect).

Ordering contract: within one micro-batch the changeset is applied
set-wise (each key at most once — the fixture synthesizes unique keys,
and real CDC feeds compact per key before apply); across micro-batches
application is sequential, so later batches win — exactly the
upsert-sink semantics.

Scale note: each micro-batch is ONE key-keyed join of the batch
against the current snapshot (broadcast when the batch is small — the
common CDC shape). Snapshot size is bounded by live keys, not stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark.operators.merge import apply_changeset


def cdc_upsert_stream(
    spark: SparkSession,
    orders_path: str,
    *,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Fold the deterministic fixture changeset (every %5 key updates
    +10.00, %15 deletes, %100 re-inserts under a shifted key — the
    merge_apply_changeset synthesis) into the orders snapshot, with
    the changeset arriving as a STREAM. Returns the final snapshot
    (o_orderkey, o_totalprice DOUBLE, o_orderstatus)."""
    # session conf is saved/restored around the whole run (r8, ADVICE):
    # the nanos flag is needed for BOTH the static read here and the
    # streaming source's micro-batch reads, but must not leak into the
    # caller's session afterwards
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev_nanos = spark.conf.get(conf_key)
    except Exception:
        prev_nanos = None
    spark.conf.set(conf_key, "true")
    static = spark.read.parquet(orders_path)
    base = static.select("o_orderkey", "o_totalprice", "o_orderstatus")
    parent, _, fname = orders_path.rpartition("/")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    changes = (
        stream.filter(
            (F.col("o_orderkey") % 5 == 0) | (F.col("o_orderkey") % 100 == 0)
        )
        .select(
            F.when(
                F.col("o_orderkey") % 100 == 0, F.col("o_orderkey") + 100000000
            )
            .otherwise(F.col("o_orderkey"))
            .alias("o_orderkey"),
            F.when(
                F.col("o_orderkey") % 100 == 0, F.col("o_totalprice")
            )
            .otherwise(F.col("o_totalprice") + 10)
            .alias("o_totalprice"),
            F.when(F.col("o_orderkey") % 100 == 0, F.lit("N"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(F.col("o_orderkey") % 100 == 0, F.lit("I"))
            .when(F.col("o_orderkey") % 15 == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
    )
    state = {"snap": base.localCheckpoint(eager=True)}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        state["snap"] = (
            apply_changeset(state["snap"], batch_df, "o_orderkey")
            .drop("change_type")
            .localCheckpoint(eager=True)
        )

    query = (
        changes.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout: the availableNow
        # drain did NOT finish, so the folded snapshot would be a
        # silently partial result — raise instead (r8, ADVICE)
        if not query.awaitTermination(timeout_s):
            raise TimeoutError(
                f"cdc_upsert_stream: availableNow drain still running "
                f"after {timeout_s}s; partial snapshot discarded"
            )
    finally:
        query.stop()
        if prev_nanos is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev_nanos)
    return state["snap"].select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderstatus",
    )
