"""Structured Streaming over the ``events`` table.

The batch-mode equivalents in ``operators/events.py`` carry the DuckDB
correctness gate; this module wraps the SAME transformations in
``readStream`` with watermarks — the transformations are shared by
construction, so batch-verified semantics transfer to the streaming plan
(the Spark unification guarantee). Tests drive these with file-source
micro-batches and a memory sink, including a late-data-drop scenario.

Scale notes: file-source streaming scales by listing; state stores are
per-(window,key) with watermark-driven eviction, so state is bounded by the
watermark horizon, not the stream length. ``applyInPandasWithState`` is the
arbitrary-stateful escape hatch (Arrow-batched per group).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: fallback stream schema when the landing directory is still empty (no
#: file to probe). ``ts`` is declared BIGINT deliberately: the session
#: pins ``nanosAsLong`` because the driver's events generation stores
#: TIMESTAMP(NANOS), which surfaces as a raw long — declaring TIMESTAMP
#: here would let the stream START on an empty directory and then DIE on
#: its first micro-batch when a nanos file lands ("Parquet column cannot
#: be converted"). The bigint declaration routes the first file through
#: the same nanos→micros conversion the probed path uses. A
#: micros-generation landing dir should pass ``schema`` explicitly.
EVENTS_FILE_SCHEMA = (
    "event_id LONG, ts BIGINT, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events(
    spark: SparkSession,
    path: str,
    max_files: int | None = None,
    schema=None,
) -> DataFrame:
    """File-source stream of events.

    ``readStream`` needs an explicit schema (no inference mid-stream), so the
    physical schema is probed with ONE batch metadata read of the same
    directory; on an empty or not-yet-created landing directory the probe
    falls back to ``EVENTS_FILE_SCHEMA`` (or a caller-supplied ``schema``)
    so the stream can start BEFORE the first file lands. Mirrors the
    defensive conversion in ``sources/tables.py``: generations of the
    testdata that store ``ts`` as TIMESTAMP(NANOS) read it as a raw long
    (``nanosAsLong``) and convert to a micros timestamp here; generations
    that store TIMESTAMP(MICROS) stream it as a timestamp directly."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        try:
            schema = spark.read.parquet(path).schema
        except AnalysisException:
            # empty / not-yet-created landing dir ("unable to infer
            # schema" / path not found) — other errors must surface, not
            # silently pick the fallback schema
            schema = EVENTS_FILE_SCHEMA
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    df = reader.load(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    elif ts_type == "timestamp_ntz":
        # watermarks require TIMESTAMP (ltz); the session is pinned to UTC,
        # so the cast preserves the wall-clock instant
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked 1-hour tumbling counts per event type; in append mode a
    window is emitted once the watermark passes its end, and events older
    than the watermark are DROPPED (late-data policy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked 1-hour windows sliding every 30 minutes (each event lands
    in 2 windows; state per open window, evicted by watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked session windows (30-minute gap) per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_OUT_SCHEMA = "user_id BIGINT, total_events BIGINT"


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user totals across micro-batches (Arrow-batched, state-store
    backed — the Spark-native replacement for hand-rolled stateful
    Transform streams). The state function is a closure so it pickles by
    value (executors don't need this package importable)."""

    def count_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield _pd.DataFrame({"user_id": [key[0]], "total_events": [total]})

    return (
        events.select("user_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def purchase_view_join(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream INNER join: every (purchase, view) pair by
    the same user where the view happened at most 30 minutes before the
    purchase — the streaming counterpart of the batch
    ``operators.events.q_stream_stream_join`` (same predicate, same output).

    Both inputs carry event-time watermarks and the join condition bounds
    each side's event time relative to the other, so Spark can prove when
    buffered rows are no longer joinable and EVICT them: join state is
    bounded by (watermark + 30 minutes), not by stream length — the property
    that makes the operator runnable forever at 100 TB/day."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    # the canonical two-sided bound form (p_ts between v_ts and v_ts + gap):
    # Spark derives both state watermarks from it, so each side's buffered
    # rows are dropped as soon as the other side's watermark passes their
    # joinable horizon
    joined = purchases.join(
        views,
        F.expr(
            "user_id = v_user_id AND p_ts >= v_ts "
            "AND p_ts <= v_ts + INTERVAL 30 MINUTES"
        ),
    )
    gap = F.unix_timestamp("p_ts").cast("long") - F.unix_timestamp("v_ts").cast("long")
    return joined.select(
        "user_id", "purchase_id", "view_id", gap.alias("gap_seconds")
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup by event_id within the watermark horizon —
    state is bounded: ids older than the watermark are evicted."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_foreach_batch_to_parquet(
    df: DataFrame, out_path: str, checkpoint: str
) -> None:
    """Stream → distributed parquet sink via foreachBatch (the integration
    point for arbitrary batch writers; checkpointing gives exactly-once
    per-batch semantics — replayed batches overwrite their own output)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    q = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now(
    df: DataFrame, query_name: str, output_mode: str, checkpoint: str
) -> None:
    """Run a streaming DataFrame to a memory sink until all available input
    is processed, then stop. Results land in the in-memory table
    ``query_name``."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
