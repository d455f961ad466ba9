"""Structured Streaming event-time operators (extended surface).

The reference is batch-only (SURVEY.md §2.11) — its "streaming" is
date-partitioned incremental loads. This module provides the real thing:
tumbling/sliding/session event-time windows with watermarks over a
``readStream`` source. The SAME aggregation expressions run in batch mode
(see workloads.window_*_events) — which is what makes them
oracle-checkable: the driver verifies the batch form; the streaming form
shares the expression.

Scale notes: watermark bounds state (late data beyond it is dropped);
shuffle partitions should be sized to the stateful-operator parallelism;
sinks should be checkpointed (``option("checkpointLocation", ...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_driven_etl_spark.functions import dsum


def stream_from_files(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based stream (each new file = a micro-batch) — the test/demo
    source; swap for kafka/rate in production."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format(fmt)
        .load(path)
    )


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time window counts/sums with a watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) per user — the streaming counterpart of
    operators.windows.sessionize."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def ohlc_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 day",
    watermark: str = "2 days",
    keys: tuple[str, ...] = ("event_type",),
    tiebreak: str = "event_id",
) -> DataFrame:
    """Streaming OHLC bars: tumbling event-time windows with
    min_by/max_by open/close over a (ts, tiebreak) struct ordering key —
    the batch `temporal.ohlc_bars` semantics as a continuously-
    maintained aggregate. min_by/max_by are declarative aggregates
    whose partial states merge associatively, so they compose with
    Structured Streaming's incremental state exactly like sum/count:
    per-window state is ONE (value, ordering-key) pair per extremum
    regardless of event volume, and the watermark bounds how many
    windows stay live. Values become integer cents first (exact bars,
    the batch twin's contract)."""
    okey = F.struct(F.col(ts_col), F.col(tiebreak))
    cents = F.floor(F.col(value_col) * 100 + 0.5).cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .select(*keys, F.col(ts_col), F.col(tiebreak), cents.alias("_c"))
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.min_by(F.col("_c"), okey).alias("open_cents"),
            F.max("_c").alias("high_cents"),
            F.min("_c").alias("low_cents"),
            F.max_by(F.col("_c"), okey).alias("close_cents"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n_ticks",
        )
    )
