"""Watermarked windowed aggregations + stateful ops over an event stream.

Batch twins live in plans/events_queries.py — same logical semantics;
these add watermarks (late-data bound), incremental state, and
exactly-once file-sink behavior.  All operators take/return streaming
DataFrames so they compose with any readStream source.

Scale notes: stateful aggregation state is partitioned by group key
across executors; the watermark bounds state size (without it, a 100 TB
stream's window state grows unboundedly).  ``dropDuplicatesWithinWatermark``
replaces the reference's skip-if-exists idempotency
(reference: ingestion/pipeline.py:78-81) with bounded-state dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts + value sum."""
    group_cols = group_cols or ["event_type"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window event counts."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows with a dynamic inactivity gap (session_window) —
    the streaming form of events_sessionize_30m."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Bounded-state streaming dedup: duplicates arriving within the
    watermark horizon are dropped; state for older keys is reclaimed."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
