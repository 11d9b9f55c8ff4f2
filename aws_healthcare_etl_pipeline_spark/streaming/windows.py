"""Event-time windowed aggregation + sessionization (SURVEY.md §2.7 [EXT]).

The reference has no event-time story at all (everything is stamped
with processing-time ingest_date, glue_job_script.py:26); these are the
Structured-Streaming-native extensions over the ``events`` fixture.

Each helper works on BOTH a batch DataFrame and a streaming DataFrame —
the logical plan is identical; only the sink differs. Tests drive the
streaming path with the parquet fixture via a file-source + memory sink
and assert it equals the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str | None = "30 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Per (tumbling window, event_type): count + sum(value).

    Watermark bounds state for true streams; on a batch DataFrame
    withWatermark is a no-op, so the same function serves both paths.
    """
    df = events
    if watermark and events.isStreaming:
        df = events.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_size).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(15,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "30 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Per (sliding window, event_type): count + sum(value).

    F.window with a slide duration assigns each event to
    window_size/slide overlapping windows (2 at the defaults) —
    the hopping-window aggregation for smoothed rate monitoring.
    """
    df = events
    if watermark and events.isStreaming:
        df = events.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_size, slide).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(15,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: session_window(ts, gap) native op."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("s"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
