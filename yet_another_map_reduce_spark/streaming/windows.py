"""Event-time windowing — identical code path for batch and stream.

Watermarks bound state: without one, a streaming window agg keeps every
window open forever.  ``with_watermark`` is separated out so batch
callers (and the SQL oracle) can use the very same windowing functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound, e.g. delay='10 minutes': events older than
    max(event time) - delay are dropped and their windows finalized."""
    return df.withWatermark(ts_col, delay)


def tumbling_windowed(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed non-overlapping windows; emits window_start/window_end
    columns (flattened from the window struct for a stable schema)."""
    return (
        df.groupBy(F.window(ts_col, width), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_windowed(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        df.groupBy(F.window(ts_col, width, slide), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_windowed(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Data-driven windows that close after ``gap`` of inactivity per
    key — Spark's native session_window (merging handled by the engine,
    state bounded by the watermark in streaming mode)."""
    return (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )
