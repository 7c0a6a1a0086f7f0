"""Structured Streaming surface (engine extension; the reference is
batch-only — SURVEY §2.13).

Each builder works on *either* a streaming or a batch DataFrame —
``window``/``session_window`` are plan-level constructs, so the same
code is unit-testable in batch and differential-testable against a SQL
oracle, then attached to ``readStream`` unchanged. Watermarks are only
applied when the input is actually streaming (batch plans reject
``withWatermark`` output modes downstream, not the call itself).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping time buckets; late rows beyond the watermark are
    dropped in streaming mode. State per (window, group) only."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, duration), *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, duration, slide), *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sessionization: windows close after ``gap`` of inactivity per
    group. Streaming state is bounded by the watermark."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap), *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("window_start", F.col("session_window.start"))
        .withColumn("window_end", F.col("session_window.end"))
        .drop("session_window")
    )


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact dedup on key columns. With a watermark the state
    store evicts keys older than the horizon
    (``dropDuplicatesWithinWatermark``) — mandatory at scale; unbounded
    dedup state is a leak."""
    if watermark and ts_col and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))
    return df.dropDuplicates(list(key_cols))
