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


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str,
    lookahead: str = "0 seconds",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: match right rows whose timestamp falls
    in ``[left_ts - lookback, left_ts + lookahead]`` for the same key —
    the canonical watermarked stream-stream join (click↔impression
    attribution, event↔feature alignment). The same plan runs in batch
    for unit/differential testing.

    Scale/state: in streaming mode BOTH sides carry watermarks and the
    time-range condition bounds the state store — without the range
    predicate Spark must buffer one side forever. The join itself
    shuffles both sides by the key, same as any equi-join.
    """
    l, r = left.alias("l"), right.alias("r")  # noqa: E741
    if watermark and left.isStreaming:
        l = left.withWatermark(left_ts, watermark).alias("l")
    if watermark and right.isStreaming:
        r = right.withWatermark(right_ts, watermark).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
        & (rts <= lts + F.expr(f"INTERVAL {lookahead}"))
    )
    return l.join(r, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension
    (the streaming twin of ``joins.left_enrich``). The static side is
    re-read per micro-batch, so dimension updates are picked up without
    restarting the query; Spark broadcasts it when it fits
    (stateless — no watermark needed, unlike stream-stream joins).
    Left/inner only: stream-static right/full joins are unsupported by
    Structured Streaming."""
    return stream.join(dim, on=on, how=how)


def windowed_distinct_count(
    df: DataFrame,
    ts_col: str,
    duration: str,
    key_col: str,
    group_cols: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """EXACT distinct keys per tumbling window (per group) — "unique
    users per hour", the counting question HLL answers approximately
    and this answers exactly where exactness is required (billing,
    dedup audits).

    Shape: assign the window, then ``dropDuplicates`` on
    ``(window, groups, key)``, then a plain count — the first
    stateful op holds one row per distinct (window, group, key), the
    second one counter per (window, group). In streaming mode the
    watermark bounds both states: the window column carries event
    time, so state for closed windows is evicted (chained stateful
    operators in append mode — Spark 3.4+). The batch form is the
    identical plan minus state, and is what the oracle replays.

    Scale: both shuffles key on the window+group (+key for the
    dedup); a hot window/group pair still distributes across the
    dedup's key dimension first, so no single reducer sees a whole
    window unless one (window, group, key) triple does — which is one
    row. Contrast ``groupBy(window).agg(countDistinct(key))``, which
    builds the full distinct set per reducer row.
    """
    src = _maybe_watermark(df, ts_col, watermark)
    win = src.select(
        F.window(ts_col, duration).alias("window"), *group_cols, key_col
    )
    dedup = win.dropDuplicates(["window", *group_cols, key_col])
    return (
        dedup.groupBy("window", *group_cols)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )
