"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in windows (``streaming.windows``) cover time bucketing;
these cover arbitrary per-key state machines — the Spark-native shape
for operators the reference engine would hand-roll. State lives in the
state store (RocksDB/HDFS-backed on a cluster), partitioned by key, so
the operator scales with the key space, not the stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_schema: str | None = None,
) -> DataFrame:
    """Per-key running count and sum, emitted once per micro-batch.

    Works on a streaming DataFrame (true incremental state via
    ``applyInPandasWithState``) and, for testability, on a batch frame
    (same result computed with one aggregation).
    """
    out_schema = out_schema or f"{key_col} bigint, n_events bigint, total double"
    state_schema = "n bigint, total double"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [total]})

    if df.isStreaming:
        return df.groupBy(key_col).applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    # batch equivalence: the final state after one pass
    from pyspark.sql import functions as F  # noqa: PLC0415

    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("total")
    )


def sessionize_with_state(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Custom sessionizer: emits one row per closed session (state
    machine over event-time order within each micro-batch). Demonstrates
    arbitrary per-key state beyond what ``session_window`` offers
    (e.g. carrying session attributes). Streaming only."""
    out_schema = f"{key_col} bigint, session_start timestamp, session_end timestamp, n_events bigint"
    state_schema = "start_ts timestamp, last_ts timestamp, n bigint"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        cur = state.get if state.exists else None
        for pdf in pdfs:
            for ts in sorted(pdf[ts_col]):
                if cur is None:
                    cur = (ts, ts, 1)
                elif (ts - cur[1]).total_seconds() >= gap_seconds:
                    closed.append(cur)
                    cur = (ts, ts, 1)
                else:
                    cur = (cur[0], ts, cur[2] + 1)
        if cur is not None:
            state.update(cur)
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
