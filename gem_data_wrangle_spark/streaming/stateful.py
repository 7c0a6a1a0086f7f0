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
    ktype = df.schema[key_col].dataType.simpleString()
    out_schema = out_schema or f"{key_col} {ktype}, n_events bigint, total double"
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


def trailing_window_totals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
) -> DataFrame:
    """Per-EVENT trailing-window sum/count over a stream — the
    streaming twin of ``operators.asof.rolling_time_agg``: every
    incoming event is emitted with the sum/count of its key's events
    in ``[ts - window_seconds, ts]`` (inclusive both ends, matching
    the batch RANGE frame). The built-in streaming windows can't
    express this (they bucket time; this is a per-row trailing frame),
    so it's the canonical ``applyInPandasWithState`` custom operator.

    State = the per-key buffer of events younger than
    ``max_event_time - window`` — bounded by rate × window, evicted as
    the stream head advances, stored in the state store (RocksDB on a
    cluster), partitioned by key. Late-data caveat (the watermark
    analogy): an event arriving more than ``window`` behind its key's
    stream head can no longer see evicted peers, so its trailing sum
    covers only the surviving buffer PLUS itself and its same-ts peers
    — the trailing RANGE frame always includes the current row, so
    ``rolling_count ≥ 1`` unconditionally (a 0 count would break
    downstream moving-average division); eviction runs AFTER the frame
    is computed. In-order streams match the batch result exactly
    (asserted by the batch-equivalence test).

    Key/timestamp/value types are derived from ``df.schema`` (string
    hosts, composite ids, TIMESTAMP_NTZ stamps, integer values all
    work on the streaming path, not just the batch dispatch);
    ``rolling_sum`` follows Spark's ``sum`` typing — bigint for
    integral values, double for fractional.

    On a batch frame this dispatches to ``rolling_time_agg`` (same
    columns, same frame semantics) for testability.
    """
    ktype = df.schema[key_col].dataType.simpleString()
    ttype = df.schema[ts_col].dataType.simpleString()
    vtype = df.schema[value_col].dataType.simpleString()
    integral = vtype in ("tinyint", "smallint", "int", "bigint")
    sum_type = "bigint" if integral else "double"
    out_schema = (
        f"{key_col} {ktype}, {ts_col} {ttype}, {value_col} {vtype}, "
        f"rolling_sum {sum_type}, rolling_count bigint"
    )
    state_schema = f"tss array<{ttype}>, vals array<{vtype}>"
    conv = int if integral else float

    import datetime as dt  # noqa: PLC0415

    w = dt.timedelta(seconds=window_seconds)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tss, vals = state.get
            buf = [(pd.Timestamp(t), conv(v)) for t, v in zip(tss, vals)]
        else:
            buf = []
        events: list[tuple] = []
        for pdf in pdfs:
            events.extend(
                (pd.Timestamp(t), conv(v))
                for t, v in zip(pdf[ts_col], pdf[value_col])
            )
        events.sort(key=lambda e: e[0])
        head = max((b[0] for b in buf), default=None)
        rows = []
        i = 0
        while i < len(events):
            # RANGE-frame peer semantics: insert ALL events sharing a
            # timestamp before emitting any of them, so same-ts peers
            # see each other (peers split across micro-batches only
            # see previously-arrived peers — the late-data caveat)
            j = i
            ts = events[i][0]
            while j < len(events) and events[j][0] == ts:
                buf.append(events[j])
                j += 1
            head = ts if head is None or ts > head else head
            lo = ts - w
            # frame FIRST (always contains the current events, even
            # when ts is already behind the eviction horizon), THEN
            # evict against the stream head to bound state
            in_frame = [x for t, x in buf if lo <= t <= ts]
            s, n = sum(in_frame), len(in_frame)
            for _, v in events[i:j]:
                rows.append((key[0], ts, v, s, n))
            buf = [(t, x) for t, x in buf if t >= head - w]
            i = j
        state.update((
            [t.to_pydatetime() for t, _ in buf],
            [x for _, x in buf],
        ))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[key_col, ts_col, value_col,
                         "rolling_sum", "rolling_count"],
            )

    if df.isStreaming:
        return df.groupBy(key_col).applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    from gem_data_wrangle_spark.operators.asof import rolling_time_agg  # noqa: PLC0415

    return rolling_time_agg(
        df.select(key_col, ts_col, value_col),
        key_col, ts_col, value_col, window_seconds,
    )


def streaming_heavy_hitters(
    df: DataFrame,
    key_col: str,
    capacity: int = 64,
    num_shards: int = 16,
    shard_expr: Any | None = None,
) -> DataFrame:
    """Bounded-memory frequent-items over an unbounded stream —
    mergeable Misra–Gries summaries (Agarwal et al., PODS 2012) kept
    in per-SHARD state via ``applyInPandasWithState``.

    Heavy hitters is a GLOBAL question but stream state must partition
    by key, so keys hash into ``num_shards`` shards and each shard
    maintains one MG summary of at most ``capacity`` counters:
    per micro-batch, batch counts merge into the summary; when it
    exceeds capacity, the (capacity+1)-th largest count m is
    subtracted from every counter and non-positive ones drop — the
    standard mergeable-summary compaction. ``err`` accumulates the
    per-shard total decrement, giving the frequency bracket
    ``count ≤ true freq ≤ count + err`` for every surviving key; any
    key with true shard frequency > err is GUARANTEED present
    (no false negatives above the bound).

    State per shard is ≤ capacity (key, count) pairs + one error
    counter — the store holds ``num_shards × capacity`` entries
    FOREVER-bounded regardless of stream length or key cardinality.
    Output (update mode): per batch, each shard re-emits its summary
    rows ``(shard, key, count, err)``; a downstream batch merge sums
    counts/errs per key for the global view.

    Batch frames take the exact path: true per-key counts, top
    ``capacity`` per shard, ``err = 0`` — the superset the streaming
    summary approximates.
    """
    if capacity < 1 or num_shards < 1:
        raise ValueError("capacity and num_shards must be >= 1")
    # ``shard_expr`` overrides the default xxhash64 sharding with a
    # caller-supplied int Column (e.g. an md5-derived shard) — the
    # hook that lets an external system (or a cross-engine oracle)
    # replay the exact shard assignment; correctness only needs the
    # expr to be deterministic in the key.

    out_schema = f"shard int, {key_col} string, count bigint, err bigint"
    state_schema = "keys array<string>, counts array<long>, err bigint"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, err = state.get
            summary = dict(zip(keys, counts))
        else:
            summary, err = {}, 0
        for pdf in pdfs:
            for k, c in pdf[key_col].astype(str).value_counts().items():
                summary[k] = summary.get(k, 0) + int(c)
        if len(summary) > capacity:
            m = sorted(summary.values(), reverse=True)[capacity]
            err += m
            summary = {k: v - m for k, v in summary.items() if v > m}
        state.update((list(summary), [summary[k] for k in summary], err))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(summary),
                key_col: list(summary),
                "count": list(summary.values()),
                "err": [err] * len(summary),
            }
        )

    from pyspark.sql import functions as F  # noqa: PLC0415

    if shard_expr is not None:
        shard = shard_expr.cast("int")
    else:
        shard = F.pmod(
            F.xxhash64(F.col(key_col).cast("string")), num_shards
        ).cast("int")
    if df.isStreaming:
        return (
            df.withColumn("shard", shard)
            .groupBy("shard")
            .applyInPandasWithState(
                update,
                outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    from pyspark.sql import Window  # noqa: PLC0415

    counts = (
        df.withColumn("shard", shard)
        .groupBy("shard", key_col)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("count").desc(), F.col(key_col)
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= capacity)
        .select(
            "shard",
            F.col(key_col).cast("string").alias(key_col),
            "count",
            F.lit(0).cast("bigint").alias("err"),
        )
    )
