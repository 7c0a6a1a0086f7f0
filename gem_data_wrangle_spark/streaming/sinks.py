"""Streaming sinks.

``writeStream.format("parquet")`` covers plain append; ``foreachBatch``
is the production pattern for everything else (dynamic partition
overwrite, dedup-merge, multi-table fan-out): Spark hands each
micro-batch to a *batch* function together with a monotonically
increasing ``batch_id``, so any batch sink in this engine can be reused
unchanged. Exactly-once comes from the checkpoint + an idempotent batch
function (replays re-run the same ``batch_id``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def foreach_batch_sink(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Attach a batch-function sink to a stream; returns the started
    ``StreamingQuery``. ``batch_fn(df, batch_id)`` must be idempotent
    per ``batch_id`` for exactly-once semantics across restarts."""
    writer = stream.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sink_parquet_partitioned(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str],
    trigger_available_now: bool = True,
):
    """Micro-batch append into a hive-partitioned parquet table via
    ``foreachBatch`` — the standard streaming→lakehouse landing pattern
    when the native parquet sink's append-only contract isn't enough."""

    def _write(df: DataFrame, _batch_id: int) -> None:
        df.write.mode("append").partitionBy(*partition_by).parquet(path)

    return foreach_batch_sink(
        stream, _write, checkpoint, trigger_available_now=trigger_available_now
    )
