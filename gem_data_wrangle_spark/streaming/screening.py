"""Streaming composition of the incremental screens (round 14,
VERDICT r13 item 8): wire the ``*_against_index`` operators into a
``foreachBatch`` loop so a *stream* of crawl snapshots is screened
against a persisted cross-batch index — the natural production
deployment of the incremental family. Three compositions ship:
``stream_neardup_screen`` (MinHash band signatures),
``stream_dedup_screen`` (exact content digests), and
``stream_embedding_screen`` (sign-LSH buckets + exact cosine verify,
with the persisted-signature index shape as the state table).

Why ``foreachBatch`` and not a stateful operator: the screen's state
(the signature/digest index of ALL history) is a real lakehouse table —
it must survive restarts, be shareable with batch jobs, and grow to
ten years of crawl. ``applyInPandasWithState`` keys state to the
executor state store (scoped to one query's checkpoint, opaque to
batch readers); a parquet index table keyed by ``foreachBatch`` is
the idiomatic Spark shape for cross-batch state that outlives the
query (the same reasoning as reference-side snapshot jobs — cf.
``GEM/TotalData_GEM.R`` consolidating per-tracker snapshots through
persisted intermediate tables rather than in-process state).

Exactly-once: both sinks are ``batch_id``-partitioned with dynamic
partition overwrite, so a replayed micro-batch (same ``batch_id``
after a crash) overwrites its own partition instead of duplicating —
the standard idempotent-``foreachBatch`` recipe. The index READ is
restricted to partitions strictly older than the current
``batch_id``: a crash between the index write and the checkpoint
commit replays the batch with its own signatures already persisted,
and without the restriction the content-keyed screen would match
every survivor against itself and overwrite both partitions empty
(verified by the replay test — delete ``commits/N`` and restart). The
index DELTA per batch is the surviving documents' signatures/digests
only (one extra narrow pass over the small surviving batch), NOT the
unioned ``updated_index``: appending the delta keeps the per-batch
write O(batch) while a full-index rewrite would be O(history) per
micro-batch and unusable at crawl scale.

Scale: per micro-batch the work is exactly one batch signature/digest
pass + ONE equi-join against the index + one LEFT ANTI on the
broadcastable matched set (the ``*_against_index`` contracts), plus an
O(batch) parquet append. History is touched only through its index
table, which the reader prunes to the index columns.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gem_data_wrangle_spark.operators.dedup import (
    dedup_against_index,
    minhash_signatures,
    neardup_against_index,
)
from gem_data_wrangle_spark.streaming.sinks import foreach_batch_sink


def _stream_screen(
    stream_docs: DataFrame,
    index_dir: str,
    fresh_dir: str,
    checkpoint: str,
    index_cols: list[str],
    screen: Callable[[DataFrame, DataFrame | None], DataFrame],
    delta: Callable[[DataFrame], DataFrame],
    trigger_available_now: bool,
):
    """Shared foreachBatch engine: replay-guarded index read →
    ``screen(batch, index|None) -> fresh`` → batch_id-partitioned
    dynamic-overwrite writes of ``fresh`` and ``delta(fresh)``."""
    spark = stream_docs.sparkSession

    def _run(batch: DataFrame, batch_id: int) -> None:
        # cross-batch state: read the index table as of this batch.
        # Listing the directory (not try/except on read) so an empty
        # bootstrap dir and a missing dir behave identically.
        has_index = os.path.isdir(index_dir) and any(
            not e.startswith(("_", ".")) for e in os.listdir(index_dir)
        )
        index = spark.read.parquet(index_dir) if has_index else None
        if index is not None:
            # REPLAY GUARD: a crash between the index write and the
            # checkpoint commit replays this batch_id with its own
            # rows already in the index — the content-keyed screen
            # would then match every surviving doc against itself and
            # overwrite both partitions EMPTY (silent data loss).
            # State is "as of the prior batch" by definition, so read
            # strictly older partitions (partition-pruned).
            index = index.filter(F.col("batch_id") < batch_id).select(
                *index_cols
            )
        fresh = screen(batch, index)
        stamped = fresh.withColumn("batch_id", F.lit(batch_id))
        # dynamic partition overwrite == idempotent replay per batch_id
        (
            stamped.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(fresh_dir)
        )
        (
            delta(fresh).withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(index_dir)
        )

    return foreach_batch_sink(
        stream_docs,
        _run,
        checkpoint,
        trigger_available_now=trigger_available_now,
    )


def stream_neardup_screen(
    stream_docs: DataFrame,
    index_dir: str,
    fresh_dir: str,
    checkpoint: str,
    text_col: str,
    id_col: str,
    num_bands: int = 4,
    rows_per_band: int = 4,
    ngram: int = 2,
    trigger_available_now: bool = True,
):
    """Screen a streaming document source against a persisted MinHash
    band-signature index; returns the started ``StreamingQuery``.

    Per micro-batch: near-dups of ANY prior batch (via the index at
    ``index_dir``) are dropped; survivors land under
    ``fresh_dir/batch_id=N`` and their signatures are appended under
    ``index_dir/batch_id=N``. An empty/missing ``index_dir``
    bootstraps batch 0 with no screening (every doc survives), exactly
    like ``neardup_against_index(..., index_sigs=None)``.

    Within-batch near-dups are out of scope here as in the batch
    operator (run ``neardup_dedup`` upstream); ids must be globally
    unique across batches (the batch contract's re-crawl caveat).
    ``num_bands`` / ``rows_per_band`` / ``ngram`` must match across
    every batch AND any offline job sharing the index — signatures
    from different parameterizations never collide, so a drift
    silently screens nothing.
    """

    def screen(batch: DataFrame, index: DataFrame | None) -> DataFrame:
        fresh, _updated = neardup_against_index(
            batch,
            index,
            text_col,
            id_col,
            num_bands=num_bands,
            rows_per_band=rows_per_band,
            ngram=ngram,
            materialize=True,  # fresh feeds two sinks
        )
        return fresh

    def delta(fresh: DataFrame) -> DataFrame:
        return minhash_signatures(
            fresh,
            text_col,
            id_col,
            num_bands=num_bands,
            rows_per_band=rows_per_band,
            ngram=ngram,
        )

    return _stream_screen(
        stream_docs, index_dir, fresh_dir, checkpoint,
        [id_col, "band", "signature"], screen, delta,
        trigger_available_now,
    )


def stream_dedup_screen(
    stream_docs: DataFrame,
    index_dir: str,
    fresh_dir: str,
    checkpoint: str,
    text_col: str,
    id_col: str,
    trigger_available_now: bool = True,
):
    """Exact-digest sibling of :func:`stream_neardup_screen`: each
    micro-batch drops documents whose md5(text) digest already exists
    in ANY prior batch's index partition, then appends the survivors'
    digests. Unlike the near-dup screen, within-batch exact dups ARE
    handled (``dedup_against_index`` keeps the lowest-id row per
    digest), so a batch never contributes the same digest twice. Same
    exactly-once recipe: batch_id-partitioned dynamic overwrite on
    both sinks plus the strictly-older replay guard.
    """

    def screen(batch: DataFrame, index: DataFrame | None) -> DataFrame:
        fresh, _updated = dedup_against_index(
            batch, index, text_col, id_col, materialize=True
        )
        return fresh

    def delta(fresh: DataFrame) -> DataFrame:
        # fresh is within-batch deduped: exactly one row per digest
        return fresh.select(F.md5(F.col(text_col)).alias("digest"))

    return _stream_screen(
        stream_docs, index_dir, fresh_dir, checkpoint,
        ["digest"], screen, delta, trigger_available_now,
    )


def stream_embedding_screen(
    stream_emb: DataFrame,
    index_dir: str,
    fresh_dir: str,
    checkpoint: str,
    vec_col: str,
    id_col: str,
    planes: list,
    threshold: float = 0.4,
    trigger_available_now: bool = True,
):
    """Embedding member of the streaming-screen family: each
    micro-batch of vectors drops rows whose exact cosine against ANY
    prior batch reaches ``threshold`` (sign-LSH bucket candidates, the
    ``embedding_against_index`` contract), then appends the survivors'
    PERSISTED SIGNATURES — ``embedding_index_signatures``' ``(id, vec,
    norm, bucket)`` shape, so no micro-batch ever re-buckets history
    (the flat-curve production shape from the round-14 asymmetric
    measurements). ``planes`` is one plane table or a list of tables
    (OR-amplification) and must be IDENTICAL across every batch and
    any offline job sharing the index — drifted planes silently screen
    nothing. Same exactly-once recipe as the siblings: batch_id
    dynamic overwrite + the strictly-older replay guard.
    """
    from gem_data_wrangle_spark.operators.similarity import (  # noqa: PLC0415
        embedding_against_index,
        embedding_index_signatures,
    )

    def screen(batch: DataFrame, index: DataFrame | None) -> DataFrame:
        fresh, _updated = embedding_against_index(
            batch, index, vec_col, id_col, planes,
            threshold=threshold, materialize=True,
        )
        return fresh

    def delta(fresh: DataFrame) -> DataFrame:
        return embedding_index_signatures(fresh, vec_col, id_col, planes)

    return _stream_screen(
        stream_emb, index_dir, fresh_dir, checkpoint,
        [id_col, vec_col, "norm", "bucket"], screen, delta,
        trigger_available_now,
    )
