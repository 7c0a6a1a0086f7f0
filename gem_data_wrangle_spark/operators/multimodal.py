"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas``. The *decode* step is stubbed behind a
deterministic fake (the media libraries are not in this container) —
everything Spark-side (schemas, batch iteration, partitioning, UDF
signatures) is real and tested, so swapping in a real decoder is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "id bigint, media binary, media_type string, width int, height int"

FEATURE_SCHEMA = "id bigint, n_bytes bigint, feature double"

# Set True only when a real codec library is wired in.
REAL_DECODERS_AVAILABLE = False


def attach_binary(df: DataFrame, src_col: str, id_col: str, media_type: str = "image/fake") -> DataFrame:
    """Build a typed media table from any source column by encoding it
    to bytes — the plumbing used by tests; a real pipeline reads bytes
    from Parquet/object storage directly."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(src_col), "utf-8").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def _decode_stub(payload: bytes) -> float:
    """Deterministic fake 'decoder': byte-sum mod 997, scaled.

    Stands in for image decode + feature extraction; replace with a
    real codec when available (``REAL_DECODERS_AVAILABLE``).
    """
    return (sum(payload) % 997) / 997.0


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` streams record batches — constant memory per task
    regardless of table size; the UDF sees ``pandas.Series`` of bytes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "feature": pdf["media"].map(_decode_stub),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — real decode required; stub raises until a codec
    library is wired in, keeping the API surface honest."""
    if not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image resize needs a codec library (PIL/opencv) not present "
            "in this container; plumbing is exercised via extract_features"
        )
    raise NotImplementedError


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling — same stub policy as resize_images."""
    if not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "frame sampling needs a video codec library not present in "
            "this container"
        )
    raise NotImplementedError
