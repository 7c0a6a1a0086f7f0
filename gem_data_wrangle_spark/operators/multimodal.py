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


RESIZED_SCHEMA = "id bigint, media binary, media_type string, width int, height int"

FRAME_SCHEMA = "id bigint, frame_idx int, frame binary, n_bytes bigint"


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over the binary column.

    The *decode→resize→encode* step is a clearly-marked deterministic
    fake (byte-stream truncation/padding to width*height bytes) until a
    codec library is wired in (``REAL_DECODERS_AVAILABLE``); the Spark
    plumbing — Arrow batching, schema, metadata update — is real.
    """
    target = width * height

    def fake_resize(payload: bytes) -> bytes:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("wire in PIL/opencv decode here")
        return payload[:target].ljust(target, b"\x00")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media": pdf["media"].map(fake_resize),
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int, frame_size: int = 64) -> DataFrame:
    """Video frame sampling: one output row per kept frame.

    Fake decoder: the byte stream is treated as fixed-size frames and
    every ``every_n``-th is kept — the row-expanding mapInPandas shape
    (one input row → many output rows) is exactly what a real
    frame-sampler needs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["id"], pdf["media"]):
                if REAL_DECODERS_AVAILABLE:  # pragma: no cover
                    raise NotImplementedError("wire in a video codec here")
                n_frames = max(len(payload) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(payload[i * frame_size:(i + 1) * frame_size])
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "n_bytes": pd.Series([len(f) for f in frames], dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------
# REAL header metadata: PNG / JPEG / GIF dimensions from raw bytes —
# container header parsing needs no codec library, so unlike the
# decode stub above this path is fully functional.
# --------------------------------------------------------------------

def _parse_dimensions(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from the container header, or Nones.

    PNG: IHDR is always the first chunk — width/height are big-endian
    uint32 at bytes 16..24. GIF87a/89a: little-endian uint16 at 6..10.
    JPEG: walk the marker stream to the first SOF0-SOF15 frame header
    (height then width, big-endian uint16 at offsets 3/5 past the
    marker length field).
    """
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return "png", w, h
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return "gif", w, h
        if payload[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(payload[i + 5 : i + 7], "big")
                    w = int.from_bytes(payload[i + 7 : i + 9], "big")
                    return "jpeg", w, h
                i += 2 + seg_len
    except (IndexError, ValueError):
        pass
    return None, None, None


IMAGE_META_SCHEMA = "id bigint, format string, width int, height int"


def image_dimensions(media: DataFrame, id_col: str = "id", media_col: str = "media") -> DataFrame:
    """Per-image container format + pixel dimensions, parsed from the
    raw bytes with no codec dependency. Arrow-batched ``mapInPandas``
    like every multimodal path — constant memory, header-only reads
    (the payload tail is never touched)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [
                _parse_dimensions(bytes(b)) if b is not None else (None, None, None)
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                }
            )

    return media.mapInPandas(batches, IMAGE_META_SCHEMA)


def _parse_media_meta(payload: bytes) -> tuple[str | None, int | None, float | None]:
    """(format, sample_rate_or_timescale, duration_seconds) for WAV
    (RIFF fmt/data chunks) and MP4 (moov/mvhd box) containers — again
    pure header arithmetic, no codec.
    """
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            i, rate, byte_rate, data_len = 12, None, None, None
            while i + 8 <= len(payload):
                cid = payload[i : i + 4]
                clen = int.from_bytes(payload[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 16 + 8 <= len(payload):
                    rate = int.from_bytes(payload[i + 12 : i + 16], "little")
                    byte_rate = int.from_bytes(payload[i + 16 : i + 20], "little")
                elif cid == b"data":
                    data_len = clen
                i += 8 + clen + (clen % 2)
            if rate and byte_rate and data_len is not None:
                return "wav", rate, round(data_len / byte_rate, 6)
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            i = 0
            while i + 8 <= len(payload):
                blen = int.from_bytes(payload[i : i + 4], "big")
                btype = payload[i + 4 : i + 8]
                if btype == b"moov":
                    j = i + 8
                    while j + 8 <= i + blen and j + 8 <= len(payload):
                        slen = int.from_bytes(payload[j : j + 4], "big")
                        if payload[j + 4 : j + 8] == b"mvhd" and j + 28 <= len(payload):
                            timescale = int.from_bytes(payload[j + 20 : j + 24], "big")
                            duration = int.from_bytes(payload[j + 24 : j + 28], "big")
                            if timescale:
                                return "mp4", timescale, round(duration / timescale, 6)
                        j += max(slen, 8)
                if blen < 8:
                    break
                i += blen
    except (IndexError, ValueError, ZeroDivisionError):
        pass
    return None, None, None


AV_META_SCHEMA = "id bigint, format string, rate int, duration double"


def av_metadata(media: DataFrame, id_col: str = "id", media_col: str = "media") -> DataFrame:
    """WAV sample rate + duration and MP4 timescale + duration from the
    container headers — Arrow-batched, header-only, codec-free."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [
                _parse_media_meta(bytes(b)) if b is not None else (None, None, None)
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "format": [p[0] for p in parsed],
                    "rate": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "duration": pd.array([p[2] for p in parsed], dtype="Float64"),
                }
            )

    return media.mapInPandas(batches, AV_META_SCHEMA)
