"""TIFF / EXIF metadata extraction — a real IFD walker.

Image corpora carry camera metadata (dimensions, orientation,
make/model, capture time, ISO) in TIFF's Image File Directory
structure — the container EXIF embeds in JPEG APP1 and that TIFF/DNG
files carry natively (TIFF 6.0 spec; EXIF 2.3, CIPA DC-008). This
module parses the actual bytes: byte-order mark (``II``
little-endian / ``MM`` big-endian), magic 42, IFD entry tables
(tag / type / count / value-or-offset, values > 4 bytes indirected
into the data area), and the ExifIFD sub-directory pointer
(tag 34665).

Same engineering contract as the MP4 demux (``mp4.py``): Arrow-batched
``mapInPandas`` (one Python pass per batch, never per-row UDFs),
malformed inputs quarantined by status (``not_tiff`` / ``truncated``)
instead of raising, bounds-checked reads everywhere. ``build_tiff``
synthesizes spec-shaped files for tests/oracles — the probe must
INVERT the builder by parsing, round-trip-proving the walker.

Plan/scale: metadata lives in the first kilobytes; the walker never
touches pixel data, so cost is independent of image size. The
operator is embarrassingly parallel — no shuffle, no state.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# IFD entry types (TIFF 6.0 §2): byte sizes per element
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
_TAG_ISO = 34855

# (name, spark type) for every probe output column except the id —
# single source for the default DDL and the id_col-renamed schema
PROBE_FIELDS: list[tuple[str, str]] = [
    ("probe_status", "string"), ("byte_order", "string"),
    ("width", "int"), ("height", "int"), ("orientation", "int"),
    ("make", "string"), ("model", "string"), ("datetime", "string"),
    ("iso", "int"), ("n_ifd0_entries", "int"),
]
PROBE_SCHEMA = "id bigint, " + ", ".join(
    f"{n} {t}" for n, t in PROBE_FIELDS
)


def build_tiff(
    width: int,
    height: int,
    orientation: int = 1,
    make: str = "Maker",
    model: str = "Cam",
    datetime_str: str = "2024:01:01 00:00:00",
    iso: int = 100,
    big_endian: bool = False,
) -> bytes:
    """Synthesize a minimal spec-valid TIFF: header, IFD0 with
    width/height (LONG), make/model/datetime (ASCII, indirected),
    orientation (SHORT, inline), an ExifIFD pointer, and an Exif
    sub-IFD carrying ISO (SHORT). Strings land in a data area after
    the IFDs, exactly as real writers lay them out."""
    e = ">" if big_endian else "<"
    mk = make.encode() + b"\0"
    md = model.encode() + b"\0"
    dt = datetime_str.encode() + b"\0"
    # layout: header(8) IFD0(2 + 7*12 + 4) exif_ifd(2 + 12 + 4) data
    ifd0_off = 8
    n0 = 7
    exif_off = ifd0_off + 2 + n0 * 12 + 4
    data_off = exif_off + 2 + 1 * 12 + 4
    off_mk = data_off
    off_md = off_mk + len(mk)
    off_dt = off_md + len(md)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # value field is left-justified in its 4 bytes for inline
        # SHORTs (spec: within the 4-byte field, ordering follows the
        # file's byte order, value in the low-address bytes)
        if typ == 3 and count == 1:
            return struct.pack(e + "HHI", tag, typ, count) + struct.pack(
                e + "H", value
            ) + b"\0\0"
        return struct.pack(e + "HHII", tag, typ, count, value)

    entries0 = (
        entry(_TAG_WIDTH, 4, 1, width)
        + entry(_TAG_HEIGHT, 4, 1, height)
        + entry(_TAG_MAKE, 2, len(mk), off_mk)
        + entry(_TAG_MODEL, 2, len(md), off_md)
        + entry(_TAG_ORIENTATION, 3, 1, orientation)
        + entry(_TAG_DATETIME, 2, len(dt), off_dt)
        + entry(_TAG_EXIF_IFD, 4, 1, exif_off)
    )
    ifd0 = struct.pack(e + "H", n0) + entries0 + struct.pack(e + "I", 0)
    exif = (
        struct.pack(e + "H", 1)
        + entry(_TAG_ISO, 3, 1, iso)
        + struct.pack(e + "I", 0)
    )
    header = (b"MM" if big_endian else b"II") + struct.pack(
        e + "HI", 42, ifd0_off
    )
    return header + ifd0 + exif + mk + md + dt


def _parse_ifd(buf: bytes, off: int, e: str) -> dict[int, object]:
    """One IFD at ``off`` → {tag: decoded value}; raises ValueError on
    any out-of-bounds read (the truncation signal)."""
    if off + 2 > len(buf):
        raise ValueError("ifd header out of bounds")
    (n,) = struct.unpack_from(e + "H", buf, off)
    if n > 512:  # adversarial cap, same spirit as mp4's sample cap
        raise ValueError("implausible entry count")
    end = off + 2 + n * 12
    if end + 4 > len(buf):
        raise ValueError("ifd entries out of bounds")
    out: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + i * 12
        tag, typ, count = struct.unpack_from(e + "HHI", buf, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: spec says skip the entry
        nbytes = size * count
        if nbytes <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(e + "I", buf, base + 8)
        if voff + nbytes > len(buf):
            raise ValueError("value out of bounds")
        if typ == 2:  # ASCII, NUL-terminated
            raw = buf[voff : voff + count]
            out[tag] = raw.split(b"\0", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            out[tag] = struct.unpack_from(e + "H", buf, voff)[0]
        elif typ == 4:
            out[tag] = struct.unpack_from(e + "I", buf, voff)[0]
        # rationals/bytes not needed for the probe surface
    return out


def parse_tiff_bytes(buf: bytes) -> dict[str, object]:
    """Parse one TIFF buffer into the probe row (pure function — unit
    tests and the Arrow batch path share it)."""
    row: dict[str, object] = {
        "probe_status": "ok", "byte_order": None, "width": None,
        "height": None, "orientation": None, "make": None, "model": None,
        "datetime": None, "iso": None, "n_ifd0_entries": None,
    }
    if buf is None or len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        row["probe_status"] = "not_tiff"
        return row
    e = "<" if buf[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(e + "HI", buf, 2)
    if magic != 42:
        row["probe_status"] = "not_tiff"
        return row
    row["byte_order"] = buf[:2].decode()
    try:
        ifd0 = _parse_ifd(buf, ifd_off, e)
        row["n_ifd0_entries"] = len(ifd0)
        row["width"] = ifd0.get(_TAG_WIDTH)
        row["height"] = ifd0.get(_TAG_HEIGHT)
        row["orientation"] = ifd0.get(_TAG_ORIENTATION)
        row["make"] = ifd0.get(_TAG_MAKE)
        row["model"] = ifd0.get(_TAG_MODEL)
        row["datetime"] = ifd0.get(_TAG_DATETIME)
        exif_off = ifd0.get(_TAG_EXIF_IFD)
        if exif_off is not None:
            row["iso"] = _parse_ifd(buf, int(exif_off), e).get(_TAG_ISO)
    except ValueError:
        return {
            **{k: None for k in row},
            "probe_status": "truncated",
            "byte_order": row["byte_order"],
        }
    return row


def tiff_probe(df: DataFrame, id_col: str = "id", media_col: str = "media") -> DataFrame:
    """Probe a ``(id, media binary)`` frame of TIFF payloads —
    Arrow-batched, bounds-checked, malformed rows quarantined by
    ``probe_status``."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                r = parse_tiff_bytes(bytes(buf) if buf is not None else None)
                r[id_col] = int(rid)
                rows.append(r)
            out = pd.DataFrame(rows)
            for c, dt in (
                ("width", "Int32"), ("height", "Int32"),
                ("orientation", "Int32"), ("iso", "Int32"),
                ("n_ifd0_entries", "Int32"),
            ):
                out[c] = out[c].astype(dt)
            yield out[[
                id_col, "probe_status", "byte_order", "width", "height",
                "orientation", "make", "model", "datetime", "iso",
                "n_ifd0_entries",
            ]]

    if id_col in {n for n, _ in PROBE_FIELDS}:
        raise ValueError(
            f"id_col {id_col!r} collides with a tiff_probe output column"
        )
    schema = f"`{id_col}` bigint, " + ", ".join(
        f"{n} {t}" for n, t in PROBE_FIELDS
    )
    return df.mapInPandas(run, schema)
