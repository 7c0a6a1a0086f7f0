"""BMP (Windows Bitmap) builder + structural probe.

Parses the public BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
(40 bytes) layout: 'BM' magic, little-endian u32 file size / data
offset, i32 width/height (negative height = top-down row order),
u16 bpp, u32 compression, optional 256-entry palette for 8 bpp.
Row stride pads to 4-byte boundaries: ``((w·bpp + 31) div 32) · 4``.

Same contract as the other codecs (`jpeg_codec`, `gif_codec`,
`tiff_exif`): the builder synthesizes REAL spec-conformant bytes so
the probe's field walk is load-bearing, junk and truncated payloads
quarantine under their own statuses instead of throwing, and the
probe is an Arrow-batched ``mapInPandas`` — a narrow per-row walk of
the first 54 bytes, never the pixel data (cost per FILE, not per
pixel; scale-safe on any corpus).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

_HDR = 54  # file header (14) + BITMAPINFOHEADER (40)


def bmp_stride(width: int, bpp: int) -> int:
    """Row stride in bytes — BMP rows pad to 4-byte boundaries."""
    return ((width * bpp + 31) // 32) * 4


def build_bmp(
    width: int,
    height: int,
    bpp: int = 24,
    top_down: bool = False,
) -> bytes:
    """Spec-conformant uncompressed (BI_RGB) BMP with deterministic
    pixel bytes derived from (x, y); 8 bpp emits the mandatory
    256-entry BGRA palette before the pixel array."""
    if bpp not in (8, 24):
        raise ValueError("bpp must be 8 or 24")
    if width < 1 or height < 1:
        raise ValueError("width and height must be positive")
    stride = bmp_stride(width, bpp)
    palette = b""
    colors_used = 0
    if bpp == 8:
        colors_used = 256
        palette = b"".join(
            bytes((i, (i * 3) & 0xFF, (i * 7) & 0xFF, 0)) for i in range(256)
        )
    data_offset = _HDR + len(palette)
    rows = []
    for y in range(height):
        if bpp == 24:
            row = b"".join(
                bytes(((x + y) & 0xFF, (x * 2 + y) & 0xFF, (x ^ y) & 0xFF))
                for x in range(width)
            )
        else:
            row = bytes(((x * 31 + y * 17) & 0xFF) for x in range(width))
        rows.append(row + b"\x00" * (stride - len(row)))
    pixels = b"".join(rows)
    file_size = data_offset + len(pixels)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_hdr = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        bpp,
        0,  # BI_RGB
        len(pixels),
        2835,
        2835,
        colors_used,
        0,
    )
    return file_hdr + info_hdr + palette + pixels


def _probe_one(buf: bytes) -> dict:
    if buf is None or len(buf) < _HDR or buf[:2] != b"BM":
        return {
            "probe_status": "not_bmp",
            "width": None, "height": None, "bpp": None,
            "compression": None, "top_down": None, "row_stride": None,
            "data_offset": None, "palette_colors": None,
            "n_pixel_bytes": None,
        }
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    (
        _hsz, width, raw_h, _planes, bpp, compression,
        _isz, _xppm, _yppm, colors_used, _imp,
    ) = struct.unpack_from("<IiiHHIIiiII", buf, 14)
    top_down = raw_h < 0
    height = -raw_h if top_down else raw_h
    stride = bmp_stride(width, bpp) if width > 0 else None
    expected = stride * height if stride is not None else None
    complete = (
        expected is not None and len(buf) >= data_offset + expected
    )
    return {
        "probe_status": "ok" if complete else "truncated",
        "width": width, "height": height, "bpp": int(bpp),
        "compression": int(compression), "top_down": int(top_down),
        "row_stride": stride, "data_offset": int(data_offset),
        "palette_colors": int(colors_used),
        "n_pixel_bytes": expected if complete else None,
    }


def bmp_probe(
    media: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
) -> DataFrame:
    """Structural probe over a ``(id, media binary)`` frame: one row
    per file with header fields, or a quarantine status (``not_bmp``
    for junk/short buffers, ``truncated`` when the pixel array is cut)
    — corrupt inputs become DATA, never exceptions."""
    import pandas as pd  # noqa: PLC0415

    cols = [
        "probe_status", "width", "height", "bpp", "compression",
        "top_down", "row_stride", "data_offset", "palette_colors",
        "n_pixel_bytes",
    ]
    # same guard as gif_probe/tiff_probe (ADVICE r11): a colliding
    # id_col would yield a duplicate output column
    if id_col in cols:
        raise ValueError(
            f"id_col {id_col!r} collides with a bmp_probe output column"
        )

    def walk(it):
        for pdf in it:
            recs = [_probe_one(b) for b in pdf[media_col]]
            out = pd.DataFrame({id_col: pdf[id_col]})
            for c in cols:
                out[c] = pd.Series(
                    [r[c] for r in recs],
                    dtype="object" if c == "probe_status" else "Int64",
                )
            yield out

    schema = (
        f"`{id_col}` bigint, probe_status string, width int, height int,"
        " bpp int, compression int, top_down int, row_stride int,"
        " data_offset int, palette_colors int, n_pixel_bytes bigint"
    )
    return media.mapInPandas(walk, schema)
