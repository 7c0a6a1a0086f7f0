"""Tests for the pure-Python VP8L (WebP lossless) decoder.

Strategy mirrors test_jpeg_codec.py: a test-side ENCODER written
against the same public spec (WebP Lossless Bitstream Specification /
RFC 9649 §3) produces streams exercising every decoder path — simple
and code-length-coded prefix codes (incl. 16/17/18 repeats and the
max-symbol cap), color cache, LZ77 with both absolute and short-plane
distance codes, meta prefix groups, and all four transforms. Because
VP8L is lossless, the golden for every stream is the ORIGINAL pixel
array — a decode that differs anywhere fails equality, not a
tolerance. Decoder-independent micro-tests pin the predictor modes,
the cross-color delta, and the distance-map ordering so that
encoder/decoder compensating bugs cannot hide.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gem_data_wrangle_spark.operators import webp_codec as W  # noqa: E402
from gem_data_wrangle_spark.operators.webp_codec import (  # noqa: E402
    _DIST_MAP,
    _add_px,
    _avg2,
    _ct_delta,
    _predict,
    _subsample,
)


# --------------------------------------------------------------------
# encoder: bit writer + canonical codes
# --------------------------------------------------------------------

class BitWriter:
    """LSB-first bit writer (mirror of the decoder's reader)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are spelled MSB-first in the stream."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """sym -> (length, canonical code), DEFLATE assignment."""
    if not lengths:
        return {}
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for b in range(1, max_len + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    out = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (ln, next_code[ln])
        next_code[ln] += 1
    return out


def choose_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Valid complete-Kraft lengths for the used symbols (not optimal
    — compression is irrelevant, completeness is what the decoder
    checks): with k symbols and L=ceil(log2 k), the 2^L - k most
    frequent get length L-1, the rest L."""
    used = [s for s, f in freqs.items() if f > 0]
    k = len(used)
    if k == 0:
        raise ValueError("no symbols")
    if k == 1:
        return {used[0]: 1}
    L = (k - 1).bit_length()
    n_short = (1 << L) - k
    by_freq = sorted(used, key=lambda s: (-freqs[s], s))
    out = {}
    for i, s in enumerate(by_freq):
        out[s] = (L - 1) if i < n_short else L
    return out


_CL_ORDER = W._CL_ORDER


def emit_prefix_code(
    bw: BitWriter,
    lengths: dict[int, int],
    alphabet_size: int,
    use_max_symbol: bool = False,
) -> None:
    """Write one prefix code. 1-2 symbols -> the simple form; else the
    code-length-coded form (runs via 16/17/18)."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        first_8 = 0 if syms[0] <= 1 else 1
        bw.write(first_8, 1)
        bw.write(syms[0], 8 if first_8 else 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)  # full form
    # run-length compress the dense length array into cl ops
    dense = [lengths.get(s, 0) for s in range(alphabet_size)]
    last_nz = max(i for i, v in enumerate(dense) if v)
    ops: list[tuple[int, int, int]] = []  # (cl_sym, extra_bits, extra_val)
    prev = 8
    i = 0
    end = (last_nz + 1) if use_max_symbol else alphabet_size
    while i < end:
        v = dense[i]
        run = 1
        while i + run < end and dense[i + run] == v:
            run += 1
        if v == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                ops.append((18, 7, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 10)
                ops.append((17, 3, take - 3))
                left -= take
            for _ in range(left):
                ops.append((0, 0, 0))
        else:
            left = run
            if v != prev:
                ops.append((v, 0, 0))
                prev = v
                left -= 1
            while left >= 3:
                take = min(left, 6)
                ops.append((16, 2, take - 3))
                left -= take
            for _ in range(left):
                ops.append((v, 0, 0))
        i += run
    # code-length code over the used cl symbols
    cl_freq: dict[int, int] = {}
    for s, _, _ in ops:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = choose_lengths(cl_freq)
    num_cl = 1 + max(_CL_ORDER.index(s) for s in cl_lengths)
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for idx in range(num_cl):
        bw.write(cl_lengths.get(_CL_ORDER[idx], 0), 3)
    cl_codes = canonical(cl_lengths)
    single_cl = len(cl_codes) == 1
    if use_max_symbol:
        bw.write(1, 1)
        val = len(ops) - 2
        assert val >= 0
        nbits = max(2, ((val.bit_length() + 1) // 2) * 2)
        bw.write((nbits - 2) // 2, 3)
        bw.write(val, nbits)
    else:
        bw.write(0, 1)
    for s, ebits, eval_ in ops:
        if not single_cl:
            ln, code = cl_codes[s]
            bw.write_code(code, ln)
        if ebits:
            bw.write(eval_, ebits)


def lz77_prefix(value: int) -> tuple[int, int, int]:
    """value -> (prefix symbol, n extra bits, extra value)."""
    if value <= 4:
        return value - 1, 0, 0
    for s in range(4, 40):
        extra = (s - 2) >> 1
        offset = (2 + (s & 1)) << extra
        if offset < value <= offset + (1 << extra):
            return s, extra, value - 1 - offset
    raise ValueError(f"value {value} too large")


# --------------------------------------------------------------------
# encoder: transforms (forward) + image streams
# --------------------------------------------------------------------

def _sub_px(p: int, q: int) -> int:
    """Per-channel (p - q) & 0xff."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((p >> sh) & 0xFF) - ((q >> sh) & 0xFF)) & 0xFF) << sh
    return out


def forward_predictor(
    pixels: list[int], xsize: int, ysize: int, bits: int, modes: list[int]
) -> list[int]:
    bw = _subsample(xsize, bits)
    out = [0] * len(pixels)
    for pos in range(len(pixels)):
        y, x = divmod(pos, xsize)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pixels[pos - 1]
        elif x == 0:
            pred = pixels[pos - xsize]
        else:
            mode = modes[(y >> bits) * bw + (x >> bits)]
            pred = _predict(
                mode,
                pixels[pos - 1],
                pixels[pos - xsize],
                pixels[pos - xsize - 1],
                pixels[pos - xsize + 1],
            )
        out[pos] = _sub_px(pixels[pos], pred)
    return out


def forward_color_transform(
    pixels: list[int], xsize: int, ysize: int, bits: int, ctes: list[int]
) -> list[int]:
    bw = _subsample(xsize, bits)
    out = [0] * len(pixels)
    for pos in range(len(pixels)):
        y, x = divmod(pos, xsize)
        cte = ctes[(y >> bits) * bw + (x >> bits)]
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        p = pixels[pos]
        g = (p >> 8) & 0xFF
        r0 = (p >> 16) & 0xFF
        b0 = p & 0xFF
        r = (r0 - _ct_delta(g2r, g)) & 0xFF
        b = (b0 - _ct_delta(g2b, g) - _ct_delta(r2b, r0)) & 0xFF
        out[pos] = (p & 0xFF00FF00) | (r << 16) | b
    return out


def forward_subtract_green(pixels: list[int]) -> list[int]:
    out = []
    for p in pixels:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        out.append((p & 0xFF00FF00) | (r << 16) | b)
    return out


def encode_image_stream(
    bw: BitWriter,
    pixels: list[int],
    xsize: int,
    ysize: int,
    *,
    cache_bits: int = 0,
    lz77: bool = False,
    plane_codes: bool = False,
    meta_bits: int | None = None,
    use_max_symbol: bool = False,
    is_level0: bool = True,
) -> None:
    """Encode one image stream (no transforms here — the caller wrote
    the transform headers, the pre-transformed pixels, AND the
    transform-list terminator bit for level-0 streams)."""
    # color cache
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    # meta prefix groups
    n_groups = 1
    meta_xsize = 0
    if is_level0:
        if meta_bits is not None:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            meta_xsize = _subsample(xsize, meta_bits)
            meta_ysize = _subsample(ysize, meta_bits)
            n_groups = 2 if meta_xsize * meta_ysize > 1 else 1
            meta_px = [
                (((bx + by) % n_groups) << 8) | 0xFF000000
                for by in range(meta_ysize)
                for bx in range(meta_xsize)
            ]
            encode_image_stream(
                bw, meta_px, meta_xsize, meta_ysize, is_level0=False
            )
        else:
            bw.write(0, 1)

    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size if cache_size else None
    shift = 32 - cache_bits if cache_bits else 0

    def group_of(pos: int) -> int:
        if meta_bits is None or not is_level0 or n_groups == 1:
            return 0
        y, x = divmod(pos, xsize)
        return ((x >> meta_bits) + (y >> meta_bits)) % n_groups

    # tokenize
    tokens: list[tuple] = []  # per token: (group, kind, ...)
    n = len(pixels)
    pos = 0
    while pos < n:
        g = group_of(pos)
        px = pixels[pos]
        if lz77 and pos >= 1:
            run = 0
            while pos + run < n and pixels[pos + run] == pixels[pos - 1]:
                run += 1
            if run >= 3:
                run = min(run, 1000)
                tokens.append((g, "copy", run, 1))
                if cache is not None:
                    idx = ((W._HASH_MUL * pixels[pos - 1]) & 0xFFFFFFFF) >> shift
                    cache[idx] = pixels[pos - 1]
                pos += run
                continue
        if cache is not None:
            idx = ((W._HASH_MUL * px) & 0xFFFFFFFF) >> shift
            if cache[idx] == px:
                tokens.append((g, "cache", idx))
                pos += 1
                continue
            cache[idx] = px
        tokens.append((g, "lit", px))
        pos += 1

    # per-group frequencies
    galpha = 256 + 24 + cache_size
    freqs = [
        [dict() for _ in range(5)] for _ in range(n_groups)
    ]  # green,red,blue,alpha,dist

    def bump(d: dict, s: int) -> None:
        d[s] = d.get(s, 0) + 1

    for tok in tokens:
        g = tok[0]
        if tok[1] == "lit":
            px = tok[2]
            bump(freqs[g][0], (px >> 8) & 0xFF)
            bump(freqs[g][1], (px >> 16) & 0xFF)
            bump(freqs[g][2], px & 0xFF)
            bump(freqs[g][3], (px >> 24) & 0xFF)
        elif tok[1] == "copy":
            lsym, _, _ = lz77_prefix(tok[2])
            bump(freqs[g][0], 256 + lsym)
            dcode = 2 if plane_codes and tok[3] == 1 else tok[3] + 120
            dsym, _, _ = lz77_prefix(dcode)
            bump(freqs[g][4], dsym)
        else:
            bump(freqs[g][0], 256 + 24 + tok[2])

    codes = []
    for g in range(n_groups):
        gcodes = []
        for ci, alpha_size in enumerate((galpha, 256, 256, 256, 40)):
            f = freqs[g][ci]
            if not f:
                f = {0: 1}  # unused channel: 1-symbol simple code
            lens = choose_lengths(f)
            emit_prefix_code(bw, lens, alpha_size, use_max_symbol=use_max_symbol)
            gcodes.append(canonical(lens))
        codes.append(gcodes)

    def emit(g: int, chan: int, sym: int) -> None:
        table = codes[g][chan]
        if len(table) == 1:
            return  # zero-bit code
        ln, code = table[sym]
        bw.write_code(code, ln)

    for tok in tokens:
        g = tok[0]
        if tok[1] == "lit":
            px = tok[2]
            emit(g, 0, (px >> 8) & 0xFF)
            emit(g, 1, (px >> 16) & 0xFF)
            emit(g, 2, px & 0xFF)
            emit(g, 3, (px >> 24) & 0xFF)
        elif tok[1] == "copy":
            _, length, dist = tok[2], tok[2], tok[3]
            lsym, lebits, leval = lz77_prefix(length)
            emit(g, 0, 256 + lsym)
            if lebits:
                bw.write(leval, lebits)
            dcode = 2 if plane_codes and dist == 1 else dist + 120
            dsym, debits, deval = lz77_prefix(dcode)
            emit(g, 4, dsym)
            if debits:
                bw.write(deval, debits)
        else:
            emit(g, 0, 256 + 24 + tok[2])


def encode_vp8l(
    width: int,
    height: int,
    argb: list[int],
    *,
    cache_bits: int = 0,
    lz77: bool = False,
    plane_codes: bool = False,
    meta_bits: int | None = None,
    use_max_symbol: bool = False,
    subtract_green: bool = False,
    predictor: tuple[int, list[int]] | None = None,  # (bits, modes)
    color_transform: tuple[int, list[int]] | None = None,  # (bits, ctes)
    palette: bool = False,
) -> bytes:
    bw = BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if any((p >> 24) & 0xFF != 255 for p in argb) else 0, 1)
    bw.write(0, 3)  # version
    pixels = list(argb)
    xsize = width
    any_transform = False
    # stream order = forward application order (decoder inverts in
    # reverse read order)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        pixels = forward_subtract_green(pixels)
        any_transform = True
    if predictor is not None:
        bits, modes = predictor
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        pixels = forward_predictor(pixels, xsize, height, bits, modes)
        mode_px = [0xFF000000 | (m << 8) for m in modes]
        encode_image_stream(
            bw,
            mode_px,
            _subsample(xsize, bits),
            _subsample(height, bits),
            is_level0=False,
        )
        any_transform = True
    if color_transform is not None:
        bits, ctes = color_transform
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        pixels = forward_color_transform(pixels, xsize, height, bits, ctes)
        cte_px = [0xFF000000 | (c & 0x00FFFFFF) for c in ctes]
        encode_image_stream(
            bw,
            cte_px,
            _subsample(xsize, bits),
            _subsample(height, bits),
            is_level0=False,
        )
        any_transform = True
    if palette:
        colors = sorted(set(pixels))
        assert len(colors) <= 256, "palette too large"
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub_px(c, prev))
            prev = c
        encode_image_stream(bw, deltas, len(colors), 1, is_level0=False)
        idx_of = {c: i for i, c in enumerate(colors)}
        if len(colors) <= 2:
            xbits = 3
        elif len(colors) <= 4:
            xbits = 2
        elif len(colors) <= 16:
            xbits = 1
        else:
            xbits = 0
        packed_x = _subsample(xsize, xbits)
        bits_per = 8 >> xbits
        packed = [0] * (packed_x * height)
        for y in range(height):
            for x in range(xsize):
                idx = idx_of[pixels[y * xsize + x]]
                sh = (x & ((1 << xbits) - 1)) * bits_per
                packed[y * packed_x + (x >> xbits)] |= idx << (8 + sh)
        pixels = packed
        xsize = packed_x
        any_transform = True
    bw.write(0, 1)  # end of transform list (also the no-transform bit)
    encode_image_stream(
        bw,
        pixels,
        xsize,
        height,
        cache_bits=cache_bits,
        lz77=lz77,
        plane_codes=plane_codes,
        meta_bits=meta_bits,
        use_max_symbol=use_max_symbol,
        is_level0=True,
    )
    return b"\x2f" + bw.tobytes()


def wrap_riff(vp8l: bytes, extended: bool = False) -> bytes:
    chunks = b""
    if extended:
        vp8x = b"\x00\x00\x00\x00" + b"\x00\x00\x00" + b"\x00\x00\x00"
        chunks += b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x
    chunks += b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + chunks


def encode_webp(width: int, height: int, argb: list[int], **kw) -> bytes:
    extended = kw.pop("extended", False)
    return wrap_riff(encode_vp8l(width, height, argb, **kw), extended=extended)


# --------------------------------------------------------------------
# image generators
# --------------------------------------------------------------------

def _rand_image(w: int, h: int, seed: int, alpha: bool = True) -> list[int]:
    rng = random.Random(seed)
    out = []
    for _ in range(w * h):
        a = rng.randrange(256) if alpha else 255
        out.append(
            (a << 24)
            | (rng.randrange(256) << 16)
            | (rng.randrange(256) << 8)
            | rng.randrange(256)
        )
    return out


def _gradient_image(w: int, h: int) -> list[int]:
    out = []
    for y in range(h):
        for x in range(w):
            out.append(
                (255 << 24)
                | (((x * 7) & 0xFF) << 16)
                | (((y * 5) & 0xFF) << 8)
                | ((x + y) & 0xFF)
            )
    return out


def _decode_to_argb(data: bytes) -> tuple[int, int, list[int]]:
    w, h, c, rgba = W.webp_decode(data)
    assert c == 4
    px = []
    for i in range(w * h):
        r, g, b, a = rgba[4 * i : 4 * i + 4]
        px.append((a << 24) | (r << 16) | (g << 8) | b)
    return w, h, px


# --------------------------------------------------------------------
# roundtrip matrix
# --------------------------------------------------------------------

@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"cache_bits": 4},
        {"lz77": True},
        {"lz77": True, "plane_codes": True},
        {"lz77": True, "cache_bits": 3},
        {"use_max_symbol": True},
        {"subtract_green": True},
        {"subtract_green": True, "cache_bits": 2},
        {"meta_bits": 3},
        {"extended": True},
    ],
)
def test_roundtrip_random_images(kw):
    for seed, (w, h) in [(1, (13, 9)), (2, (16, 16)), (3, (1, 1)), (4, (31, 2))]:
        img = _rand_image(w, h, seed)
        dw, dh, out = _decode_to_argb(encode_webp(w, h, img, **kw))
        assert (dw, dh) == (w, h)
        assert out == img, f"seed={seed} kw={kw}"


def test_roundtrip_gradient_with_repeats():
    w, h = 24, 17
    img = _gradient_image(w, h)
    # inject runs so lz77 + cache actually fire
    for i in range(40, 80):
        img[i] = img[39]
    for kw in ({"lz77": True}, {"cache_bits": 5, "lz77": True}):
        _, _, out = _decode_to_argb(encode_webp(w, h, img, **kw))
        assert out == img


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 200])
def test_roundtrip_palette(n_colors):
    rng = random.Random(n_colors)
    colors = []
    seen = set()
    while len(colors) < n_colors:
        c = (255 << 24) | rng.randrange(1 << 24)
        if c not in seen:
            seen.add(c)
            colors.append(c)
    w, h = 21, 12  # 21 not divisible by the bundle widths; 252 >= 200
    img = [colors[rng.randrange(n_colors)] for _ in range(w * h)]
    for c in colors:  # every palette entry appears
        img[colors.index(c)] = c
    _, _, out = _decode_to_argb(encode_webp(w, h, img, palette=True))
    assert out == img


def test_roundtrip_predictor_all_modes():
    w, h = 32, 32
    bits = 3  # 8x8 blocks -> 16 blocks; cycle through all 14 modes
    bw, bh = _subsample(w, bits), _subsample(h, bits)
    modes = [(i % 14) for i in range(bw * bh)]
    img = _gradient_image(w, h)
    _, _, out = _decode_to_argb(
        encode_webp(w, h, img, predictor=(bits, modes))
    )
    assert out == img


def test_roundtrip_predictor_with_subtract_green():
    w, h = 19, 11
    bits = 2
    bw, bh = _subsample(w, bits), _subsample(h, bits)
    modes = [(i % 14) for i in range(bw * bh)]
    img = _rand_image(w, h, 77)
    _, _, out = _decode_to_argb(
        encode_webp(w, h, img, subtract_green=True, predictor=(bits, modes))
    )
    assert out == img


def test_roundtrip_color_transform():
    w, h = 18, 10
    bits = 2
    bw, bh = _subsample(w, bits), _subsample(h, bits)
    # mixed positive/negative transform elements across blocks
    ctes = []
    for i in range(bw * bh):
        g2r = (16 + 3 * i) & 0xFF
        g2b = (-10 - i) & 0xFF
        r2b = (5 * i - 64) & 0xFF
        ctes.append((r2b << 16) | (g2b << 8) | g2r)
    img = _rand_image(w, h, 5, alpha=False)
    _, _, out = _decode_to_argb(
        encode_webp(w, h, img, color_transform=(bits, ctes))
    )
    assert out == img


# --------------------------------------------------------------------
# decoder-independent pins (no encoder involved)
# --------------------------------------------------------------------

def test_distance_map_matches_spec_head():
    # First entries as printed in the spec's distance-map table
    expect = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1),
    ]
    assert _DIST_MAP[: len(expect)] == expect
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def test_predictor_modes_micro():
    # independent arithmetic on one channel-rich example
    L = 0x80402010
    T = 0x40201008
    TL = 0x20100804
    TR = 0xFF804020
    assert _predict(0, L, T, TL, TR) == 0xFF000000
    assert _predict(1, L, T, TL, TR) == L
    assert _predict(2, L, T, TL, TR) == T
    assert _predict(3, L, T, TL, TR) == TR
    assert _predict(4, L, T, TL, TR) == TL
    # avg2 is per-channel floor mean
    assert _avg2(0x02040608, 0x01010101) == 0x01020304
    # mode 12: per-channel clamp(L + T - TL)
    v = _predict(12, L, T, TL, TR)
    for sh in (24, 16, 8, 0):
        lc = (L >> sh) & 0xFF
        tc = (T >> sh) & 0xFF
        cc = (TL >> sh) & 0xFF
        assert ((v >> sh) & 0xFF) == max(0, min(255, lc + tc - cc))


def test_select_predictor_follows_manhattan_rule():
    # p = L+T-TL; choose the neighbor closest to p; spec tie-break
    # (`if (pL < pT) return L; else return T;`) selects T on a tie
    L, T, TL = 0xFF000000 | (100 << 16), 0xFF000000 | (90 << 16), 0xFF000000 | (95 << 16)
    # |p-L| = |T-TL| = 5 ; |p-T| = |L-TL| = 5 -> tie goes to T
    assert _predict(11, L, T, TL, 0) == T
    T2 = 0xFF000000 | (60 << 16)
    # |p-L|=|T2-TL|=35, |p-T2|=|L-TL|=5 -> T2 is closer
    assert _predict(11, L, T2, TL, 0) == T2
    L2 = 0xFF000000 | (80 << 16)
    # |p-L2|=|T-TL|=5 < |p-T|=|L2-TL|=15 -> L2 is closer
    assert _predict(11, L2, T, TL, 0) == L2


def test_cross_color_delta_is_signed_arithmetic():
    assert _ct_delta(16, 64) == (16 * 64) >> 5
    assert _ct_delta(0xF0, 64) == (-16 * 64) >> 5  # t is int8
    assert _ct_delta(16, 0xC0) == (16 * -64) >> 5  # c is int8
    assert _ct_delta(1, 1) == 0


def test_add_px_wraps_per_channel():
    # a: ff+01 wraps to 00, r: 00+01=01, g: ff+01 wraps, b: 01
    assert _add_px(0xFF00FF00, 0x01010101) == 0x00010001
    assert _add_px(0x80808080, 0x80808080) == 0x00000000
    assert _add_px(0x12345678, 0) == 0x12345678


# --------------------------------------------------------------------
# hand-built stream (fully independent of the encoder)
# --------------------------------------------------------------------

def test_hand_built_two_pixel_stream():
    """1x2 image, no transforms, no cache, simple codes everywhere:
    both pixels ARGB(0xff, r=2, g=1, b=0) then (0xff, 2, 1, 0) via a
    1-symbol code per channel — zero bits per pixel after headers."""
    bw = BitWriter()
    bw.write(1 - 1, 14)  # width-1
    bw.write(2 - 1, 14)  # height-1
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: simple, 1 symbol, value 1 (1-bit form)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
    # red: simple, 1 symbol, value 2 (8-bit form)
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(2, 8)
    # blue: simple, 1 symbol, value 0
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # alpha: simple, 1 symbol, value 255
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
    # distance: simple, 1 symbol, value 0
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    data = b"\x2f" + bw.tobytes()
    w, h, c, rgba = W.vp8l_decode(data)
    assert (w, h, c) == (1, 2, 4)
    assert rgba == bytes([2, 1, 0, 255] * 2)


def test_hand_built_lz77_plane_code():
    """2x2: one literal then a 3-pixel copy whose distance comes from
    the SHORT-DISTANCE MAP: distance prefix symbol 1 -> dcode 2 ->
    _DIST_MAP[1] = (dx=1, dy=0) -> distance 1. Pins the plane-code
    path through the decoder with no encoder involvement."""
    bw = BitWriter()
    bw.write(1, 14)  # width 2
    bw.write(1, 14)  # height 2
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green alphabet: literal 7 + copy-length symbol 256+2 (length 3);
    # 258 exceeds a simple code's 8-bit symbol range, so full form.
    emit_prefix_code(bw, {7: 1, 258: 1}, 256 + 24)
    emit_prefix_code(bw, {9: 1}, 256)    # red: single symbol, 0 bits
    emit_prefix_code(bw, {5: 1}, 256)    # blue
    emit_prefix_code(bw, {255: 1}, 256)  # alpha
    emit_prefix_code(bw, {1: 1}, 40)     # distance prefix symbol 1
    codes_green = canonical({7: 1, 258: 1})
    # token 1: literal (a=255, r=9, g=7, b=5); r/b/a codes cost 0 bits
    ln, code = codes_green[7]
    bw.write_code(code, ln)
    # token 2: copy length 3 (symbol 258, prefix value 3, no extra
    # bits); distance symbol 1 is the only one -> 0 bits, value 2
    ln, code = codes_green[258]
    bw.write_code(code, ln)
    data = b"\x2f" + bw.tobytes()
    w, h, c, rgba = W.vp8l_decode(data)
    assert (w, h) == (2, 2)
    px = [bytes(rgba[i * 4 : i * 4 + 4]) for i in range(4)]
    assert px[0] == bytes([9, 7, 5, 255])
    assert px[1] == px[0] and px[2] == px[0] and px[3] == px[0]


# --------------------------------------------------------------------
# container handling + quarantine
# --------------------------------------------------------------------

def test_container_variants_and_quarantine():
    img = _rand_image(4, 4, 9)
    data = encode_webp(4, 4, img, extended=True)
    _, _, out = _decode_to_argb(data)
    assert out == img

    with pytest.raises(ValueError, match="RIFF"):
        W.webp_decode(b"NOPE" + bytes(20))
    lossy = (
        b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (4).to_bytes(4, "little") + bytes(4)
    )
    with pytest.raises(ValueError, match="lossy VP8"):
        W.webp_decode(lossy)
    anim = (
        b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
        + b"ANIM" + (4).to_bytes(4, "little") + bytes(4)
    )
    with pytest.raises(ValueError, match="animated"):
        W.webp_decode(anim)


def test_corrupt_streams_raise_not_crash():
    img = _rand_image(8, 8, 11)
    good = encode_webp(8, 8, img)
    # truncations at many points must raise ValueError, never crash
    for cut in range(12, len(good), 7):
        with pytest.raises(ValueError):
            W.webp_decode(good[:cut])
    # bad signature byte
    bad = bytearray(good)
    sig_at = bad.index(b"VP8L") + 8
    bad[sig_at] = 0x2E
    with pytest.raises(ValueError, match="signature"):
        W.webp_decode(bytes(bad))
    # bad version (flip a version bit: byte after 28 bits of w/h +
    # alpha bit -> bits 29..31 live in the 4th byte after signature)
    bad = bytearray(good)
    bad[sig_at + 4] |= 0x80
    with pytest.raises(ValueError):
        W.webp_decode(bytes(bad))


def test_copy_before_any_pixel_rejected():
    """A 1x1 stream whose first green symbol is a COPY (length code)
    references pixels before any exist — must raise, not crash or
    read garbage."""
    bw = BitWriter()
    bw.write(0, 14)  # width 1
    bw.write(0, 14)  # height 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    emit_prefix_code(bw, {258: 1, 100: 1}, 256 + 24)
    emit_prefix_code(bw, {0: 1}, 256)
    emit_prefix_code(bw, {0: 1}, 256)
    emit_prefix_code(bw, {0: 1}, 256)
    emit_prefix_code(bw, {1: 1}, 40)
    codes = canonical({258: 1, 100: 1})
    ln, code = codes[258]
    bw.write_code(code, ln)  # copy length 3 at pos 0
    with pytest.raises(ValueError):
        W.vp8l_decode(b"\x2f" + bw.tobytes())


# --------------------------------------------------------------------
# golden fixtures (lossless: golden == original pixels)
# --------------------------------------------------------------------

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "webp")


@pytest.mark.parametrize(
    "name",
    ["gradient_rgb", "random_rgba", "palette_16", "predictor_mix"],
)
def test_golden_fixtures(name):
    webp_path = os.path.join(_FIX, f"{name}.webp")
    npy_path = os.path.join(_FIX, f"{name}.npy")
    if not os.path.exists(webp_path):
        pytest.skip("fixtures not generated")
    with open(webp_path, "rb") as f:
        data = f.read()
    w, h, c, rgba = W.webp_decode(data)
    expect = np.load(npy_path)
    got = np.frombuffer(rgba, dtype=np.uint8).reshape(h, w, 4)
    assert got.shape == expect.shape
    assert np.array_equal(got, expect)


def test_pil_crosscheck_if_available():
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not installed")
    import io  # pragma: no cover

    img = _rand_image(10, 7, 3)  # pragma: no cover
    data = encode_webp(10, 7, img)  # pragma: no cover
    ours = _decode_to_argb(data)[2]  # pragma: no cover
    pil = Image.open(io.BytesIO(data)).convert("RGBA")  # pragma: no cover
    raw = pil.tobytes()  # pragma: no cover
    theirs = [  # pragma: no cover
        (raw[4 * i + 3] << 24) | (raw[4 * i] << 16) | (raw[4 * i + 1] << 8) | raw[4 * i + 2]
        for i in range(70)
    ]
    assert ours == theirs  # pragma: no cover


# --------------------------------------------------------------------
# Spark integration (mirrors the JPEG codec's integration tests)
# --------------------------------------------------------------------

def test_decode_image_routes_webp_and_audit_reports_ok(spark):
    from gem_data_wrangle_spark.operators import multimodal as M

    img = _gradient_image(9, 7)
    payload = encode_webp(9, 7, img)
    w, h, c, pix = M.decode_image(payload)
    assert (w, h, c) == (9, 7, 4)

    lossy = (
        b"RIFF" + (24).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (12).to_bytes(4, "little")
        + bytes(3) + b"\x9d\x01\x2a" + (64).to_bytes(2, "little")
        + (48).to_bytes(2, "little") + bytes(2)
    )
    rows = [(1, bytearray(payload)), (2, bytearray(lossy))]
    df = spark.createDataFrame(rows, "id int, media binary")
    audit = {
        (r["format"], r["decode_status"]): r["n"]
        for r in M.decode_capability_audit(df).collect()
    }
    # subtype-refined labels (VERDICT r7 item 8): the decodable
    # lossless share and the quarantined lossy share are separate rows
    assert audit[("webp-vp8l", "ok")] == 1
    assert audit[("webp-vp8", "undecodable")] == 1


def test_audit_splits_webp_subtypes(spark):
    """Fixture-backed quarantine shares: lossless decodes, lossy and
    animated quarantine under their own labels."""
    from gem_data_wrangle_spark.operators import multimodal as M
    from gem_data_wrangle_spark.operators.webp_codec import webp_subtype

    lossless = encode_webp(5, 4, _gradient_image(5, 4))
    lossy = (
        b"RIFF" + (24).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (12).to_bytes(4, "little")
        + bytes(3) + b"\x9d\x01\x2a" + (64).to_bytes(2, "little")
        + (48).to_bytes(2, "little") + bytes(2)
    )
    anim = (
        b"RIFF" + (46).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + (10).to_bytes(4, "little")
        + bytes([0x02]) + bytes(3)          # ANIM flag
        + (63).to_bytes(3, "little") + (47).to_bytes(3, "little")
        + b"ANIM" + (6).to_bytes(4, "little") + bytes(6)
    )
    assert webp_subtype(lossless) == "webp-vp8l"
    assert webp_subtype(lossy) == "webp-vp8"
    assert webp_subtype(anim) == "webp-anim"
    assert webp_subtype(b"\x89PNG\r\n\x1a\n") is None

    df = spark.createDataFrame(
        [(1, bytearray(lossless)), (2, bytearray(lossy)), (3, bytearray(anim))],
        "id int, media binary",
    )
    audit = {
        (r["format"], r["decode_status"]): r["n"]
        for r in M.decode_capability_audit(df).collect()
    }
    assert audit[("webp-vp8l", "ok")] == 1
    assert audit[("webp-vp8", "undecodable")] == 1
    assert audit[("webp-anim", "undecodable")] == 1


def test_extract_pixel_features_decodes_webp_corpus(spark):
    """Full Spark path: WebP payloads through the Arrow-batched
    mapInPandas feature extractor — real pixel stats, no quarantine."""
    from gem_data_wrangle_spark.operators import multimodal as M

    rows = []
    for i, val in enumerate((32, 96, 160)):
        img = [(255 << 24) | (val << 16) | (val << 8) | val] * (8 * 6)
        rows.append((i, bytearray(encode_webp(8, 6, img)), "image/webp", None, None))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["id"]: r for r in M.extract_pixel_features(media).collect()}
    for i, val in enumerate((32, 96, 160)):
        r = got[i]
        assert r["decode_status"] == "ok"
        assert (r["width"], r["height"], r["channels"]) == (8, 6, 4)
        # RGBA flat image: mean over (val, val, val, 255)
        assert abs(r["mean_intensity"] - (3 * val + 255) / 4) < 1e-9


def test_image_dimensions_parses_webp_headers(spark):
    from gem_data_wrangle_spark.operators import multimodal as M

    vp8l = encode_webp(33, 21, _gradient_image(33, 21))
    lossy = (
        b"RIFF" + (24).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (12).to_bytes(4, "little")
        + bytes(3) + b"\x9d\x01\x2a" + (640).to_bytes(2, "little")
        + (480).to_bytes(2, "little") + bytes(2)
    )
    vp8x_body = bytes(4) + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
    vp8x = (
        b"RIFF" + (12 + len(vp8x_body)).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + len(vp8x_body).to_bytes(4, "little") + vp8x_body + bytes(10)
    )
    rows = [(1, bytearray(vp8l)), (2, bytearray(lossy)), (3, bytearray(vp8x))]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    got = {r["id"]: r for r in M.image_dimensions(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("webp", 33, 21)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("webp", 640, 480)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("webp", 100, 50)


def test_webp_corrupted_streams_raise_valueerror_only():
    """Quarantine contract (same as JPEG/PNG): corrupt payloads must
    raise ValueError, never IndexError/KeyError that would crash an
    Arrow batch task — truncations at every offset + seeded flips."""
    img = _rand_image(12, 10, 21)
    payload = encode_webp(12, 10, img, cache_bits=3, lz77=True)
    for cut in range(0, len(payload), 5):
        try:
            W.webp_decode(payload[:cut])
        except ValueError:
            pass
    rng = random.Random(8)
    for _ in range(300):
        b = bytearray(payload)
        b[rng.randrange(12, len(payload))] = rng.randrange(256)
        try:
            W.webp_decode(bytes(b))
        except ValueError:
            pass
