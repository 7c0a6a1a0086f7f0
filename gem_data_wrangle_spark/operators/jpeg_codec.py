"""JPEG (ITU-T T.81 / ISO-IEC 10918-1) decoder — stdlib + numpy.

Public-spec implementation: marker grammar (T.81 Annex B), canonical
Huffman entropy decoding (Annex F.2), dequantization + 8×8 inverse DCT
reconstruction (A.3.3), YCbCr→RGB (JFIF). Scope — the honest,
documented subset:

- baseline sequential DCT (SOF0; SOF1 accepted — same entropy coding),
  8-bit precision;
- progressive DCT (SOF2, Huffman): spectral selection + successive
  approximation — interleaved/non-interleaved DC first+refine scans,
  per-component AC first scans with EOB-run coding, and the AC
  refinement correction-bit procedure (T.81 G.1.2.3/G.2);
- 1-component greyscale and 3-component YCbCr at any sampling factors
  (4:4:4, 4:2:2, 4:2:0 covered by tests); restart intervals (DRI/RSTn);
- hierarchical, arithmetic-coded, lossless, and 12-bit streams raise
  ``ValueError`` — `multimodal.decode_capability_audit` then reports
  them as quarantined instead of silently NULLing.

Split of labor, same policy as ``png_codec``: the bit-serial Huffman
loop is pure Python (a true sequential dependency — each coefficient's
length is unknown until the previous one is decoded), while everything
per-block after entropy decode (dequant, IDCT, level shift, chroma
upsample, color transform) is vectorized numpy over ALL blocks at
once. PIL is preferred whenever installed (``multimodal.decode_image``);
this exists so the dominant web-corpus container *works* without it.

Reference parity note: the reference repo (R/dplyr ETL) has no media
operators; this belongs to the LLM-corpus extension surface
(BASELINE.json multimodal columns).
"""

from __future__ import annotations

import struct

try:
    import numpy as _np

    _HAVE_NUMPY = True
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None
    _HAVE_NUMPY = False

# zigzag scan order (T.81 Figure A.6): _ZIGZAG[k] = natural-order index
# of the k-th coefficient in the scan.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman table (T.81 Annex C): {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=64)
def _huff_lut(counts: bytes, symbols: bytes) -> tuple[list[int], list[int]]:
    """16-bit-prefix lookup tables for one Huffman table: peek 16 bits,
    one list index yields (symbol, code length) — ~20× the bit-serial
    walk. Codes partition the prefix space, so the build is 65,536
    slice-assigned entries per table; lru_cache reuses them across
    images (encoders emit the same Annex-K-style tables corpus-wide).
    A zero length marks an invalid prefix."""
    lut_sym = [0] * 65536
    lut_len = [0] * 65536
    for (length, code), sym in _build_huffman(list(counts), symbols).items():
        base = code << (16 - length)
        span = 1 << (16 - length)
        lut_sym[base : base + span] = [sym] * span
        lut_len[base : base + span] = [length] * span
    return lut_sym, lut_len


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Pre-unstuff the scan's entropy data (T.81 F.1.2.3): one pass
    strips 0xFF00 stuffing and splits at RSTn markers, so the bit
    reader's hot fill needs zero per-byte branching. Returns the
    restart segments and the offset of the terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:  # stuffed 0xFF data byte
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker terminates the scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


class _BitReader:
    """MSB-first bit reader over one pre-unstuffed entropy segment;
    exhausted input pads with 1-bits (spec fill bits).

    The accumulator is truncated to the unconsumed bits after every
    read, so it stays a small (<48-bit) int: fills add ≤32 bits and
    reads mask the consumed prefix off. Without the mask the acc only
    ever grows, turning every shift into an O(stream-length) bigint op
    and the whole decode quadratic (measured 21 s for a 512×512 noisy
    grey image; bounded, the same image decodes in milliseconds)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        take = self.data[self.pos : self.pos + 4]
        if take:
            self.acc = (self.acc << (8 * len(take))) | int.from_bytes(take, "big")
            self.nbits += 8 * len(take)
            self.pos += len(take)
        else:
            self.acc = (self.acc << 16) | 0xFFFF
            self.nbits += 16

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def decode_huffman(self, lut_sym: list[int], lut_len: list[int]) -> int:
        if self.nbits < 16:
            self._fill()
            if self.nbits < 16:
                self._fill()
        idx = (self.acc >> (self.nbits - 16)) & 0xFFFF
        length = lut_len[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in scan")
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return lut_sym[idx]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to the signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# cached 8×8 DCT-II basis; IDCT(block) = C.T @ block @ C (A.3.3)
_DCT_C = None


def _dct_matrix():
    global _DCT_C  # noqa: PLW0603 — module-level cache
    if _DCT_C is None:
        x = _np.arange(8)
        u = x.reshape(8, 1)
        c = _np.cos((2 * x + 1) * u * _np.pi / 16) * 0.5
        c[0, :] *= 1 / _np.sqrt(2)
        _DCT_C = c
    return _DCT_C


class _Component:
    __slots__ = (
        "cid", "h", "v", "tq", "td", "ta", "pred", "blocks", "bw", "bh",
        "coefs", "cw8", "ch8",
    )

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.pred = 0
        self.blocks: list = []  # zigzag coefficient rows, MCU order
        self.bw = self.bh = 0
        # progressive state: raster-order coefficient grid (natural
        # zigzag-index rows, bw*bh blocks) accumulated across scans,
        # and the component's own non-interleaved block dims (ceil of
        # its sample dims — smaller than the MCU-padded bw/bh)
        self.coefs: list | None = None
        self.cw8 = self.ch8 = 0


def jpeg_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG → ``(width, height, channels, samples)``
    with samples row-major, interleaved for 3-channel RGB.

    Raises ``ValueError`` on anything outside the documented scope —
    including truncated or bit-corrupted streams: low-level parse
    failures (struct/index errors) are re-raised as ``ValueError`` so
    the Arrow-batched callers' quarantine catches them instead of a
    corrupt blob crashing the task (fuzzed with truncation at every
    offset and random byte flips, tests/test_jpeg_codec.py).
    """
    if not _HAVE_NUMPY:
        raise ValueError("JPEG decode requires numpy (or install PIL)")
    try:
        return _jpeg_decode_inner(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as exc:
        raise ValueError(f"corrupt JPEG stream: {type(exc).__name__}") from exc


def _jpeg_decode_inner(payload: bytes) -> tuple[int, int, int, bytes]:
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")

    qt: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    pos = 2
    n = len(payload)

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no length
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2:  # a crafted 0/1 length would stall the marker walk
            raise ValueError(f"invalid segment length {seglen}")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq_id = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    qt[tq_id] = list(seg[i : i + 64])
                    i += 64
                else:
                    qt[tq_id] = list(
                        struct.unpack(f">{64}H", seg[i : i + 128])
                    )
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = seg[i + 17 : i + 17 + nsym]
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_lut(
                    bytes(counts), bytes(symbols)
                )
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            for ci in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * ci : 9 + 3 * ci]
                h_i, v_i = hv >> 4, hv & 0x0F
                if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                    raise ValueError(f"invalid sampling factors {h_i}x{v_i}")
                comps.append(_Component(cid, h_i, v_i, tq_id))
            if width == 0 or height == 0:
                raise ValueError("zero frame dimensions")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if progressive:
                scan_comps = []
                for si in range(ns):
                    cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                    for c in comps:
                        if c.cid == cs:
                            c.td, c.ta = tdta >> 4, tdta & 0x0F
                            scan_comps.append(c)
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                ah, al_ = ahal >> 4, ahal & 0x0F
                pos += seglen
                pos = _decode_progressive_scan(
                    payload, pos, comps, scan_comps, dc_tables, ac_tables,
                    ss, se, ah, al_, width, height, restart_interval,
                )
                continue
            # T.81 allows baseline non-interleaved scans (ns=1 per
            # component over several scans); decoding them as if
            # interleaved would produce garbage pixels, so keep the
            # decode-or-quarantine contract honest and refuse.
            if ns != len(comps):
                raise ValueError(
                    "non-interleaved baseline scan not supported "
                    f"(scan has {ns} of {len(comps)} components)"
                )
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                for c in comps:
                    if c.cid == cs:
                        c.td, c.ta = tdta >> 4, tdta & 0x0F
            pos += seglen
            pos = _decode_scan(
                payload, pos, comps, dc_tables, ac_tables,
                width, height, restart_interval,
            )
            continue
        pos += seglen

    if not comps or not width:
        raise ValueError("truncated JPEG (no frame decoded)")
    if progressive:
        # reorder each component's raster coefficient grid into the MCU
        # scan order _reconstruct expects: (my, mx, by, bx)
        for c in comps:
            if c.coefs is None:
                raise ValueError("truncated progressive JPEG (no scan decoded)")
            mcus_x = c.bw // c.h
            c.blocks = [
                c.coefs[(my * c.v + by) * c.bw + (mx * c.h + bx)]
                for my in range(c.bh // c.v)
                for mx in range(mcus_x)
                for by in range(c.v)
                for bx in range(c.h)
            ]
    return _reconstruct(comps, qt, width, height)


def _decode_scan(
    data: bytes,
    pos: int,
    comps: list[_Component],
    dc_tables: dict,
    ac_tables: dict,
    width: int,
    height: int,
    restart_interval: int,
) -> int:
    """Baseline interleaved scan (T.81 F.2.2): Huffman-decode every
    MCU's blocks into per-component zigzag coefficient lists."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        c.bw = mcus_x * c.h
        c.bh = mcus_y * c.v
        c.pred = 0
        c.blocks = []

    segs, end_pos = _split_entropy(data, pos)
    reader = _BitReader(segs[0])
    seg_idx = 0
    mcu_count = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment in scan")
                reader = _BitReader(segs[seg_idx])
                for c in comps:
                    c.pred = 0
            for c in comps:
                dct = dc_tables.get(c.td)
                act = ac_tables.get(c.ta)
                if dct is None or act is None:
                    raise ValueError("missing Huffman table for scan")
                for _b in range(c.h * c.v):
                    c.blocks.append(_decode_block(reader, c, dct, act))
            mcu_count += 1
    return end_pos


def _init_progressive_grids(
    comps: list[_Component], width: int, height: int
) -> None:
    """Allocate each component's raster coefficient grid on the first
    scan: MCU-padded block dims (interleaved DC scans touch every MCU
    block) plus the component's own ceil-sample dims that bound
    non-interleaved scans (T.81 A.2.2 — padding blocks are NOT coded
    in a non-interleaved scan and stay zero)."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        if c.coefs is not None:
            continue
        c.bw = mcus_x * c.h
        c.bh = mcus_y * c.v
        cw = -(-(width * c.h) // hmax)   # component sample dims (A.1.1)
        ch = -(-(height * c.v) // vmax)
        c.cw8 = -(-cw // 8)
        c.ch8 = -(-ch // 8)
        c.coefs = [[0] * 64 for _ in range(c.bw * c.bh)]


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    comps: list[_Component],
    scan_comps: list[_Component],
    dc_tables: dict,
    ac_tables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    width: int,
    height: int,
    restart_interval: int,
) -> int:
    """One progressive scan (T.81 G.2): DC scans (Ss=0) may interleave
    several components per MCU; AC scans (Ss>0) are single-component
    and traverse that component's own block grid in raster order.
    First scans (Ah=0) establish coefficient values at Al-shifted
    precision; refinement scans (Ah=Al+1) add one magnitude bit via
    the correction-bit procedure. EOB-run codes span blocks within a
    restart segment."""
    if not comps or not width:
        raise ValueError("progressive scan before SOF2")
    if not scan_comps:
        raise ValueError("scan selects no frame component")
    _init_progressive_grids(comps, width, height)
    segs, end_pos = _split_entropy(data, pos)
    reader = _BitReader(segs[0])
    seg_idx = 0
    state = {"eobrun": 0}
    for c in scan_comps:
        c.pred = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        hmax = max(c.h for c in comps)
        vmax = max(c.v for c in comps)
        if len(scan_comps) > 1:
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            n_units = mcus_x * mcus_y
        else:
            c0 = scan_comps[0]
            n_units = c0.cw8 * c0.ch8
    else:  # AC scan: exactly one component (T.81 G.1.1.1.1)
        if len(scan_comps) != 1:
            raise ValueError("AC progressive scan must be single-component")
        if not (1 <= ss <= se <= 63):
            raise ValueError(f"invalid spectral band {ss}..{se}")
        c0 = scan_comps[0]
        n_units = c0.cw8 * c0.ch8

    unit = 0
    while unit < n_units:
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment in scan")
            reader = _BitReader(segs[seg_idx])
            state["eobrun"] = 0
            for c in scan_comps:
                c.pred = 0
        if ss == 0 and len(scan_comps) > 1:
            my, mx = divmod(unit, mcus_x)
            for c in scan_comps:
                dct = dc_tables.get(c.td)
                if ah == 0 and dct is None:
                    raise ValueError("missing DC Huffman table for scan")
                for by in range(c.v):
                    for bx in range(c.h):
                        block = c.coefs[(my * c.v + by) * c.bw + (mx * c.h + bx)]
                        _dc_prog(reader, c, block, dct, ah, al)
        elif ss == 0:
            c = scan_comps[0]
            dct = dc_tables.get(c.td)
            if ah == 0 and dct is None:
                raise ValueError("missing DC Huffman table for scan")
            by, bx = divmod(unit, c.cw8)
            block = c.coefs[by * c.bw + bx]
            _dc_prog(reader, c, block, dct, ah, al)
        else:
            c = scan_comps[0]
            act = ac_tables.get(c.ta)
            if act is None:
                raise ValueError("missing AC Huffman table for scan")
            by, bx = divmod(unit, c.cw8)
            block = c.coefs[by * c.bw + bx]
            if ah == 0:
                _ac_prog_first(reader, block, act, ss, se, al, state)
            else:
                _ac_prog_refine(reader, block, act, ss, se, al, state)
        unit += 1
    return end_pos


def _dc_prog(
    reader: _BitReader, c: _Component, block: list, dct: tuple | None, ah: int, al: int
) -> None:
    """DC coefficient, progressive: first scan decodes the Al-shifted
    prediction difference (G.2 / F.2.2.1); a refinement scan is one
    correction bit for bit position Al."""
    if ah == 0:
        dc_sym, dc_len = dct
        t = reader.decode_huffman(dc_sym, dc_len)
        if t:
            v = reader.read_bits(t)
            c.pred += _extend(v, t)
        block[0] = c.pred << al
    elif reader.read_bits(1):
        block[0] |= 1 << al


def _ac_prog_first(
    reader: _BitReader, block: list, act: tuple, ss: int, se: int, al: int, state: dict
) -> None:
    """AC band, first progressive scan (G.1.2.2): baseline run-length
    coding extended with EOBn codes — symbol (r, 0) with r<15 declares
    an End-Of-Band run of 2^r (+ r extension bits) blocks whose band
    is entirely zero from here on."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    ac_sym, ac_len = act
    k = ss
    while k <= se:
        rs = reader.decode_huffman(ac_sym, ac_len)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros inside the band
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive band")
        v = reader.read_bits(s)
        block[k] = _extend(v, s) << al
        k += 1


def _ac_prog_refine(
    reader: _BitReader, block: list, act: tuple, ss: int, se: int, al: int, state: dict
) -> None:
    """AC band refinement (G.1.2.3): each already-nonzero coefficient
    in the band receives one correction bit as the scan passes over
    it; symbols insert newly-significant ±2^Al coefficients after a
    run of zero-history positions; EOBn covers whole blocks whose
    remaining nonzero coefficients still receive correction bits."""
    p1 = 1 << al
    m1 = -p1
    ac_sym, ac_len = act
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_huffman(ac_sym, ac_len)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                # r == 15: pass over 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude category")
                newval = p1 if reader.read_bits(1) else m1
            while k <= se:
                if block[k] != 0:
                    if reader.read_bits(1) and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                block[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if block[k] != 0 and reader.read_bits(1) and (block[k] & p1) == 0:
                block[k] += p1 if block[k] > 0 else m1
            k += 1
        state["eobrun"] -= 1


def _decode_block(reader: _BitReader, c: _Component, dct: tuple, act: tuple) -> list[int]:
    coefs = [0] * 64
    dc_sym, dc_len = dct
    ac_sym, ac_len = act
    decode = reader.decode_huffman
    read_bits = reader.read_bits
    t = decode(dc_sym, dc_len)
    if t:
        v = read_bits(t)
        c.pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
    coefs[0] = c.pred
    k = 1
    while k < 64:
        rs = decode(ac_sym, ac_len)
        s = rs & 0x0F
        if s == 0:
            if rs == 0xF0:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("AC index overflow in block")
        v = read_bits(s)
        coefs[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        k += 1
    return coefs


def _reconstruct(
    comps: list[_Component], qt: dict, width: int, height: int
) -> tuple[int, int, int, bytes]:
    """Vectorized per-component reconstruction: dequant → IDCT over all
    blocks at once → plane assembly → upsample → color transform."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    cmat = _dct_matrix()
    inv_zig = _np.array(_ZIGZAG)
    planes = []
    for c in comps:
        if c.tq not in qt:
            raise ValueError(f"missing quant table {c.tq}")
        q = _np.array(qt[c.tq], dtype=_np.float64)  # zigzag order
        zz = _np.array(c.blocks, dtype=_np.float64)  # (nblocks, 64) zigzag
        if zz.size == 0:
            raise ValueError("empty scan for component")
        deq = zz * q
        nat = _np.zeros_like(deq)
        nat[:, inv_zig] = deq  # scatter zigzag → natural order
        blocks = nat.reshape(-1, 8, 8)
        spatial = _np.einsum("ux,nuv,vy->nxy", cmat, blocks, cmat) + 128.0
        # assemble the plane from MCU-ordered blocks in one transpose:
        # scan order is (my, mx, by, bx) → pixel order (my, by, row,
        # mx, bx, col)
        mcus_x = c.bw // c.h
        mcus_y = c.bh // c.v
        plane = (
            spatial.reshape(mcus_y, mcus_x, c.v, c.h, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(c.bh * 8, c.bw * 8)
        )
        # nearest-neighbor chroma upsample to the full sampling grid
        plane = _np.repeat(_np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        out = _np.clip(_np.round(planes[0]), 0, 255).astype(_np.uint8)
        return width, height, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = _np.stack([r, g, b], axis=-1)
    out = _np.clip(_np.round(rgb), 0, 255).astype(_np.uint8)
    return width, height, 3, out.tobytes()
