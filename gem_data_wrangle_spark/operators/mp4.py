"""ISO BMFF (MP4) container demux probe.

The corpus-pipeline question for a video column is rarely "decode the
frames" — it is "what IS this: codec, resolution, duration, sample
count, is it even intact?", answered from the moov box tree alone so a
100 TB crawl can be routed/filtered/quarantined without touching a
single mdat byte. This is a from-scratch box walker over the PUBLIC
ISO/IEC 14496-12 layout (box = 32-bit size + fourcc, ``size==1`` →
64-bit largesize, ``size==0`` → to EOF; full boxes carry
version/flags; tkhd stores width/height as 16.16 fixed point at the
END of its payload, which is version-stable), the same container the
reference never reads (its media surface stops at workbook columns —
extension, like the WAV/JPEG codecs).

Extends ``multimodal._parse_media_meta``'s shallow mvhd scan
(format + timescale only) with per-track handler/codec/dims/samples.
Malformed input NEVER throws across the batch: one corrupt blob in a
billion must not kill a task, so each row degrades to a
``probe_status`` of ``not_mp4`` / ``truncated`` with NULL fields.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the sibling boxes
    in buf[start:end]; raises ValueError on any size that escapes the
    parent — the caller maps that to ``truncated``."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = int.from_bytes(buf[pos : pos + 4], "big")
        typ = bytes(buf[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:  # to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("box overruns parent")
        yield typ, pos + hdr, pos + size
        pos += size


def _walk(buf: bytes, start: int, end: int, path: tuple[bytes, ...] = ()):
    for typ, a, b in _boxes(buf, start, end):
        yield path + (typ,), a, b
        if typ in _CONTAINERS:
            yield from _walk(buf, a, b, path + (typ,))


def probe_mp4_bytes(buf: bytes) -> dict:
    """Parse one buffer. Returns a dict matching MP4_PROBE_SCHEMA
    (minus id); probe_status in {'ok', 'not_mp4', 'truncated'}."""
    out = {
        "probe_status": "not_mp4",
        "brand": None,
        "duration_s": None,
        "n_tracks": None,
        "video_codec": None,
        "width": None,
        "height": None,
        "audio_codec": None,
        "n_samples": None,
    }
    try:
        top = list(_boxes(buf, 0, len(buf)))
    except (ValueError, IndexError):
        # can't even read the first header chain: if it LOOKS like an
        # mp4 (ftyp fourcc in slot one) call it truncated, else junk
        if len(buf) >= 8 and buf[4:8] == b"ftyp":
            out["probe_status"] = "truncated"
        return out
    if not top or top[0][0] != b"ftyp":
        return out
    out["brand"] = buf[top[0][1] : top[0][1] + 4].decode("latin1")
    try:
        tracks: list[dict] = []
        cur: dict = {}
        n_samples = 0
        saw_stsz = False
        for path, a, b in _walk(buf, 0, len(buf)):
            typ = path[-1]
            plen = b - a
            if typ == b"mvhd":
                # bounds-check the full-box payload BEFORE indexing: an
                # empty mvhd ending at EOF made buf[a] raise IndexError
                # (ADVICE r7) — the contract is degrade, never throw
                if plen >= 1 and buf[a] == 1 and plen >= 32:
                    ts = int.from_bytes(buf[a + 20 : a + 24], "big")
                    dur = int.from_bytes(buf[a + 24 : a + 32], "big")
                elif plen >= 20 and buf[a] != 1:
                    ts = int.from_bytes(buf[a + 12 : a + 16], "big")
                    dur = int.from_bytes(buf[a + 16 : a + 20], "big")
                else:
                    ts = dur = 0
                if ts:
                    out["duration_s"] = round(dur / ts, 3)
            elif typ == b"trak":
                cur = {}
                tracks.append(cur)
            elif typ == b"tkhd" and plen >= 8:
                # width/height: 16.16 fixed, LAST 8 payload bytes in
                # both v0 and v1 layouts; a shorter payload would read
                # the box's own header bytes as dims — skip it
                cur["width"] = int.from_bytes(buf[b - 8 : b - 4], "big") >> 16
                cur["height"] = int.from_bytes(buf[b - 4 : b], "big") >> 16
            elif typ == b"hdlr":
                cur["handler"] = bytes(buf[a + 8 : a + 12])
            elif typ == b"stsd":
                # ver/flags 4B + entry_count 4B, then first sample
                # entry: 4B size + 4B codec fourcc
                cur["codec"] = buf[a + 12 : a + 16].decode("latin1")
            elif typ == b"stsz":
                n_samples += int.from_bytes(buf[a + 8 : a + 12], "big")
                saw_stsz = True
        out["n_tracks"] = len(tracks)
        for t in tracks:
            if t.get("handler") == b"vide" and out["video_codec"] is None:
                out["video_codec"] = t.get("codec")
                if t.get("width"):
                    out["width"] = t["width"]
                    out["height"] = t.get("height")
            elif t.get("handler") == b"soun" and out["audio_codec"] is None:
                out["audio_codec"] = t.get("codec")
        out["n_samples"] = n_samples if saw_stsz else None
        out["probe_status"] = "ok"
    except (ValueError, IndexError):
        return {**{k: None for k in out}, "probe_status": "truncated"}
    return out


def _u32(buf: bytes, p: int) -> int:
    if p + 4 > len(buf):
        raise ValueError("truncated field")
    return int.from_bytes(buf[p : p + 4], "big")


def _u64(buf: bytes, p: int) -> int:
    if p + 8 > len(buf):
        raise ValueError("truncated field")
    return int.from_bytes(buf[p : p + 8], "big")


_MAX_SAMPLES = 1_000_000  # adversarial-input bound per track


def _top_boxes_lenient(buf: bytes) -> list[tuple[bytes, int, int]]:
    """Top-level siblings, LENIENT: a final box whose declared size
    escapes the buffer (classic truncated-mdat download) is dropped
    instead of poisoning the scan — moov usually precedes mdat, so the
    sample table survives a cut tail."""
    pos, n, out = 0, len(buf), []
    while pos + 8 <= n:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        typ = bytes(buf[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > n:
                break
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = n - pos
        if size < hdr or pos + size > n:
            break
        out.append((typ, pos + hdr, pos + size))
        pos += size
    return out


def mp4_video_sample_table(buf: bytes) -> list[dict]:
    """Reconstruct the VIDEO track's per-sample layout from the four
    interlocking stbl tables (ISO/IEC 14496-12 §8.6-8.7) — the walk a
    real demuxer does before it can read one frame:

    * ``stts`` (decode deltas, run-length) → cumulative ``dt_ticks``
      in the track timescale;
    * ``stsz`` (per-sample or uniform sizes);
    * ``stsc`` (first_chunk → samples-per-chunk runs) → each sample's
      chunk;
    * ``stco``/``co64`` (chunk file offsets) + within-chunk size
      prefix-sum → each sample's absolute ``file_offset``;
    * ``stss`` (sync table; absent ⇒ every sample is sync) →
      ``is_sync``.

    Returns one dict per sample: ``sample_idx`` (0-based),
    ``chunk_idx`` (0-based), ``file_offset``, ``size``, ``dt_ticks``,
    ``is_sync`` — truncated to the shortest consistent table (a
    malformed file yields the samples all four tables agree on, or
    ``[]``; never raises). Sample count is capped at 1e6 so a crafted
    header cannot balloon one row into gigabytes of output.
    """
    try:
        top = _top_boxes_lenient(buf)
        if not top or top[0][0] != b"ftyp":
            return []
        tracks: list[dict] = []
        cur: dict = {}
        for path, a, b in (
            (p, x, y)
            for t0, a0, b0 in top
            if t0 in _CONTAINERS
            for p, x, y in _walk(buf, a0, b0, (t0,))
        ):
            typ = path[-1]
            if typ == b"trak":
                cur = {}
                tracks.append(cur)
            elif typ == b"hdlr" and b - a >= 12:
                cur["handler"] = bytes(buf[a + 8 : a + 12])
            elif typ in (b"stts", b"stsz", b"stsc", b"stco", b"co64", b"stss"):
                cur[typ] = (a, b)
        vid = next((t for t in tracks if t.get("handler") == b"vide"), None)
        if vid is None or b"stsz" not in vid or b"stsc" not in vid:
            return []
        if b"stco" not in vid and b"co64" not in vid:
            return []

        # stsz → sizes[]
        a, b = vid[b"stsz"]
        uniform, count = _u32(buf, a + 4), _u32(buf, a + 8)
        count = min(count, _MAX_SAMPLES)
        if uniform:
            sizes = [uniform] * count
        else:
            sizes = [_u32(buf, a + 12 + 4 * j) for j in range(count)
                     if a + 16 + 4 * j <= b]

        # stts → cumulative decode ticks (pad with the last delta if
        # the run-lengths cover fewer samples than stsz claims)
        dts: list[int] = []
        t = 0
        if b"stts" in vid:
            a, b = vid[b"stts"]
            n_ent = _u32(buf, a + 4)
            delta = 0
            for e in range(n_ent):
                p = a + 8 + 8 * e
                if p + 8 > b:
                    break
                n, delta = _u32(buf, p), _u32(buf, p + 4)
                for _ in range(min(n, _MAX_SAMPLES - len(dts))):
                    dts.append(t)
                    t += delta
            while len(dts) < len(sizes) and len(dts) < _MAX_SAMPLES:
                dts.append(t)
                t += delta
        else:
            dts = [0] * len(sizes)

        # stco/co64 → chunk offsets
        if b"co64" in vid:
            a, b = vid[b"co64"]
            n_ch = _u32(buf, a + 4)
            offs = [_u64(buf, a + 8 + 8 * c) for c in range(n_ch)
                    if a + 16 + 8 * c <= b]
        else:
            a, b = vid[b"stco"]
            n_ch = _u32(buf, a + 4)
            offs = [_u32(buf, a + 8 + 4 * c) for c in range(n_ch)
                    if a + 12 + 4 * c <= b]

        # stsc runs → samples-per-chunk for each chunk (1-based runs)
        a, b = vid[b"stsc"]
        n_ent = _u32(buf, a + 4)
        runs = []
        for e in range(n_ent):
            p = a + 8 + 12 * e
            if p + 12 > b:
                break
            runs.append((_u32(buf, p), _u32(buf, p + 4)))
        runs.sort()

        # stss → sync set (1-based sample numbers)
        sync: set[int] | None = None
        if b"stss" in vid:
            a, b = vid[b"stss"]
            n_ent = _u32(buf, a + 4)
            sync = {_u32(buf, a + 8 + 4 * e) for e in range(n_ent)
                    if a + 12 + 4 * e <= b}

        out: list[dict] = []
        j = 0
        for c, base in enumerate(offs):
            spc = 0
            for first, n in runs:
                if first <= c + 1:
                    spc = n
                else:
                    break
            acc = 0
            for _ in range(spc):
                if j >= len(sizes) or j >= len(dts):
                    return out
                out.append({
                    "sample_idx": j,
                    "chunk_idx": c,
                    "file_offset": base + acc,
                    "size": sizes[j],
                    "dt_ticks": dts[j],
                    "is_sync": sync is None or (j + 1) in sync,
                })
                acc += sizes[j]
                j += 1
        return out
    except (ValueError, IndexError):
        return []


MP4_SAMPLE_SCHEMA = (
    "id bigint, sample_idx int, chunk_idx int, file_offset bigint, "
    "size int, dt_ticks bigint, is_sync boolean"
)


def mp4_sample_offsets(
    media: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    sync_only: bool = False,
) -> DataFrame:
    """One row per video sample with its absolute byte span and decode
    time — the demux index a frame-extraction stage consumes. Rows
    from unparseable buffers simply don't appear (the probe_status
    quarantine lives in :func:`mp4_probe`); ``sync_only`` keeps
    keyframes only. Arrow-batched ``mapInPandas``; per-row cost is the
    moov walk, independent of mdat size."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rows = [], []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                if blob is None:
                    continue
                for s in mp4_video_sample_table(bytes(blob)):
                    if sync_only and not s["is_sync"]:
                        continue
                    ids.append(rid)
                    rows.append(s)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "sample_idx": pd.Series(
                        [r["sample_idx"] for r in rows], dtype="int32"
                    ),
                    "chunk_idx": pd.Series(
                        [r["chunk_idx"] for r in rows], dtype="int32"
                    ),
                    "file_offset": pd.Series(
                        [r["file_offset"] for r in rows], dtype="int64"
                    ),
                    "size": pd.Series([r["size"] for r in rows], dtype="int32"),
                    "dt_ticks": pd.Series(
                        [r["dt_ticks"] for r in rows], dtype="int64"
                    ),
                    "is_sync": pd.Series(
                        [r["is_sync"] for r in rows], dtype="bool"
                    ),
                }
            )

    return media.mapInPandas(batches, MP4_SAMPLE_SCHEMA)


def mp4_frame_samples(
    media: DataFrame,
    every_n: int = 1,
    sync_only: bool = False,
    id_col: str = "id",
    media_col: str = "media",
) -> DataFrame:
    """REAL container-aware frame pull: slice each kept video sample's
    payload out of the buffer at its sample-table offset (vs
    ``multimodal.sample_frames``'s fixed-stride byte model). Output is
    FRAME_SCHEMA-compatible: (id, frame_idx, frame, n_bytes). Samples
    whose span escapes the buffer are skipped (truncated mdat)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                if blob is None:
                    continue
                buf = bytes(blob)
                kept = 0
                for s in mp4_video_sample_table(buf):
                    if sync_only and not s["is_sync"]:
                        continue
                    if kept % every_n == 0:
                        a = s["file_offset"]
                        if a + s["size"] <= len(buf):
                            ids.append(rid)
                            idxs.append(s["sample_idx"])
                            frames.append(buf[a : a + s["size"]])
                    kept += 1
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "n_bytes": pd.Series(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(
        batches, "id bigint, frame_idx int, frame binary, n_bytes bigint"
    )


MP4_PROBE_SCHEMA = (
    "id bigint, probe_status string, brand string, duration_s double, "
    "n_tracks int, video_codec string, width int, height int, "
    "audio_codec string, n_samples bigint"
)


def mp4_probe(
    media: DataFrame, id_col: str = "id", media_col: str = "media"
) -> DataFrame:
    """Container probe over a binary column — Arrow-batched
    ``mapInPandas`` like every multimodal path; per-row cost is the
    moov tree walk (tens of boxes), independent of mdat size, so
    probing scales with file COUNT not corpus bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                probe_mp4_bytes(bytes(b))
                if b is not None
                else {"probe_status": "not_mp4", "brand": None,
                      "duration_s": None, "n_tracks": None,
                      "video_codec": None, "width": None, "height": None,
                      "audio_codec": None, "n_samples": None}
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "probe_status": [r["probe_status"] for r in rows],
                    "brand": [r["brand"] for r in rows],
                    "duration_s": pd.array(
                        [r["duration_s"] for r in rows], dtype="Float64"
                    ),
                    "n_tracks": pd.array(
                        [r["n_tracks"] for r in rows], dtype="Int32"
                    ),
                    "video_codec": [r["video_codec"] for r in rows],
                    "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                    "height": pd.array([r["height"] for r in rows], dtype="Int32"),
                    "audio_codec": [r["audio_codec"] for r in rows],
                    "n_samples": pd.array(
                        [r["n_samples"] for r in rows], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(batches, MP4_PROBE_SCHEMA)


def build_mp4(
    width: int,
    height: int,
    duration_ms: int,
    video_codec: bytes = b"avc1",
    video_samples: int = 30,
    audio_codec: bytes | None = b"mp4a",
    audio_samples: int = 43,
    brand: bytes = b"isom",
    video_sample_sizes: list[int] | None = None,
    samples_per_chunk: int = 0,
    chunk_gap: int = 0,
    sample_delta: int = 1024,
    sync_every: int = 0,
) -> bytes:
    """Construct a minimal STRUCTURALLY VALID ISO BMFF buffer (ftyp +
    moov[mvhd + trak… ] + mdat) for fixtures and synthesized probe
    corpora — real box layout per 14496-12, no codec payloads.

    With ``video_sample_sizes`` the video track carries a REAL sample
    table (stts/stsz/stsc/stco[/stss]) and mdat holds the actual
    sample bytes (sample j = byte ``j % 251`` repeated ``sizes[j]``
    times), grouped ``samples_per_chunk`` per chunk with ``chunk_gap``
    filler bytes before each chunk — so stco is load-bearing: offsets
    cannot be inferred from sizes alone. stco is patched in a second
    pass once the moov length is known (entry count fixes the box
    size, so the patch is layout-stable). ``sync_every`` > 0 writes an
    stss marking samples 1, 1+k, … as keyframes."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + typ + payload

    def full(typ: bytes, version: int, payload: bytes) -> bytes:
        return box(typ, bytes([version, 0, 0, 0]) + payload)

    def video_layout():
        sizes = list(video_sample_sizes)
        spc = samples_per_chunk if samples_per_chunk > 0 else len(sizes)
        chunks = [sizes[i : i + spc] for i in range(0, len(sizes), spc)] or [[]]
        stts = full(
            b"stts", 0,
            (1).to_bytes(4, "big")
            + len(sizes).to_bytes(4, "big")
            + int(sample_delta).to_bytes(4, "big"),
        )
        stsz = full(
            b"stsz", 0,
            (0).to_bytes(4, "big")
            + len(sizes).to_bytes(4, "big")
            + b"".join(s.to_bytes(4, "big") for s in sizes),
        )
        runs = [(1, spc)]
        if chunks and len(chunks[-1]) != spc:
            runs = ([(1, spc)] if len(chunks) > 1 else []) + [
                (len(chunks), len(chunks[-1]))
            ]
        stsc = full(
            b"stsc", 0,
            len(runs).to_bytes(4, "big")
            + b"".join(
                f.to_bytes(4, "big") + n.to_bytes(4, "big")
                + (1).to_bytes(4, "big")
                for f, n in runs
            ),
        )
        extra = b""
        if sync_every > 0:
            ss = list(range(1, len(sizes) + 1, sync_every))
            extra = full(
                b"stss", 0,
                len(ss).to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in ss),
            )

        def stco_for(offsets: list[int]) -> bytes:
            return full(
                b"stco", 0,
                len(offsets).to_bytes(4, "big")
                + b"".join(o.to_bytes(4, "big") for o in offsets),
            )

        mdat_payload = b""
        rel: list[int] = []  # chunk starts relative to mdat payload
        j = 0
        for ch in chunks:
            mdat_payload += b"\x00" * chunk_gap
            rel.append(len(mdat_payload))
            for s in ch:
                mdat_payload += bytes([j % 251]) * s
                j += 1
        return stts + stsz + stsc, stco_for, extra, rel, mdat_payload

    def trak(
        handler: bytes,
        codec: bytes,
        n: int,
        w: int,
        h: int,
        sample_boxes: bytes | None = None,
    ) -> bytes:
        tkhd = full(
            b"tkhd",
            0,
            (0).to_bytes(4, "big") * 2  # times
            + (1).to_bytes(4, "big")  # track id
            + b"\x00" * 4  # reserved
            + (0).to_bytes(4, "big")  # duration
            + b"\x00" * 8  # reserved
            + b"\x00" * 4  # layer + alt group
            + b"\x00" * 4  # volume + reserved
            + b"\x00" * 36  # matrix
            + (w << 16).to_bytes(4, "big")
            + (h << 16).to_bytes(4, "big"),
        )
        hdlr = full(
            b"hdlr", 0, (0).to_bytes(4, "big") + handler + b"\x00" * 13
        )
        entry = (16).to_bytes(4, "big") + codec + b"\x00" * 8
        stsd = full(b"stsd", 0, (1).to_bytes(4, "big") + entry)
        if sample_boxes is None:
            tail = full(
                b"stsz", 0, (0).to_bytes(4, "big") + n.to_bytes(4, "big")
            )
        else:
            tail = sample_boxes
        stbl = box(b"stbl", stsd + tail)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        return box(b"trak", tkhd + mdia)

    mvhd = full(
        b"mvhd",
        0,
        (0).to_bytes(4, "big") * 2  # creation/modification
        + (1000).to_bytes(4, "big")  # timescale
        + int(duration_ms).to_bytes(4, "big")
        + b"\x00" * 80,  # rate..next_track_id
    )
    ftyp = box(b"ftyp", brand + (0).to_bytes(4, "big") + brand)
    audio = (
        trak(b"soun", audio_codec, audio_samples, 0, 0)
        if audio_codec is not None
        else b""
    )
    if video_sample_sizes is None:
        traks = trak(b"vide", video_codec, video_samples, width, height) + audio
        moov = box(b"moov", mvhd + traks)
        return ftyp + moov + box(b"mdat", b"")

    tables, stco_for, extra, rel, mdat_payload = video_layout()
    n_vid = len(video_sample_sizes)

    def assemble(offsets: list[int]) -> bytes:
        vid = trak(
            b"vide", video_codec, n_vid, width, height,
            sample_boxes=tables + stco_for(offsets) + extra,
        )
        return ftyp + box(b"moov", mvhd + vid + audio) + box(b"mdat", mdat_payload)

    # pass 1 sizes the header; pass 2 writes the true chunk offsets
    # (same entry count → byte lengths identical, offsets stable)
    probe = assemble([0] * len(rel))
    payload_start = len(probe) - len(mdat_payload)
    return assemble([payload_start + r for r in rel])
